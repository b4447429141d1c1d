package graft

import graft.ops.{AudioOps, DedupOps}

/** Real-path audio specs: RIFF/WAVE parsing and the Haar-cascade
  * robust fingerprint over in-test-generated WAV bytes — the audio
  * twin of MultimodalSpec's generated-PNG dHash proofs.
  */
class AudioOpsSpec extends SparkSuite {
  import spark.implicits._
  import WavGen.{square, wavBytes}

  test("decodeWav: canonical 16-bit PCM round-trips metadata; junk and truncated payloads quarantine") {
    val mono = wavBytes(square(50, 20000, 8000))
    val stereo = wavBytes(
      square(50, 20000, 4000).flatMap(s => Array(s, s)), channels = 2)
    val rows = Seq(
      (1L, mono),
      (2L, stereo),
      (3L, "not audio at all".getBytes("UTF-8")),
      (4L, mono.take(30)), // truncated below the minimal header
      (5L, Array.empty[Byte])
    ).toDF("doc_id", "payload")
    val got = AudioOps.wavDecode(spark, rows)
      .as[AudioOps.WavMeta].collect().map(m => m.doc_id -> m).toMap
    assert(got(1L) == AudioOps.WavMeta(1L, 8000L, 1L, 16L, 8000L, decoded = true))
    assert(got(2L) == AudioOps.WavMeta(2L, 8000L, 2L, 16L, 4000L, decoded = true))
    Seq(3L, 4L, 5L).foreach(id =>
      assert(!got(id).decoded && got(id).n_samples == 0L, s"doc $id"))
  }

  test("decodeWav: a data chunk whose declared size overruns the payload quarantines (no OOB read)") {
    val ok = wavBytes(square(50, 1000, 1024))
    // corrupt the data-chunk size field (offset 40) to claim 1 GiB
    val evil = ok.clone()
    val bb = java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 1 << 30)
    assert(!AudioOps.decodeWav(9L, evil).decoded)
    assert(AudioOps.decodeWav(9L, ok).decoded)
  }

  test("fingerprintWav: deterministic; EXACT under uniform amplitude scaling; stereo-of-identical-channels equals mono") {
    val a = wavBytes(square(50, 20000, 8000))
    val scaled = wavBytes(square(50, 18000, 8000)) // 0.9×, energies 0.81× exactly
    val stereoA = wavBytes(
      square(50, 20000, 8000).flatMap(s => Array(s, s)), channels = 2)
    val fpA = AudioOps.fingerprintWav(1L, a)
    assert(fpA.decoded)
    assert(AudioOps.fingerprintWav(1L, a) == fpA, "determinism")
    assert(AudioOps.fingerprintWav(2L, scaled).afp == fpA.afp,
      "sign-of-difference bits are invariant under exact uniform scaling")
    assert(AudioOps.fingerprintWav(3L, stereoA).afp == fpA.afp,
      "integer mono mix of identical channels is the mono signal")
  }

  test("dedup: planted near-duplicate (scaled + click) pairs within MaxHamming; different period does not; junk and short clips quarantine") {
    val a = square(50, 20000, 8000)
    val nearDup = square(50, 18000, 8000)
    nearDup(3000) = 25000 // one localized click
    val rows = Seq(
      (1L, wavBytes(a)),
      (2L, wavBytes(nearDup)),
      (3L, wavBytes(square(6, 20000, 8000))), // different signal
      (4L, "junk".getBytes("UTF-8")),
      (5L, wavBytes(square(50, 20000, 256))) // below the cascade minimum
    ).toDF("doc_id", "payload")
    val sigs = AudioOps.audioFingerprint(spark, rows)
      .as[AudioOps.AudioFpMeta].collect().map(m => m.doc_id -> m).toMap
    assert(sigs(1L).decoded && sigs(2L).decoded && sigs(3L).decoded)
    assert(!sigs(4L).decoded && !sigs(5L).decoded)
    val hmNear = java.lang.Long.bitCount(sigs(1L).afp ^ sigs(2L).afp)
    val hmFar = java.lang.Long.bitCount(sigs(1L).afp ^ sigs(3L).afp)
    assert(hmNear <= DedupOps.MaxHamming, s"near-dup hamming $hmNear")
    assert(hmFar > DedupOps.MaxHamming, s"different clip hamming $hmFar")
    val pairs = AudioOps.dedupAudioFingerprintReal(spark, rows)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("8-bit PCM decodes and fingerprints (unsigned, centered at 128)") {
    val n = 4096
    val data = Array.tabulate(n)(i =>
      (if ((i / 25) % 2 == 0) 228 else 28).toByte) // square around the 128 bias
    val dataLen = n
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen).put(data)
    val wav = bb.array()
    val meta = AudioOps.decodeWav(7L, wav)
    assert(meta.decoded && meta.bits_per_sample == 8L && meta.n_samples == n.toLong)
    assert(AudioOps.fingerprintWav(7L, wav).decoded)
  }
}
