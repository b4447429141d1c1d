package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio-payload plumbing: the AUDIO sibling of [[BinaryOps]]'s image
  * path, completing the multimodal dedup story (image dHash shipped
  * round 9; this is the same discipline for sound).
  *
  * Two paths, exactly the [[BinaryOps]] split:
  *   - REAL: [[decodeWav]] parses RIFF/WAVE PCM headers and
  *     [[fingerprintWav]] computes a Philips-style robust audio hash
  *     (Haitsma & Kalker 2002: sign of the band-energy difference
  *     differentiated over time) — both pure JDK byte/Long arithmetic
  *     (WAV is just little-endian PCM framing; no codec library
  *     needed), spec-proven on in-test-generated WAV bytes.
  *   - STUB: [[audioFpStub]] stands in for decode+fingerprint over the
  *     synthetic corpus (the driver's `documents` parquet has no real
  *     audio), sampling payload bytes as fake band energies through
  *     the SAME frame×band×temporal-diff bit structure, mirrored in
  *     DuckDB SQL so the banded pair join downstream is oracle-tested
  *     end to end.
  *
  * The near-dup pair join is [[DedupOps.hammingBandPairs]] — the one
  * pigeonhole machinery shared with simhash and image dHash; a third
  * modality costs zero new join code.
  *
  * At 100 TB: payloads in parquet binary columns, fingerprints one
  * narrow per-partition pass (codec state amortized across each
  * partition's iterator), pair space bounded by band buckets.
  */
object AudioOps {

  // ------------------------------------------------------ real WAV decode

  /** Decoded WAV metadata; `decoded = false` rows carry zeros — the
    * quarantine discipline of [[BinaryOps.ImageMeta]]: one corrupt
    * payload in a 100 TB corpus must be countable, not fatal.
    */
  case class WavMeta(
      doc_id: Long, sample_rate: Long, channels: Long,
      bits_per_sample: Long, n_samples: Long, decoded: Boolean)

  /** Sample budget for the FULL PCM materialization [[fingerprintWav]]
    * needs — the audio twin of [[BinaryOps.DhashMaxPixels]]: a corrupt
    * `data` chunk declaring terabytes must quarantine, not OOM.
    */
  val AudioMaxSamples = 32L * 1024 * 1024

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parsed PCM stream: format fields + the located data chunk. */
  private case class PcmChunks(sampleRate: Long, channels: Int,
      bitsPerSample: Int, dataOff: Int, dataLen: Int)

  /** RIFF/WAVE chunk walk — returns None for anything that is not a
    * well-formed integer-PCM (format 1) 8/16-bit WAV whose declared
    * chunk sizes fit inside the payload. Pure byte parsing: WAV needs
    * no codec, which is why the REAL audio path can exist in this
    * zero-extra-dependency container at all.
    */
  private def parseWav(b: Array[Byte]): Option[PcmChunks] = {
    if (b == null || b.length < 44) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Long, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(b, off)
      val size = u32(b, off + 4)
      if (size < 0 || size > Int.MaxValue || off + 8 + size > b.length)
        return None
      val sz = size.toInt
      if (id == "fmt " && sz >= 16) {
        val audioFormat = u16(b, off + 8)
        val channels = u16(b, off + 10)
        val sampleRate = u32(b, off + 12)
        val bits = u16(b, off + 22)
        if (audioFormat != 1 || channels < 1 || channels > 16 ||
            (bits != 8 && bits != 16) || sampleRate <= 0) return None
        fmt = Some((sampleRate, channels, bits))
      } else if (id == "data") {
        data = Some((off + 8, sz))
      }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    for ((sr, ch, bits) <- fmt; (doff, dlen) <- data)
      yield PcmChunks(sr, ch, bits, doff, dlen)
  }

  /** REAL WAV header decode — metadata only, no sample materialization
    * (the header-only discipline of [[BinaryOps.decodeImage]]).
    */
  def decodeWav(docId: Long, payload: Array[Byte]): WavMeta =
    parseWav(payload) match {
      case Some(p) =>
        val bytesPerFrame = p.channels * (p.bitsPerSample / 8)
        WavMeta(docId, p.sampleRate, p.channels.toLong,
          p.bitsPerSample.toLong, p.dataLen.toLong / bytesPerFrame,
          decoded = true)
      case None => WavMeta(docId, 0L, 0L, 0L, 0L, decoded = false)
    }

  /** (doc_id, payload) → per-partition WAV metadata. */
  def wavDecode(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => decodeWav(id, p) })
      .toDF()
  }

  // ------------------------------------------- real audio fingerprint

  /** Fingerprint geometry: [[FpFrames]]+1 temporal frames × [[FpBands]]+1
    * octave band energies; bit (n, m) is the sign of the band-energy
    * difference (m vs m+1) differentiated across frames (n vs n−1) —
    * Haitsma & Kalker's construction, 16×4 = 64 bits. Gradient-of-
    * gradient survives uniform amplitude scaling EXACTLY (energies
    * scale quadratically uniformly, so every comparison keeps its
    * sign) and localized edits flip only the touched frames' bits —
    * the same robustness argument as dHash's gradient direction.
    */
  val FpFrames = 16
  val FpBands = 4
  private val FpFramesE = FpFrames + 1
  private val FpBandsE = FpBands + 1
  val AfpBands = 4
  val AfpBandBits = 16

  /** Fewest samples per frame for a level-[[FpBands]] Haar cascade to
    * have at least one detail pair at the deepest level.
    */
  private val MinFrameSamples = 1 << (FpBands + 1)

  /** Per-clip fingerprint; `decoded = false` (not WAV, or too short
    * for the cascade) carries hash 0 — quarantine, never a throw.
    */
  case class AudioFpMeta(doc_id: Long, afp: Long, decoded: Boolean)

  /** Octave band energies of one frame by an EXACT-INTEGER Haar
    * cascade: level k pairs sums (a+b) and details (a−b) of level
    * k−1 with no normalizing division, so every coefficient is an
    * exact Long and the fingerprint is bit-deterministic across JVMs
    * (an FFT's floating point would not be — same reason the unigram
    * trainer's cost model is integer). Band m < [[FpBands]] = sum of
    * squared details at cascade level m+1 (high → low frequency);
    * band [[FpBands]] = squared approximations at the deepest level.
    * Magnitude audit: |coeff| ≤ 2^k·32768, squared ≤ 2^(30+2k), times
    * ≤ 2^21 coefficients per frame — < 2^60, no Long overflow.
    */
  private def haarBandEnergies(s: Array[Long], from: Int, until: Int): Array[Long] = {
    val e = new Array[Long](FpBandsE)
    var cur = java.util.Arrays.copyOfRange(s, from, until)
    var lvl = 0
    while (lvl < FpBands) {
      val half = cur.length / 2
      val approx = new Array[Long](half)
      var acc = 0L
      var i = 0
      while (i < half) {
        val a = cur(2 * i); val b = cur(2 * i + 1)
        val d = a - b
        acc += d * d
        approx(i) = a + b
        i += 1
      }
      e(lvl) = acc
      cur = approx
      lvl += 1
    }
    var acc = 0L
    var i = 0
    while (i < cur.length) { acc += cur(i) * cur(i); i += 1 }
    e(FpBands) = acc
    e
  }

  /** REAL robust audio hash: RIFF parse → integer mono mix →
    * [[FpFramesE]] equal frames → per-frame Haar band energies →
    * 64 sign-of-difference bits. Oversized or sub-cascade-length
    * clips quarantine like corrupt ones.
    */
  def fingerprintWav(docId: Long, payload: Array[Byte]): AudioFpMeta = {
    val p = parseWav(payload).orNull
    if (p == null) return AudioFpMeta(docId, 0L, decoded = false)
    val bytesPerSample = p.bitsPerSample / 8
    val frameBytes = p.channels * bytesPerSample
    val n = p.dataLen / frameBytes
    if (n > AudioMaxSamples || n < FpFramesE.toLong * MinFrameSamples)
      return AudioFpMeta(docId, 0L, decoded = false)
    val nInt = n.toInt
    // mono mix in integer arithmetic (sum / channels, truncating —
    // deterministic; identical channels mix to the mono signal exactly)
    val mono = new Array[Long](nInt)
    var i = 0
    while (i < nInt) {
      var sum = 0L
      var c = 0
      while (c < p.channels) {
        val off = p.dataOff + i * frameBytes + c * bytesPerSample
        val sample =
          if (bytesPerSample == 2) (u16(payload, off) << 16) >> 16 // sign-extend LE
          else (payload(off) & 0xff) - 128 // 8-bit PCM is unsigned
        sum += sample
        c += 1
      }
      mono(i) = sum / p.channels
      i += 1
    }
    // 17 equal frames (integer boundaries), energies per frame
    val e = Array.ofDim[Long](FpFramesE, FpBandsE)
    var fr = 0
    while (fr < FpFramesE) {
      val from = (fr.toLong * nInt / FpFramesE).toInt
      val until = ((fr + 1).toLong * nInt / FpFramesE).toInt
      e(fr) = haarBandEnergies(mono, from, until)
      fr += 1
    }
    var bits = 0L
    fr = 1
    while (fr <= FpFrames) {
      var m = 0
      while (m < FpBands) {
        val k = (fr - 1) * FpBands + m
        val cur = e(fr)(m) - e(fr)(m + 1)
        val prev = e(fr - 1)(m) - e(fr - 1)(m + 1)
        if (cur > prev) bits |= (1L << k)
        m += 1
      }
      fr += 1
    }
    AudioFpMeta(docId, bits, decoded = true)
  }

  /** (doc_id, payload) → real fingerprints, per-partition. */
  def audioFingerprint(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => fingerprintWav(id, p) })
      .toDF()
  }

  /** Real-audio near-duplicate pairs: decoded fingerprints → the shared
    * banded Hamming join. No oracle twin (DuckDB has no WAV parser);
    * spec-proven on generated WAVs with a planted near-duplicate.
    */
  def dedupAudioFingerprintReal(spark: SparkSession, audio: DataFrame): DataFrame =
    DedupOps.hammingBandPairs(
      // materialize: the pair join's two self-join branches would each
      // re-run the WAV parse + Haar cascade without it
      DedupOps.materialize(
        audioFingerprint(spark, audio).filter(col("decoded"))
          .select(col("doc_id"), col("afp")),
        "afp_signatures_real"),
      "afp", AfpBands, AfpBandBits, DedupOps.MaxHamming,
      DedupOps.BandBucketCap)

  // ------------------------------------------------- stub + oracle twins

  /** STUB fingerprint over the payload bytes — the declared-stub
    * discipline of [[BinaryOps.decodeStub]]: byte (i·7 mod len) stands
    * in for band energy i of the decoded cascade (the real path is
    * [[fingerprintWav]]); the frame×band×temporal-diff BIT STRUCTURE,
    * the banding and the pair join downstream are the REAL operator,
    * and the oracle mirrors the byte arithmetic over the UTF-8 text.
    * The energy table materializes through a projection boundary so
    * the 85 samples are computed once, not once per referencing bit.
    */
  def audioFpStub(docs: DataFrame): DataFrame =
    // one codegen'd kernel call (round 14): energy sampling + the
    // frame×band temporal-diff bits in one pass — bit-identical to the
    // energies-array expression form below (StubKernelSpec)
    DedupOps.fanout(docs)
      .select(col("doc_id"),
        org.apache.spark.sql.graftext.ArrayFunctions.audio_fp_stub(
          coalesce(col("text"), lit("")), FpFrames, FpBands, 7).as("afp"))

  /** The pre-kernel expression form — spec reference ONLY. */
  private[graft] def audioFpStubExpr(docs: DataFrame): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val n = length(t)
    // ANSI-safe divisor: the energy array sits OUTSIDE the n=0 guard
    // (unlike dhashStubCol's single guarded expression), so `% n` must
    // never see 0 — empty docs sample ascii('') = 0 and the guard in
    // afpFromEnergies zeroes the hash anyway.
    val nSafe = greatest(n, lit(1))
    val energies = array((0 until FpFramesE * FpBandsE).map(i =>
      ascii(t.substr((lit(i * 7) % nSafe) + 1, lit(1))).cast("long")): _*)
    docs
      .select(col("doc_id"), n.cast("long").as("n"), energies.as("e"))
      .select(col("doc_id"), afpFromEnergies(col("n"), col("e")).as("afp"))
  }

  private def afpFromEnergies(n: Column, e: Column): Column = {
    def energy(fr: Int, m: Int): Column = element_at(e, fr * FpBandsE + m + 1)
    val bits = (1 to FpFrames).flatMap { fr =>
      (0 until FpBands).map { m =>
        val k = (fr - 1) * FpBands + m
        when(energy(fr, m) - energy(fr, m + 1) >
            energy(fr - 1, m) - energy(fr - 1, m + 1),
          lit(1L << k)).otherwise(lit(0L))
      }
    }.reduce(_ + _)
    when(n === 0, lit(0L)).otherwise(bits).cast("long")
  }

  /** Near-duplicate pairs over the stub fingerprints — identical pair
    * machinery to [[dedupAudioFingerprintReal]], oracle-checkable.
    */
  def dedupAudioFp(docs: DataFrame): DataFrame =
    DedupOps.hammingBandPairs(
      DedupOps.materialize(audioFpStub(docs), "afp_signatures"),
      "afp", AfpBands, AfpBandBits, DedupOps.MaxHamming,
      DedupOps.BandBucketCap)

  /** Shared SQL CTE: per-doc stub energy list (NULL when empty — the
    * modulo guard; CASE arms are lazy per row in both engines).
    * `greatest(unicode(…), 0)` ≡ Spark `ascii` on the ASCII corpus
    * (DuckDB's `unicode('')` is −1; never hit for n > 0, kept for the
    * same belt-and-braces as [[BinaryOps.sqlMultimodalDecode]]).
    */
  private def sqlEnergyCte: String =
    s"""energies AS (
       |  SELECT doc_id, n,
       |    CASE WHEN n = 0 THEN NULL
       |         ELSE list_transform(range(0, ${FpFramesE * FpBandsE}),
       |                i -> CAST(greatest(unicode(substr(text, CAST((i * 7) % n AS INT) + 1, 1)), 0) AS BIGINT)) END AS e
       |  FROM (SELECT doc_id, coalesce(text, '') AS text,
       |          strlen(coalesce(text, '')) AS n
       |        FROM documents))""".stripMargin

  private def sqlAfpBits: String = {
    def energy(fr: Int, m: Int) = s"e[${fr * FpBandsE + m + 1}]"
    val bits = (1 to FpFrames).flatMap { fr =>
      (0 until FpBands).map { m =>
        val k = (fr - 1) * FpBands + m
        s"CASE WHEN (${energy(fr, m)} - ${energy(fr, m + 1)}) > (${energy(fr - 1, m)} - ${energy(fr - 1, m + 1)}) THEN ${1L << k} ELSE 0 END"
      }
    }.mkString(" + ")
    s"CASE WHEN n = 0 THEN 0 ELSE $bits END"
  }

  def sqlAudioFpStub: String =
    s"""WITH $sqlEnergyCte
       |SELECT doc_id, CAST($sqlAfpBits AS BIGINT) AS afp
       |FROM energies""".stripMargin

  def sqlDedupAudioFp: String = {
    val mask = (1L << AfpBandBits) - 1
    val bandArms = (0 until AfpBands)
      .map(j => s"SELECT doc_id, afp, $j AS band_idx, (afp >> ${j * AfpBandBits}) & $mask AS band_val FROM sig")
      .mkString("\nUNION ALL\n")
    s"""WITH $sqlEnergyCte,
       |sig AS (
       |  SELECT doc_id, CAST($sqlAfpBits AS BIGINT) AS afp
       |  FROM energies),
       |bands AS (
       |  SELECT doc_id, afp, band_idx, band_val FROM (
       |    SELECT doc_id, afp, band_idx, band_val,
       |      row_number() OVER (PARTITION BY band_idx, band_val ORDER BY doc_id) AS rn
       |    FROM (
       |$bandArms))
       |  WHERE rn <= ${DedupOps.BandBucketCap})
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.afp, b.afp)) <= ${DedupOps.MaxHamming}""".stripMargin
  }
}
