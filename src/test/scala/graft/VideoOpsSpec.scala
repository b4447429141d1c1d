package graft

import graft.ops.VideoOps

/** Real-path video specs: RIFF/AVI parsing and frame-vote dedup over
  * in-test-generated MJPEG AVIs — the container is real RIFF, the
  * frames are real JPEGs, the decode is the JDK's.
  */
class VideoOpsSpec extends SparkSuite {
  import spark.implicits._

  /** Frame i: horizontal gradient with slope (3 + i) — consecutive
    * frames correlated but distinct, like real footage.
    */
  private def gradFrame(i: Int, invert: Boolean): java.awt.image.BufferedImage = {
    val w = 64; val h = 64
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach { x =>
      val g0 = (x * (3 + i)) & 0xff
      val g = if (invert) 255 - g0 else g0
      (0 until h).foreach(y => img.setRGB(x, y, (g << 16) | (g << 8) | g))
    }
    img
  }

  private def avi(invert: Boolean, quality: Float, n: Int = 6): Array[Byte] =
    AviGen.aviBytes((0 until n).map(i =>
      AviGen.jpegFrame(gradFrame(i, invert), quality)), 64, 64)

  test("decodeAvi: header metadata + frame count from the movi stream; junk quarantines; overrunning declared size quarantines") {
    val ok = avi(invert = false, quality = 0.9f)
    val evil = ok.clone()
    // corrupt the outer RIFF size to overrun... corrupt a frame chunk size instead:
    // find first 00dc and bump its declared length past the payload
    val idx = ok.indices.find(i => i + 4 <= ok.length &&
      new String(ok, i, 4, "US-ASCII") == "00dc").get
    java.nio.ByteBuffer.wrap(evil).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(idx + 4, 1 << 30)
    val got = VideoOps.aviDecode(spark, Seq(
        (1L, ok), (2L, "not a video".getBytes("UTF-8")), (3L, evil))
      .toDF("doc_id", "payload"))
      .as[VideoOps.AviMeta].collect().map(m => m.doc_id -> m).toMap
    assert(got(1L) == VideoOps.AviMeta(1L, 64L, 64L, 6L, 40000L, decoded = true))
    assert(!got(2L).decoded && !got(3L).decoded)
  }

  test("decodeAvi: a deeply-nested LIST bomb quarantines instead of overflowing the stack") {
    // payload of recursively nested LIST headers: each 12-byte LIST
    // wraps the next — ~10k deep would StackOverflowError an unbounded
    // walker (an Error no catch can save); the depth cap quarantines
    val depth = 20000
    val bb = java.nio.ByteBuffer.allocate(12 + depth * 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(4 + depth * 12)
      .put("AVI ".getBytes("US-ASCII"))
    (0 until depth).foreach { i =>
      val remaining = (depth - i) * 12 - 8
      bb.put("LIST".getBytes("US-ASCII")).putInt(remaining)
        .put("hdrl".getBytes("US-ASCII"))
    }
    assert(!VideoOps.decodeAvi(66L, bb.array()).decoded)
  }

  test("videoFrameHashes: stride sampling, real JPEG decode, deterministic hashes") {
    val rows = Seq((1L, avi(invert = false, quality = 0.9f)))
      .toDF("doc_id", "payload")
    val got = VideoOps.videoFrameHashes(spark, rows, stride = 2)
      .as[VideoOps.FrameHash].collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L))
    assert(got.forall(_.decoded))
    assert(got.map(_.dhash).distinct.length == 3, "slope-varied frames differ")
    val again = VideoOps.videoFrameHashes(spark, rows, stride = 2)
      .as[VideoOps.FrameHash].collect().sortBy(_.frame_idx)
    assert(got.toSeq == again.toSeq, "determinism")
  }

  test("dedupVideoReal: re-encoded copy pairs by frame vote; inverted footage does not; junk quarantines") {
    val rows = Seq(
      (1L, avi(invert = false, quality = 0.9f)),
      (2L, avi(invert = false, quality = 0.6f)), // same footage, re-encoded
      (3L, avi(invert = true, quality = 0.9f)), // inverted footage
      (4L, "junk".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val pairs = VideoOps.dedupVideoReal(spark, rows)
      .select("doc_a", "doc_b", "n_matched", "min_frames")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L)), s"got $pairs")
    val (_, _, matched, minF) = pairs.head
    assert(matched * VideoOps.MinFrameVote >= minF)
  }
}
