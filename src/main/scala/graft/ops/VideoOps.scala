package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Video-payload plumbing, completing the multimodal triple (image →
  * audio → video) with the same two-path discipline:
  *
  *   - REAL: [[decodeAvi]] walks RIFF/AVI containers (AVI is RIFF
  *     framing, like WAV) and [[videoFrameHashes]] extracts MJPEG
  *     frames — plain JPEGs inside `00dc` chunks, decodable by the
  *     JDK's ImageIO — hashing each sampled frame with the image
  *     family's [[BinaryOps.dhashImage]]. Frame-level perceptual
  *     hashing + cross-video frame voting IS how production video
  *     dedup works (a re-encoded copy shares most frame hashes).
  *   - STUB: [[videoFrameHashStub]] stands in over the synthetic
  *     corpus: per-doc frame count from the [[BinaryOps.decodeStub]]
  *     arithmetic, each frame's hash the dHash byte-sampling stub
  *     OFFSET by the frame index — mirrored in DuckDB so the frame
  *     explode, the banded frame join and the per-pair vote are
  *     oracle-tested end to end.
  *
  * Scale shape: frames explode ONCE into a (doc_id, frame_idx, hash)
  * table (rows ∝ corpus frames / stride — the quantity being indexed);
  * cross-video candidate pairs come from the banded Hamming join
  * ([[DedupOps.hammingBandPairs]] geometry), never a video×video
  * product; the vote is one (doc_a, doc_b) agg.
  */
object VideoOps {

  // ------------------------------------------------------- real AVI parse

  /** Decoded AVI metadata; `decoded = false` carries zeros (quarantine). */
  case class AviMeta(
      doc_id: Long, width: Long, height: Long, n_frames: Long,
      us_per_frame: Long, decoded: Boolean)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Frame byte ranges + header fields pulled in ONE RIFF walk. */
  private case class AviChunks(width: Long, height: Long,
      usPerFrame: Long, frames: Vector[(Int, Int)])

  /** RIFF/AVI walk: `avih` (inside LIST hdrl) for metadata, LIST `movi`
    * for the frame stream — `00dc`/`00db` chunks are video frames
    * (MJPEG ⇒ each `00dc` payload is a complete JPEG). Declared sizes
    * are bounds-checked against the payload like [[AudioOps]]' WAV
    * walk: a chunk claiming gigabytes quarantines, no OOB read.
    */
  private def parseAvi(b: Array[Byte]): Option[AviChunks] = {
    if (b == null || b.length < 24) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "AVI ") return None
    var avih: Option[(Long, Long, Long)] = None
    var frames = Vector.newBuilder[(Int, Int)]
    var sawMovi = false
    // walk(off, end, depth): iterate sibling chunks, recursing into
    // LISTs — AVI nests (RIFF → LIST hdrl → LIST strl, RIFF → LIST
    // movi). Real containers nest ~3 deep; the depth cap quarantines a
    // malicious payload of nested 12-byte LIST headers that would
    // otherwise drive the recursion to StackOverflowError — an Error,
    // not an exception, so no catch downstream could save the task
    // (the same budget discipline as the declared-size bounds checks)
    val MaxListDepth = 16
    def walk(from: Int, end: Int, depth: Int): Boolean = {
      if (depth > MaxListDepth) return false
      var off = from
      while (off + 8 <= end) {
        val id = tag(b, off)
        val size = u32(b, off + 4)
        if (size < 0 || size > Int.MaxValue || off + 8 + size > end)
          return false
        val sz = size.toInt
        if (id == "LIST" && sz >= 4) {
          val subtype = tag(b, off + 8)
          if (subtype == "movi") sawMovi = true
          if (!walk(off + 12, off + 8 + sz, depth + 1)) return false
        } else if (id == "avih" && sz >= 40) {
          avih = Some((u32(b, off + 8), u32(b, off + 40), u32(b, off + 44)))
        } else if (id.endsWith("dc") || id.endsWith("db")) {
          frames += ((off + 8, sz))
        }
        off += 8 + sz + (sz & 1)
      }
      true
    }
    val totalEnd = math.min(b.length.toLong, 8 + u32(b, 4)).toInt
    if (!walk(12, totalEnd, 0) || !sawMovi) None
    else avih.map { case (usPf, w, h) => AviChunks(w, h, usPf, frames.result()) }
  }

  /** REAL AVI header decode — metadata only; frame count from the movi
    * stream itself (the header's dwTotalFrames lies in the wild).
    */
  def decodeAvi(docId: Long, payload: Array[Byte]): AviMeta =
    parseAvi(payload) match {
      case Some(a) => AviMeta(docId, a.width, a.height,
        a.frames.length.toLong, a.usPerFrame, decoded = true)
      case None => AviMeta(docId, 0L, 0L, 0L, 0L, decoded = false)
    }

  /** (doc_id, payload) → per-partition AVI metadata. */
  def aviDecode(spark: SparkSession, videos: DataFrame): DataFrame = {
    import spark.implicits._
    videos.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => decodeAvi(id, p) })
      .toDF()
  }

  /** Every `frameStride`-th frame sampled per video. */
  val FrameStride = 2

  /** Per-frame perceptual hash; a frame that fails JPEG decode is a
    * quarantine ROW (decoded=false), not a lost video.
    */
  case class FrameHash(doc_id: Long, frame_idx: Long, dhash: Long,
      decoded: Boolean)

  /** REAL frame-hash table: parse the container, sample every
    * `stride`-th frame, dHash each through the image family's
    * [[BinaryOps.dhashImage]] (header-checked full decode — a
    * decompression-bomb frame quarantines, not OOMs). One narrow
    * per-partition pass; output rows ∝ corpus frames / stride.
    */
  def videoFrameHashes(spark: SparkSession, videos: DataFrame,
      stride: Int = FrameStride): DataFrame = {
    import spark.implicits._
    videos.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) =>
        parseAvi(p) match {
          case None => Iterator(FrameHash(id, -1L, 0L, decoded = false))
          case Some(a) =>
            a.frames.zipWithIndex.iterator
              .filter { case (_, i) => i % stride == 0 }
              .map { case ((off, len), i) =>
                val frame = java.util.Arrays.copyOfRange(p, off, off + len)
                val h = BinaryOps.dhashImage(id, frame)
                FrameHash(id, i.toLong, h.dhash, h.decoded)
              }
        }
      })
      .toDF()
  }

  /** Frame-vote threshold: videos pair when 2·matched ≥ min(frames). */
  val MinFrameVote = 2

  /** REAL video near-dup pairs: banded Hamming join between the two
    * videos' frame-hash tables (candidates = frame pairs agreeing on a
    * band — never a video×video product), then ONE (doc_a, doc_b) vote
    * counting DISTINCT matched a-side frames against min(frame count).
    * Emits (doc_a, doc_b, n_matched, min_frames) where
    * [[MinFrameVote]]·n_matched ≥ min_frames.
    */
  def dedupVideoReal(spark: SparkSession, videos: DataFrame,
      stride: Int = FrameStride): DataFrame =
    framePairVote(DedupOps.materialize(
      // materialize: the vote plan scans the frame table from several
      // branches (count agg + banded self-join + count joins) — without
      // this every branch re-runs the AVI parse + per-frame JPEG decode
      videoFrameHashes(spark, videos, stride).filter(col("decoded"))
        .select(col("doc_id"), col("frame_idx"), col("dhash")),
      "video_framehash_real"))

  /** The shared frame-vote pipeline over any (doc_id, frame_idx, dhash)
    * table — used by the real path and the oracle stub.
    */
  private def framePairVote(frames: DataFrame): DataFrame = {
    val nFrames = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"))
    val banded = DedupOps.bandedSignatures(frames, "dhash",
      BinaryOps.DhashBands, BinaryOps.DhashBandBits, DedupOps.BandBucketCap,
      extraCols = Seq("frame_idx"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val matched = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
        <= DedupOps.MaxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.frame_idx").as("frame_a"))
      .distinct()
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_matched"))
    // no broadcast hint on purpose: `matched` (surviving pairs) is the
    // small side at scale, not the per-video frame counts — AQE picks
    // the broadcast direction from runtime sizes
    matched
      .join(nFrames.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_frames", "nf_a"), "doc_a")
      .join(nFrames.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_frames", "nf_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_matched"),
        least(col("nf_a"), col("nf_b")).as("min_frames"))
      .filter(col("n_matched") * MinFrameVote >= col("min_frames"))
  }

  // ------------------------------------------------- stub + oracle twins

  /** Stub frame count per doc: 1 + len mod 8 (≥ 1 frame) — the
    * [[BinaryOps.decodeStub]] shape (frames from payload length) at a
    * pair-join-friendly cap.
    */
  private val StubMaxFrames = 8

  /** Per-frame offset so sibling frames of one doc differ but stay
    * correlated — a rotation of the sample grid, like consecutive
    * frames of real footage.
    */
  private val FrameByteStep = 11

  /** STUB frame-hash table over the payload bytes: doc → 1 + len mod
    * [[StubMaxFrames]] frames; frame i's hash is the dHash byte-sampling
    * stub with every sample offset by i·[[FrameByteStep]]. The frame
    * EXPLODE, the banded join and the vote downstream are the REAL
    * operator; the oracle mirrors the byte arithmetic.
    */
  def videoFrameHashStub(docs: DataFrame): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    val n = length(t)
    val nSafe = greatest(n, lit(1))
    val nf = (lit(1) + n % StubMaxFrames).cast("long")
    DedupOps.fanout(docs)
      .select(col("doc_id"), t.as("text"), n.as("n"), nSafe.as("n_safe"),
        explode(sequence(lit(0L), nf - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        frameDhashStub(col("text"), col("n"), col("n_safe"),
          col("frame_idx")).as("dhash"))
  }

  private def frameDhashStub(t: Column, n: Column, nSafe: Column,
      frameIdx: Column): Column =
    // one codegen'd kernel call (round 14) — bit-identical to the
    // 128-substr expression form below (StubKernelSpec); the kernel's
    // empty-string → 0 short-circuit replaces the n === 0 guard
    org.apache.spark.sql.graftext.ArrayFunctions.dhash_stub(
      t, (frameIdx * FrameByteStep).cast("long"),
      BinaryOps.DhashRows, BinaryOps.DhashCols)

  /** The pre-kernel expression form — spec reference ONLY. */
  private[graft] def frameDhashStubExpr(t: Column, n: Column, nSafe: Column,
      frameIdx: Column): Column = {
    val rows = BinaryOps.DhashRows
    val cols = BinaryOps.DhashCols
    def sample(j: Int): Column =
      ascii(t.substr(((lit(j) + frameIdx * FrameByteStep) % nSafe + 1)
        .cast("int"), lit(1)))
    val bits = (0 until rows * cols).map { k =>
      val r = k / cols
      val c = k % cols
      when(sample(r * (cols + 1) + c) > sample(r * (cols + 1) + c + 1),
        lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    when(n === 0, lit(0L)).otherwise(bits).cast("long")
  }

  /** Stub video near-dup pairs — [[framePairVote]] over the stub
    * frame-hash table, oracle-checkable end to end.
    */
  def dedupVideoStub(docs: DataFrame): DataFrame =
    framePairVote(DedupOps.materialize(videoFrameHashStub(docs),
      "video_framehash"))

  /** Shared SQL CTE: the stub frame-hash table (doc × frame explode +
    * per-frame offset dHash bits, positions dynamic in frame_idx).
    */
  private def sqlFramesCte: String = {
    val rows = BinaryOps.DhashRows
    val cols = BinaryOps.DhashCols
    def sample(j: Int) =
      s"greatest(unicode(substr(text, CAST(($j + frame_idx * $FrameByteStep) % n_safe AS INT) + 1, 1)), 0)"
    val bits = (0 until rows * cols).map { k =>
      val r = k / cols
      val c = k % cols
      s"CASE WHEN ${sample(r * (cols + 1) + c)} > ${sample(r * (cols + 1) + c + 1)} THEN ${1L << k} ELSE 0 END"
    }.mkString(" + ")
    s"""frames AS (
       |  SELECT doc_id, frame_idx,
       |    CAST(CASE WHEN n = 0 THEN 0 ELSE $bits END AS BIGINT) AS dhash
       |  FROM (
       |    SELECT doc_id, text, n, greatest(n, 1) AS n_safe,
       |      unnest(range(0, 1 + n % $StubMaxFrames)) AS frame_idx
       |    FROM (SELECT doc_id, coalesce(text, '') AS text,
       |            strlen(coalesce(text, '')) AS n
       |          FROM documents)))""".stripMargin
  }

  def sqlVideoFrameHashStub: String =
    s"""WITH $sqlFramesCte
       |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, dhash
       |FROM frames""".stripMargin

  def sqlDedupVideoStub: String = {
    val bands = BinaryOps.DhashBands
    val bandBits = BinaryOps.DhashBandBits
    val mask = (1L << bandBits) - 1
    val bandArms = (0 until bands)
      .map(j => s"SELECT doc_id, frame_idx, dhash, $j AS band_idx, (dhash >> ${j * bandBits}) & $mask AS band_val FROM frames")
      .mkString("\nUNION ALL\n")
    s"""WITH $sqlFramesCte,
       |nframes AS (
       |  SELECT doc_id, count(*) AS n_frames FROM frames GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, frame_idx, dhash, band_idx, band_val FROM (
       |    SELECT doc_id, frame_idx, dhash, band_idx, band_val,
       |      row_number() OVER (PARTITION BY band_idx, band_val ORDER BY doc_id, frame_idx) AS rn
       |    FROM (
       |$bandArms))
       |  WHERE rn <= ${DedupOps.BandBucketCap}),
       |matched AS (
       |  SELECT doc_a, doc_b, count(*) AS n_matched FROM (
       |    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |      a.frame_idx AS frame_a
       |    FROM bands a JOIN bands b
       |      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |        AND a.doc_id < b.doc_id
       |    WHERE bit_count(xor(a.dhash, b.dhash)) <= ${DedupOps.MaxHamming})
       |  GROUP BY doc_a, doc_b)
       |SELECT m.doc_a, m.doc_b, m.n_matched,
       |  least(fa.n_frames, fb.n_frames) AS min_frames
       |FROM matched m
       |JOIN nframes fa ON m.doc_a = fa.doc_id
       |JOIN nframes fb ON m.doc_b = fb.doc_id
       |WHERE m.n_matched * $MinFrameVote >= least(fa.n_frames, fb.n_frames)""".stripMargin
  }
}
