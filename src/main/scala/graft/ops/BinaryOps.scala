package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, decoded per-partition with imperative Scala (the
  * Spark-side shape a real decoder plugs into: one iterator per partition,
  * no per-row task overhead, codec state reusable across a partition).
  *
  * Two decode paths:
  *   - [[decodeStub]]: a clearly-marked DETERMINISTIC STUB reading fake
  *     header fields from the first payload bytes — it exists because the
  *     driver's synthetic `documents` parquet has no real media payloads,
  *     and its arithmetic is mirrored in SQL so the plumbing is
  *     oracle-tested end to end (audio/video codecs genuinely aren't in
  *     the container).
  *   - [[decodeImage]]: a REAL image decode via JDK `javax.imageio`
  *     (PNG/JPEG/GIF/BMP readers ship WITH the JDK — no external codec
  *     needed) — the production path for actual image bytes, spec-proven
  *     on in-test-generated PNGs.
  *
  * At 100 TB: payloads live in parquet binary columns, each partition
  * decodes independently (narrow, no shuffle); metadata-only queries
  * never touch the payload bytes thanks to parquet column pruning.
  */
object BinaryOps {

  /** Typed metadata the decoder emits per media object. */
  case class MediaMeta(
      doc_id: Long,
      media_type: String,
      width: Long,
      height: Long,
      n_frames: Long,
      payload_bytes: Long
  )

  /** STUB decoder — stands in for an image/audio/video header parse.
    * Deterministic over the payload so the oracle can mirror it:
    * width/height from the first two bytes, frame count from length.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val mediaType = (docId % 3) match {
      case 0 => "image"
      case 1 => "audio"
      case _ => "video"
    }
    val b0 = if (payload.nonEmpty) payload(0) & 0xff else 0
    val b1 = if (payload.length > 1) payload(1) & 0xff else 0
    val nFrames =
      if (mediaType == "image") 1L else 1L + payload.length % 240
    MediaMeta(
      doc_id = docId,
      media_type = mediaType,
      width = 64L * (1 + b0 % 8),
      height = 64L * (1 + b1 % 8),
      n_frames = nFrames,
      payload_bytes = payload.length.toLong
    )
  }

  /** documents → binary payload → per-partition decode → typed metadata.
    * `mapPartitions` (not `map`) is the real batch shape: a production
    * decoder amortizes codec init across the partition's iterator.
    * NULL text ≡ empty payload (the coalesce): `encode(NULL)` is a null
    * Array[Byte] that would NPE the decode pass — one null payload in a
    * 100 TB corpus must not kill the job, and the oracle twins coalesce
    * the same way.
    */
  def multimodalDecode(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, payload) => decodeStub(id, payload) } }
      .toDF()
  }

  /** Oracle twin: the stub's arithmetic over the UTF-8 bytes of `text`
    * (ASCII corpus ⇒ unicode(first char) == first byte; strlen == bytes).
    */
  def sqlMultimodalDecode: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  CAST(64 * (1 + greatest(unicode(substr(text, 1, 1)), 0) % 8) AS BIGINT) AS width,
      |  CAST(64 * (1 + greatest(unicode(substr(text, 2, 1)), 0) % 8) AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 1 + strlen(text) % 240 END AS BIGINT) AS n_frames,
      |  CAST(strlen(text) AS BIGINT) AS payload_bytes
      |FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents)""".stripMargin
  // NOTE: greatest(unicode(x), 0) — DuckDB's unicode('') is -1, the stub's
  // missing-byte default is 0; aligns the empty/1-char document edge.

  // ---------------------------------------------------- real image decode

  /** Decoded image metadata; `decoded = false` rows carry zeros (an
    * undecodable payload in a 100 TB corpus must not kill the job — it
    * must be countable downstream and routed to a quarantine).
    */
  case class ImageMeta(
      doc_id: Long, width: Long, height: Long, channels: Long,
      payload_bytes: Long, decoded: Boolean)

  /** One-time JVM switch: ImageIO's default stream cache spills every
    * payload to a temp FILE — pure overhead for in-memory byte arrays.
    */
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** REAL image HEADER decode via `javax.imageio` — the JDK's built-in
    * PNG/JPEG/GIF/BMP readers, available even in this
    * zero-extra-dependency container. Header-only on purpose: the op
    * reports width/height/channels, so `ImageIO.read`'s full
    * w·h·4-byte pixel materialization would be pure waste — and a
    * decompression-bomb payload (a corrupt header declaring 60000²)
    * would OOM an executor, which no catch can save. `ImageReader
    * .getWidth/getHeight/getImageTypes` read only the header bytes.
    * Null/empty/corrupt payloads yield `decoded = false` instead of
    * throwing.
    */
  def decodeImage(docId: Long, payload: Array[Byte]): ImageMeta = {
    imageIoNoDiskCache
    val n = if (payload == null) 0L else payload.length.toLong
    val header =
      if (n == 0L) None
      else {
        var iis: javax.imageio.stream.ImageInputStream = null
        try {
          iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              val types = r.getImageTypes(0)
              val ch =
                if (types.hasNext) types.next().getColorModel.getNumComponents.toLong
                else 0L
              Some((r.getWidth(0).toLong, r.getHeight(0).toLong, ch))
            } finally r.dispose()
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        finally { if (iis != null) iis.close() }
      }
    header match {
      case Some((w, h, c)) => ImageMeta(docId, w, h, c, n, decoded = true)
      case None => ImageMeta(docId, 0L, 0L, 0L, n, decoded = false)
    }
  }

  /** (doc_id, payload: binary) → typed image metadata, decoded
    * per-partition — the SAME batch shape as the stub path, with the
    * stub swapped for the JDK decoder. Input is any frame with a long
    * `doc_id` and a binary `payload` column (e.g. a parquet table of
    * stored images). No oracle twin: DuckDB has no image codec — the
    * contract is spec-proven on generated PNG bytes instead
    * (MultimodalSpec).
    */
  def imageDecode(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => decodeImage(id, p) })
      .toDF()
  }

  // -------------------------------------------------------------- resize

  /** Target bounding box for [[multimodalResize]]. */
  val ResizeBox = 128L

  /** Aspect-preserving resize plan: scale the decoded dimensions to fit a
    * [[ResizeBox]]² box (integer arithmetic so both engines agree exactly;
    * a real resize would transform the payload here — STUBBED, the plan
    * columns are the contract a decode UDF consumes).
    */
  case class ResizePlan(
      doc_id: Long, media_type: String, width: Long, height: Long,
      out_w: Long, out_h: Long)

  def multimodalResize(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val m = decodeStub(id, payload)
        val longSide = math.max(m.width, m.height)
        // ceil-free integer scale: out = dim * box / longSide
        ResizePlan(m.doc_id, m.media_type, m.width, m.height,
          out_w = m.width * ResizeBox / longSide,
          out_h = m.height * ResizeBox / longSide)
      })
      .toDF()
  }

  def sqlMultimodalResize: String =
    s"""SELECT doc_id, media_type, width, height,
       |  CAST(width * $ResizeBox // greatest(width, height) AS BIGINT) AS out_w,
       |  CAST(height * $ResizeBox // greatest(width, height) AS BIGINT) AS out_h
       |FROM ($sqlMultimodalDecode)""".stripMargin

  // -------------------------------------------------------- frame_sample

  /** Sample stride for [[multimodalFrameSample]]. */
  val FrameStride = 7L

  /** Frame sampling plan: every [[FrameStride]]-th frame index of
    * audio/video media (images contribute their single frame). The output
    * is (doc_id, frame_idx) rows — the fan-out shape a per-frame decode
    * UDF consumes downstream; the explode is the real plumbing, the frame
    * fetch is the stubbed part.
    */
  def multimodalFrameSample(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        val m = decodeStub(id, payload)
        (0L until m.n_frames by FrameStride).map(f => (m.doc_id, m.media_type, f))
      })
      .toDF("doc_id", "media_type", "frame_idx")
  }

  def sqlMultimodalFrameSample: String =
    s"""SELECT doc_id, media_type, unnest(range(0, n_frames, $FrameStride)) AS frame_idx
       |FROM ($sqlMultimodalDecode)""".stripMargin

  // ----------------------------------------------------- feature_extract

  /** Byte-level feature extraction: mean byte value and a coarse 4-bin
    * byte histogram over the payload — the shape of a real
    * feature-extract UDF (single pass over bytes per object, fixed-width
    * numeric feature columns out).
    */
  case class ByteFeatures(
      doc_id: Long, payload_bytes: Long, mean_byte: Double,
      h0: Long, h1: Long, h2: Long, h3: Long)

  def multimodalFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        var sum = 0L
        val h = new Array[Long](4)
        var i = 0
        while (i < payload.length) {
          val b = payload(i) & 0xff
          sum += b
          h(b >> 6) += 1
          i += 1
        }
        ByteFeatures(id, payload.length.toLong,
          if (payload.isEmpty) 0.0 else sum.toDouble / payload.length,
          h(0), h(1), h(2), h(3))
      })
      .toDF()
  }

  // ------------------------------------------- perceptual-hash image dedup

  /** dHash grid geometry: [[DhashRows]] rows × ([[DhashCols]]+1) sampled
    * columns; bit (r, c) is set iff sample(r, c) > sample(r, c+1) —
    * 64 bits total, the standard difference-hash (the LAION-scale
    * image-dedup signature: gradient direction survives resizing,
    * re-encoding and small edits, so near-duplicate images land within
    * a few bits).
    */
  val DhashRows = 8
  val DhashCols = 8
  val DhashBands = 4
  val DhashBandBits = 16

  /** STUB sample grid hash over the payload bytes — the declared-stub
    * discipline of [[decodeStub]]: sample (r, c) is payload byte
    * (r·(cols+1)+c) mod len, standing in for the decoded-and-downscaled
    * gray grid (the real path is [[dhashImage]]); the comparison
    * cascade, banding and pair join downstream are the REAL operator,
    * and the oracle mirrors the byte arithmetic over the UTF-8 text.
    */
  private def dhashStubCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // one codegen'd kernel call (round 14) — bit-identical to the
    // 128-substr expression form below, which stays as the spec's
    // reference implementation (StubKernelSpec pins kernel ≡ expression)
    org.apache.spark.sql.graftext.ArrayFunctions.dhash_stub(
      coalesce(text, lit("")), lit(0L), DhashRows, DhashCols)

  /** The pre-kernel expression form — spec reference ONLY (the 128-substr
    * `when` chain the kernel replaced; [[dhashStubCol]] must stay
    * bit-identical to this on every input).
    */
  private[graft] def dhashStubColExpr(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = coalesce(text, lit(""))
    val n = length(t)
    def sample(j: Int) = ascii(t.substr(lit(j) % n + 1, lit(1)))
    val bits = (0 until DhashRows * DhashCols).map { k =>
      val r = k / DhashCols
      val c = k % DhashCols
      when(sample(r * (DhashCols + 1) + c) > sample(r * (DhashCols + 1) + c + 1),
        lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
    when(n === 0, lit(0L)).otherwise(bits).cast("long")
  }

  /** Per-doc stub dHash signatures (doc_id, dhash). */
  def imageDhashStub(docs: DataFrame): DataFrame =
    DedupOps.fanout(docs)
      .select(col("doc_id"), dhashStubCol(col("text")).as("dhash"))

  /** Near-duplicate image pairs by banded Hamming join over the dHash —
    * [[DedupOps.hammingBandPairs]] (the simhash pigeonhole machinery)
    * at 64 bits / 4×16-bit bands: hamming ≤ [[DedupOps.MaxHamming]]
    * pairs agree on ≥ 1 band, so the join key is (band, value), never
    * the cross product. Run over [[imageDhashStub]] for the oracle key;
    * production swaps in [[imageDhash]]'s real-decode signatures — the
    * pair machinery is identical.
    */
  def dedupImageDhash(docs: DataFrame): DataFrame =
    DedupOps.hammingBandPairs(
      DedupOps.materialize(imageDhashStub(docs), "dhash_signatures"),
      "dhash", DhashBands, DhashBandBits, DedupOps.MaxHamming,
      DedupOps.BandBucketCap)

  private def sqlDhashBits: String = {
    val sample = (j: Int) =>
      s"greatest(unicode(substr(text, ($j % n) + 1, 1)), 0)"
    val bits = (0 until DhashRows * DhashCols).map { k =>
      val r = k / DhashCols
      val c = k % DhashCols
      s"CASE WHEN ${sample(r * (DhashCols + 1) + c)} > ${sample(r * (DhashCols + 1) + c + 1)} THEN ${1L << k} ELSE 0 END"
    }.mkString(" + ")
    s"CASE WHEN n = 0 THEN 0 ELSE $bits END"
  }

  def sqlImageDhashStub: String =
    s"""SELECT doc_id, CAST($sqlDhashBits AS BIGINT) AS dhash
       |FROM (SELECT doc_id, coalesce(text, '') AS text,
       |        strlen(coalesce(text, '')) AS n
       |      FROM documents)""".stripMargin

  def sqlDedupImageDhash: String = {
    val mask = (1L << DhashBandBits) - 1
    val bandArms = (0 until DhashBands)
      .map(j => s"SELECT doc_id, dhash, $j AS band_idx, (dhash >> ${j * DhashBandBits}) & $mask AS band_val FROM sig")
      .mkString("\nUNION ALL\n")
    s"""WITH sig AS (
       |  SELECT doc_id, CAST($sqlDhashBits AS BIGINT) AS dhash
       |  FROM (SELECT doc_id, coalesce(text, '') AS text,
       |          strlen(coalesce(text, '')) AS n
       |        FROM documents)),
       |bands AS (
       |  SELECT doc_id, dhash, band_idx, band_val FROM (
       |    SELECT doc_id, dhash, band_idx, band_val,
       |      row_number() OVER (PARTITION BY band_idx, band_val ORDER BY doc_id) AS rn
       |    FROM (
       |$bandArms))
       |  WHERE rn <= ${DedupOps.BandBucketCap})
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
       |FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= ${DedupOps.MaxHamming}""".stripMargin
  }

  /** Per-image dHash; `decoded = false` carries hash 0 (quarantine row). */
  case class DhashMeta(doc_id: Long, dhash: Long, decoded: Boolean)

  /** Pixel budget for the FULL decode [[dhashImage]] needs (unlike the
    * header-only [[decodeImage]]): a corrupt header declaring 60000²
    * pixels would OOM the executor at `ImageIO.read` — the header is
    * checked FIRST and oversized payloads are quarantined undecoded.
    */
  val DhashMaxPixels = 64L * 1024 * 1024

  /** REAL perceptual hash: JDK decode → integer luma → nearest-sample
    * downscale to the ([[DhashCols]]+1)×[[DhashRows]] grid → the same
    * comparison cascade as the stub. All integer (299/587/114 luma,
    * truncating division), so the hash is bit-deterministic across
    * JVMs.
    */
  def dhashImage(docId: Long, payload: Array[Byte]): DhashMeta = {
    val header = decodeImage(docId, payload)
    if (!header.decoded ||
        header.width * header.height > DhashMaxPixels ||
        header.width == 0 || header.height == 0)
      return DhashMeta(docId, 0L, decoded = false)
    imageIoNoDiskCache
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return DhashMeta(docId, 0L, decoded = false)
    val w = img.getWidth
    val h = img.getHeight
    def gray(x: Int, y: Int): Int = {
      val rgb = img.getRGB(x, y)
      val r = (rgb >> 16) & 0xff
      val g = (rgb >> 8) & 0xff
      val b = rgb & 0xff
      (r * 299 + g * 587 + b * 114) / 1000
    }
    var bits = 0L
    var k = 0
    while (k < DhashRows * DhashCols) {
      val r = k / DhashCols
      val c = k % DhashCols
      val y = r * h / DhashRows
      val xa = c * w / (DhashCols + 1)
      val xb = (c + 1) * w / (DhashCols + 1)
      if (gray(xa, y) > gray(xb, y)) bits |= (1L << k)
      k += 1
    }
    DhashMeta(docId, bits, decoded = true)
  }

  /** (doc_id, payload) → real dHash signatures, per-partition like
    * [[imageDecode]]. Feed the decoded rows to
    * [[DedupOps.hammingBandPairs]] via [[dedupImageDhashReal]].
    */
  def imageDhash(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images
      .select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => dhashImage(id, p) })
      .toDF()
  }

  /** Real-image near-duplicate pairs: decoded signatures → the shared
    * banded Hamming join. No oracle twin (DuckDB has no image codec);
    * spec-proven on generated PNGs with a planted near-duplicate.
    */
  def dedupImageDhashReal(spark: SparkSession, images: DataFrame): DataFrame =
    DedupOps.hammingBandPairs(
      // materialize: the pair join's two self-join branches would each
      // re-run the full image decode without it
      DedupOps.materialize(
        imageDhash(spark, images).filter(col("decoded"))
          .select(col("doc_id"), col("dhash")),
        "dhash_signatures_real"),
      "dhash", DhashBands, DhashBandBits, DedupOps.MaxHamming,
      DedupOps.BandBucketCap)

  /** Oracle twin over text chars (ASCII ⇒ chars are the bytes). */
  def sqlMultimodalFeatures: String =
    """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS payload_bytes,
      |  CASE WHEN strlen(text) = 0 THEN 0.0 ELSE
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), codes), (a,x) -> a+x) AS DOUBLE) / strlen(text)
      |  END AS mean_byte,
      |  CAST(len(list_filter(codes, x -> x // 64 = 0)) AS BIGINT) AS h0,
      |  CAST(len(list_filter(codes, x -> x // 64 = 1)) AS BIGINT) AS h1,
      |  CAST(len(list_filter(codes, x -> x // 64 = 2)) AS BIGINT) AS h2,
      |  CAST(len(list_filter(codes, x -> x // 64 = 3)) AS BIGINT) AS h3
      |FROM (SELECT doc_id, text,
      |        -- empty-payload guard: DuckDB string_split('','') is ['']
      |        -- (code -1), not [] — Spark's empty byte array has no bytes
      |        CASE WHEN strlen(text) = 0 THEN CAST([] AS BIGINT[])
      |             ELSE list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) END AS codes
      |      FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents))""".stripMargin
}
