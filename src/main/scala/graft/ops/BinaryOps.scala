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
