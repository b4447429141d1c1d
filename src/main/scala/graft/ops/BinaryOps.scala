package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, decoded per-partition with imperative Scala (the
  * Spark-side shape a real decoder plugs into: one iterator per partition,
  * no per-row task overhead, codec state reusable across a partition).
  *
  * The container has no image/audio libraries, so the decode step is a
  * clearly-marked DETERMINISTIC STUB ([[decodeStub]]) that reads fake header
  * fields from the first payload bytes; the Spark-side plumbing — binary
  * column, typed result schema, partition-iterator batch shape — is real
  * and oracle-tested (the stub's arithmetic is mirrored in SQL over the
  * UTF-8 bytes of `text`).
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
    */
  def multimodalDecode(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), encode(col("text"), "UTF-8").as("payload"))
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
      |  CAST(64 * (1 + unicode(substr(text, 1, 1)) % 8) AS BIGINT) AS width,
      |  CAST(64 * (1 + unicode(substr(text, 2, 1)) % 8) AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 1 + strlen(text) % 240 END AS BIGINT) AS n_frames,
      |  CAST(strlen(text) AS BIGINT) AS payload_bytes
      |FROM documents""".stripMargin
}
