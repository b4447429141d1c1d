package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming exact dedup for continuous corpus ingestion: documents arrive
  * as files of (doc_id, text); the first occurrence of each normalized
  * content hash passes, later duplicates are dropped ACROSS micro-batches
  * (unlike the CDC pipeline's per-batch LWW dedup, this keeps state).
  *
  * Spark-native state: `dropDuplicates` on the content hash inside
  * Structured Streaming keeps one state-store entry per distinct hash —
  * O(distinct content) state, checkpointed, exactly the semantics of a
  * dedup index in front of a training-data lake. With an event-time
  * column and `withWatermark` + `dropDuplicatesWithinWatermark`, state
  * becomes bounded for time-windowed dedup; corpus dedup wants the
  * unbounded variant (a duplicate a month later is still a duplicate),
  * so state grows with distinct content — at 100 TB that's the RocksDB
  * state-store backend, sized by hash+key only (32 B/doc), not text.
  */
object DedupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)
  ))

  /** Normalized content hash (same normalization as DedupOps.dedupExact). */
  private def contentHash: org.apache.spark.sql.Column =
    md5(trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), "\\s+", " ")))

  def run(spark: SparkSession, docsDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .withColumn("content_hash", contentHash)
      .dropDuplicates("content_hash")
      .writeStream
      .queryName("graft-dedup-stream")
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .trigger(trigger)
      .format("parquet")
      .start()
}
