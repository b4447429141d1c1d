package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.TextOps

/** Streaming rank-sketch accumulation — the percentile family's
  * incremental face, riding [[graft.ops.TextOps.lengthPercentilesSketch]]'s
  * lossless merge property: each micro-batch levels its own docs
  * ([[TextOps.sketchLevels]] — a narrow projection), compacts them INTO
  * the latest prior state ([[TextOps.sketchCompact]] — the prior's `t`
  * floors the new one, its `n_docs` accumulates), and writes the result
  * as `_sketch/b_<id>`. Because the sketch of a multiset is a pure
  * function of that multiset (hash-level coins, no arrival order), the
  * state after ANY prefix of batches is IDENTICAL to the batch sketch
  * over the union of their docs — the spec asserts bit-equality across
  * a restart, not merely approximation-level agreement.
  *
  * State I/O per batch is O(cap · log n) rows per source regardless of
  * stream age ([[VersionedState]] compacted-versioned discipline;
  * replay-safe because compaction is idempotent given the same prior
  * version and batch input).
  */
object SketchStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType)))

  def run(spark: SparkSession, docsDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream
      .queryName(s"graft-sketch-stream-${QueryNames.suffix(checkpointDir)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val root = s"$outDir/_sketch"
        val lv = TextOps.sketchLevels(batch)
        val merged = VersionedState.latestBefore(spark, root, batchId) match {
          case Some(prev) =>
            TextOps.sketchCompact(lv, Some(spark.read.parquet(prev)))
          case None => TextOps.sketchCompact(lv, None)
        }
        merged.write.mode("overwrite").parquet(s"$root/b_$batchId")
        ()
      }
      .start()

  /** The query face: estimated percentile points per source from the
    * newest published state — identical output schema (and, by the merge
    * property, identical VALUES) to the batch operator over everything
    * ingested so far.
    */
  def percentiles(spark: SparkSession, outDir: String): DataFrame = {
    val root = s"$outDir/_sketch"
    val latest = VersionedState
      .latestBefore(spark, root, Long.MaxValue)
      .getOrElse(sys.error(s"SketchStream.percentiles: no state under $root"))
    TextOps.sketchPercentiles(spark.read.parquet(latest))
  }
}
