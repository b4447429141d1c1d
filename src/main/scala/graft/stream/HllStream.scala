package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.PretrainOps

/** Streaming distinct-cardinality monitoring — cross-batch HyperLogLog
  * accumulation, the stateful sibling of [[ManifestStream]] with MAX
  * where the manifest uses SUM+XOR: each micro-batch writes only its own
  * (source, bucket, m) register DELTA (`_regs/b_<id>`), and the
  * published estimate max-merges all deltas up to and including the
  * batch — so the running "distinct grams per source" number covers
  * everything ever ingested while total state I/O stays
  * O(batches · S · [[graft.ops.PretrainOps.HllM]]) registers, never a
  * distinct shuffle, never the corpus.
  *
  * Replay safety is STRUCTURAL, stronger than the manifest's versioning
  * argument: max-merge is idempotent, so even double-counting a replayed
  * batch's registers cannot move the estimate (the spec replays one and
  * asserts equality). A restart resumes from the deltas.
  */
object HllStream {

  def run(spark: SparkSession, docsDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("source", StringType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(docsDir)
      .writeStream
      .queryName(s"graft-hll-stream-${QueryNames.suffix(checkpointDir)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val regsRoot = s"$outDir/_regs"
        val mine = PretrainOps.hllRegisters(batch)
        mine.write.mode("overwrite").parquet(s"$regsRoot/b_$batchId")
        val priorDirs = VersionedState.allBefore(spark, regsRoot, batchId)
        val all = priorDirs.foldLeft(mine)((acc, d) =>
          acc.unionByName(spark.read.parquet(d)))
        val merged = all.groupBy("source", "bucket").agg(max("m").as("m"))
        PretrainOps.hllEstimates(merged)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$outDir/estimate/b_$batchId")
        ()
      }
      .start()
}
