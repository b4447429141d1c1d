package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.PostTrainOps

/** Streaming pass@k — the continuous face of
  * [[graft.ops.PostTrainOps.passAtK]] for a generation service emitting
  * verified candidates: each micro-batch reduces to its own per-prompt
  * (n_candidates, n_passing) state ([[PostTrainOps.passState]] — two
  * SUMS, so shard/batch states merge into exactly the state of the
  * union), SUM-merges it into the latest prior COMPACTED version (the
  * [[CmsStream]] discipline), and publishes the estimator table from
  * the merged state through the SHARED emission rule
  * ([[PostTrainOps.passFromState]]) — two faces, one reduction, one
  * emission, so they cannot drift.
  *
  * Replay safety rests on the [[VersionedState]] argument (SUM is not
  * idempotent): a batch reads only versions strictly below its own id
  * and overwrites its own, so a replayed batch re-derives identical
  * state and estimates. State is ≤ [[PostTrainOps.PassGroups]] rows of
  * three longs at any corpus size — metadata-scale I/O per batch.
  *
  * The published estimate CONVERGES: after the final batch the state
  * equals [[PostTrainOps.passState]] of everything ingested, so the
  * last published table IS the batch operator's output (spec-asserted
  * across a restart). Mid-stream tables are the running estimate over
  * candidates seen so far — exactly what a live eval dashboard wants.
  */
object PassStream {

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
      .queryName(s"graft-pass-stream-${QueryNames.suffix(checkpointDir)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val root = s"$outDir/_state"
        val mine = PostTrainOps.passState(batch)
        val merged = VersionedState.latestBefore(spark, root, batchId) match {
          case Some(prev) => mine.unionByName(spark.read.parquet(prev))
            .groupBy("prompt_id")
            .agg(sum("n_candidates").as("n_candidates"),
              sum("n_passing").as("n_passing"))
          case None => mine
        }
        merged.coalesce(1).write.mode("overwrite").parquet(s"$root/b_$batchId")
        // estimates from the read-back snapshot (stable under re-planning)
        PostTrainOps.passFromState(spark.read.parquet(s"$root/b_$batchId"))
          .withColumn("batch_id", lit(batchId))
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
        ()
      }
      .start()
}
