package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.PretrainOps

/** Streaming embedding-drift monitoring — the frozen-reference face of
  * [[graft.ops.PretrainOps.embedDrift]]: the reference per-dimension
  * means train ONCE batch-side ([[graft.ops.PretrainOps.embedDriftRef]],
  * a D-row artifact) and every arriving embedding batch is checked
  * against them by [[graft.ops.PretrainOps.embedDriftWith]] — one
  * dim-keyed map-side-combined agg per micro-batch, D rows out. This is
  * the production deployment of the monitor: the gate RUNS where the
  * embeddings arrive (the ingest stream), not where the reference was
  * computed, and an alert (any `drifted` row) fires before the
  * cosine-threshold operators consume a mixed space.
  *
  * Stateless like [[ScoreStream]]: the reference is immutable, so
  * exactly-once needs only per-batch overwrite (`outDir/b_<id>`); a
  * replayed batch rewrites identical rows. `outDir/current` republishes
  * the latest batch's monitor table for a dashboard to read.
  */
object DriftStream {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)
  ))

  def run(spark: SparkSession, embDir: String, outDir: String,
      checkpointDir: String, refMicro: Map[Long, Long],
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(embSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(embDir)
      .writeStream
      .queryName(s"graft-drift-stream-${QueryNames.suffix(checkpointDir)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // compute ONCE: republish `current` from the written parquet —
        // a second write of the uncached monitor frame would re-run the
        // whole per-batch aggregation (two jobs on the ingest path)
        PretrainOps.embedDriftWith(batch, refMicro)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$outDir/b_$batchId")
        spark.read.parquet(s"$outDir/b_$batchId")
          .write.mode("overwrite").parquet(s"$outDir/current")
        ()
      }
      .start()
}
