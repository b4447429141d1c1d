package org.apache.spark.sql.graftext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Block-manager hygiene for `localCheckpoint`-truncated frames.
  *
  * `Dataset.localCheckpoint(eager = true)` pins the computed partitions in
  * the block manager for the life of the SparkContext — and, unlike the
  * SQL cache, `spark.catalog.clearCache()` does NOT free them. An
  * iterative algorithm that checkpoints per round (connected components)
  * therefore accumulates one pinned RDD per round; in a shared JVM those
  * blocks pressure every later query (round 3's bench misattributed ~7 s
  * to untouched queries exactly this way). These helpers let the loop free
  * each round's checkpoint as soon as the next round has materialized.
  */
object CheckpointBlocks {

  /** The pinned RDD behind a `localCheckpoint`'d DataFrame (None for
    * frames whose plan has no `LogicalRDD` leaf — e.g. the parquet
    * checkpoint path, where there is nothing to free).
    */
  def pinnedRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Free the checkpoint blocks behind `df`. Only call once every
    * consumer of `df` has materialized: the checkpoint truncated the
    * lineage, so a post-unpersist access cannot recompute.
    */
  def unpersist(df: DataFrame): Unit =
    pinnedRdd(df).foreach { r => r.unpersist(blocking = false); () }

  /** Per-query measurement hygiene, shared by Bench / BenchProbe /
    * PlanInventory so the three harnesses always measure the same thing:
    * clear the SQL cache AND drop every pinned RDD — `clearCache` only
    * empties the SQL cache; localCheckpoint blocks (the CC loops' final
    * rounds, whose blocks back the returned frame and are the CALLER's to
    * release) stay pinned until explicitly unpersisted, and in a shared
    * JVM they pressure every later query.
    */
  def resetForMeasurement(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.catalog.clearCache()
    // blocking: this is a measurement BARRIER — a fire-and-forget
    // unpersist races the next timed query, leaving the prior query's
    // blocks in executor memory while it starts (exactly the
    // misattribution this helper exists to prevent)
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
