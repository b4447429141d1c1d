package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.CorpusOps

/** The DAILY-REBUILD loop as a stream — the continuous face of
  * [[graft.ops.CorpusOps.cleanCorpusIncremental]]: the input is a
  * CHANGE FEED (upserts + delete tombstones, the shape a CDC pipe or a
  * recrawl diff emits), and every micro-batch patches the full
  * four-stage clean pipeline (quality gate → language gate → exact
  * dedup → MinHash/LSH near-dup removal) instead of rebuilding it —
  * the first batch pays the one-time [[CorpusOps.cleanState]] build,
  * every later batch only churn-proportional patch work. This closes
  * the gap [[CleanStream]] deliberately leaves (its LSH stage is
  * delegated): here near-dup state — signatures, capped per-bucket
  * candidates, verdicts — is maintained incrementally with the exact
  * promotion/demotion/cap-eviction semantics of the batch operator.
  *
  * Two versioned stores ([[VersionedState]] discipline — a batch reads
  * strictly below its own id and overwrites its own version, so
  * replays are byte-stable):
  *
  *   - `_docs/b_<id>`: the batch's doc rows verbatim (tombstones
  *     included) — APPEND-ONLY deltas whose last-writer-wins fold IS
  *     the current corpus snapshot. The clean state never stores text,
  *     but a PROMOTED doc (unchanged text, re-entering the survivor
  *     set because its better twin left) needs its text re-read to
  *     enter the signature index — production reads its document
  *     store; this stream maintains its own.
  *   - `_state/b_<id>/{gated,sigs,cands,verdicts}`: the patched
  *     [[CorpusOps.CleanState]] faces. Writing them flat each batch is
  *     the daily index write (and the LSM compaction of the in-memory
  *     base+delta chain); the cadence this face targets is the daily/
  *     hourly rebuild, not a per-second ticker.
  *
  * `added` vs `changed` needs no prior-text knowledge: the patch
  * treats them identically (both re-gate; the old rows, if any,
  * anti-join away), so every non-tombstone row is submitted as
  * `changed` and tombstones as `removed`.
  */
object IncCleanStream {

  val changeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType),
    StructField("deleted", BooleanType)))

  def run(spark: SparkSession, changesDir: String, outDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream
      .schema(changeSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(changesDir)
      .writeStream
      .queryName(s"graft-incclean-stream-${QueryNames.suffix(checkpointDir)}")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, outDir)
      }
      .start()

  private[stream] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, outDir: String): Unit = {
    val docsRoot = s"$outDir/_docs"
    val stateRoot = s"$outDir/_state"
    // 1. persist this batch's change rows (tombstones included)
    batch.withColumn("batch_id", lit(batchId))
      .coalesce(1).write.mode("overwrite")
      .parquet(VersionedState.versionDir(docsRoot, batchId))
    // 2. the current corpus snapshot: last writer wins per doc_id over
    // (prior deltas ∪ this batch), tombstones folded out
    val priorDeltas = VersionedState.allBefore(spark, docsRoot, batchId)
    val allRows =
      (if (priorDeltas.isEmpty) batch.withColumn("batch_id", lit(batchId))
       else spark.read.parquet(priorDeltas: _*)
         .unionByName(batch.withColumn("batch_id", lit(batchId))))
    // feed contract: at most one row per doc_id per batch (a CDC pipe
    // with finer granularity pre-folds on its own sequence column);
    // across batches the newest batch wins
    val wLast = Window.partitionBy("doc_id")
      .orderBy(col("batch_id").desc)
    val docStore = allRows
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1 && !col("deleted"))
      .select("doc_id", "text", "source")
    // 3. patch (or, on the first batch, build) the clean state
    val (clean, next) = VersionedState.latestBefore(spark, stateRoot, batchId) match {
      case Some(prev) =>
        val state = CorpusOps.CleanState(
          spark.read.parquet(s"$prev/gated"),
          spark.read.parquet(s"$prev/sigs"),
          spark.read.parquet(s"$prev/cands"),
          spark.read.parquet(s"$prev/verdicts"))
        val diff = batch.select(col("doc_id"),
          when(col("deleted"), lit("removed")).otherwise(lit("changed"))
            .as("status"))
        CorpusOps.cleanCorpusIncremental(docStore, state, diff)
      case None =>
        val st = CorpusOps.cleanState(docStore)
        (CorpusOps.cleanFromState(st), st)
    }
    // 4. persist the patched state + the queryable clean table
    val sd = VersionedState.versionDir(stateRoot, batchId)
    next.gated.write.mode("overwrite").parquet(s"$sd/gated")
    next.sigs.write.mode("overwrite").parquet(s"$sd/sigs")
    next.cands.write.mode("overwrite").parquet(s"$sd/cands")
    next.verdicts.write.mode("overwrite").parquet(s"$sd/verdicts")
    clean.write.mode("overwrite")
      .parquet(VersionedState.versionDir(s"$outDir/clean", batchId))
    ()
  }

  /** The current cleaned corpus — clean(v) for the newest ingested
    * version; identical to batch [[CorpusOps.cleanCorpus]] over the
    * folded document store (spec-asserted, across restarts).
    */
  def currentClean(spark: SparkSession, outDir: String): DataFrame = {
    val latest = VersionedState
      .latestBefore(spark, s"$outDir/clean", Long.MaxValue)
      .getOrElse(sys.error(s"IncCleanStream: no clean table under $outDir"))
    spark.read.parquet(latest)
  }
}
