package graft.ops

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** [[DedupOps.fanoutIfNarrow]]'s probe contract (r13): deciding whether
  * to apply the insurance shuffle must not RUN anything — the pre-r13
  * `df.rdd.getNumPartitions` probe forced AQE's final physical plan,
  * which eagerly executed upstream shuffle stages for derived inputs.
  */
class FanoutProbeSpec extends graft.SparkSuite {

  test("probe runs zero jobs even on a shuffle-bearing derived frame") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // a derived frame whose physical plan REQUIRES a shuffle: the old
    // probe executed that shuffle before the operator even started
    val derived = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
    derived.queryExecution.assertAnalyzed()
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val fanned = DedupOps.fanoutIfNarrow(derived)
      // job submission inside the old probe was SYNCHRONOUS (AQE blocks
      // on stage materialization), so any job would have started before
      // this point; the short sleep only covers listener-bus delivery
      Thread.sleep(1000)
      assert(jobs.get() == 0,
        s"fanoutIfNarrow probe must be job-free, saw ${jobs.get()} job(s)")
      assert(fanned.columns.toSeq == derived.columns.toSeq)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("a MATERIALIZED one-file cache still fans out (the token-table case)") {
    // the bench's shared token table is a cached one-file scan — the r12
    // win was fanning its consumers out; the cache probe must report the
    // cached RDD's true (serial) partitioning without forcing anything
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
    try {
      docs.count() // materialize: the probe may only read a LOADED cache
      val fanned = DedupOps.fanoutIfNarrow(docs.select("doc_id", "text"))
      assert(fanned.rdd.getNumPartitions == target,
        "consumers of a serial materialized cache get the insurance shuffle")
    } finally { docs.unpersist(); () }
  }

  test("one-file fixture scans fan out; already-wide inputs pass through") {
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the local fixture is ONE small parquet file -> estimated splits 1
    // -> the insurance shuffle applies
    val fanned = DedupOps.fanoutIfNarrow(docs)
    assert(fanned.rdd.getNumPartitions == target,
      "narrow single-file scan gets the insurance repartition")
    // a many-file source estimates wide and passes through UNTOUCHED
    // (reference equality: no extra plan node, no shuffle)
    val wideDir = java.nio.file.Files.createTempDirectory("fanout-wide").toString
    docs.repartition(target).write.mode("overwrite").parquet(wideDir)
    val wide = spark.read.parquet(wideDir)
    assert(DedupOps.fanoutIfNarrow(wide) eq wide,
      "multi-file scan is already parallel — no insurance shuffle")
  }
}
