package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (Test scope only — not part of the library).
  * Edit freely; run with `Test/runMain graft.Probe`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val sfDir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.ops.TextOps.tokenize(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()

    // stage breakdown of corpus_to_sequences
    import graft.ops.{CorpusOps, DedupOps, PretrainOps}
    val cleanIds = time("cleanCorpusDecontam")(
      { val c = CorpusOps.cleanCorpusDecontam(docs).select("doc_id"); exec(c); c })
    val survivors = time("survivors materialize")(
      { val s0 = docs.join(cleanIds, "doc_id").cache(); s0.count(); s0 })
    val trimmed = time("dedupSubstringTrim")(
      { val t = PretrainOps.dedupSubstringTrim(survivors)
          .filter(col("surviving_tokens") >= 1)
          .select(col("doc_id"), col("surviving_tokens").as("n_tokens"))
        exec(t); t })
    time("pack window")(
      exec(graft.SparkEntry.queries("corpus_to_sequences")(spark, sfDir)
        .limit(0)))
    spark.stop()
  }
}
