package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for named declared queries to files —
  * the before/after plan evidence for optimization rounds (plans/rNN/).
  * Usage: Test/runMain graft.PlanDump <outDir> <suffix> <query> [query ...]
  * Writes <outDir>/<query>_<suffix>.txt per query. Runs each query first
  * (noop write) so the dumped plan is the post-AQE executed plan, then
  * appends the formatted logical->physical explain of a fresh instance.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query> [query ...]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.warmShared(spark, sf)
    catch { case e: Throwable => println(s"warmShared failed: ${e.getMessage}") }
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      org.apache.spark.sql.graftext.CheckpointBlocks.resetForMeasurement(spark,
        SparkEntry.sharedCaches(spark, sf))
      val df = SparkEntry.queries(name)(spark, sf)
      // run first: AQE final stages + executed-plan string
      df.write.format("noop").mode("overwrite").save()
      val executed = df.queryExecution.executedPlan.toString
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val body =
        s"""== $name ($suffix, $sf) ==
           |
           |---- executed plan (post-AQE) ----
           |$executed
           |---- explain formatted ----
           |$formatted""".stripMargin
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), body)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
