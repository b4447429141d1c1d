package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main (Test scope only — not part of the library).
  * Edit freely; run with `Test/runMain graft.Probe`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // dump selected queries + their oracle SQL for scripts/check.py
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_lsh_recall")
    val sfDir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.01")
    val outDir = "/tmp/probe_check"
    new java.io.File(outDir).mkdirs()
    for (n <- names)
      SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.map(n => s"${q(n)}: ${q(SparkEntry.oracleSql(n))}")
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
