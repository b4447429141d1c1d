package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.ProfileOps
import graft.stream.ValidateStream

/** Streaming data-quality counters: the running rule table equals the
  * batch validation over everything ingested, across a restart — with
  * the documented pk_unique per-batch caveat exercised explicitly.
  */
class ValidateStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def ruleMap(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long)].collect().toMap

  test("running rule totals ≡ batch validate over all ingested docs, across a restart") {
    val docsDir = tmp("val-docs")
    val outDir = tmp("val-out")
    val ckpt = tmp("val-ckpt")
    def mk(rows: Seq[(java.lang.Long, String, String)]) =
      rows.toDF("doc_id", "text", "lang")
        .withColumn("source", lit("s"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    // batch 1: clean. batch 2: one null lang + one n_chars lie
    val b1 = mk(Seq((1L, "ok one", "en"), (2L, "ok two", "en")))
    val b2 = mk(Seq((3L, "ok three", null)))
      .unionByName(mk(Seq((4L, "liar", "en")))
        .withColumn("n_chars", lit(99L)))
    b1.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    b2.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(ValidateStream.run(spark, docsDir, outDir, ckpt))
    val got = ruleMap(ValidateStream.current(spark, outDir))
    assert(got == ruleMap(ProfileOps.validateCorpus(b1.unionByName(b2))),
      s"got $got")
    assert(got("lang_not_null") == 1L && got("n_chars_consistent") == 1L)

    // restart with a batch that repeats key 1 IN-BATCH (detected) —
    // key 2 repeating ACROSS batches is the documented blind spot
    val b3 = mk(Seq((5L, "dup a", "en"), (5L, "dup b", "en"), (2L, "cross-batch dup", "en")))
    b3.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(ValidateStream.run(spark, docsDir, outDir, ckpt))
    val got2 = ruleMap(ValidateStream.current(spark, outDir))
    assert(got2("pk_unique") == 1L,
      "in-batch duplicate counted; cross-batch duplicate is the documented caveat")
    // everything else accumulates exactly
    assert(got2("lang_not_null") == 1L && got2("n_chars_consistent") == 1L &&
      got2("pk_not_null") == 0L && got2("text_not_null") == 0L)
  }
}
