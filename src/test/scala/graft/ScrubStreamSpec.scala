package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.stream.ScrubStream

/** Streaming line-df accumulation: summed deltas equal the batch df
  * over everything ingested; the frozen-index scrub reproduces the
  * batch op when the state covers the corpus — and a cross-batch
  * boilerplate line (invisible to every single batch) is caught.
  */
class ScrubStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("cross-batch boilerplate found; frozen scrub ≡ batch scrub over the ingested corpus") {
    val docsDir = tmp("scrub-docs")
    val outDir = tmp("scrub-out")
    val ckpt = tmp("scrub-ckpt")
    val bp = "accept our cookies to continue"
    def mk(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    // the boilerplate line appears ONCE per batch — no single batch can
    // see df >= 3; only the accumulated index can
    val b1 = mk(Seq((1L, s"intro\n$bp"), (2L, "clean two")))
    val b2 = mk(Seq((3L, s"$bp\nbody three")))
    val b3 = mk(Seq((4L, s"x\n$bp\ny")))
    Seq(b1, b2, b3).foreach(
      _.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir))
    awaitDone(ScrubStream.run(spark, docsDir, outDir, ckpt))

    val all = b1.unionByName(b2).unionByName(b3)
    // accumulated df ≡ batch df
    val streamedDf = ScrubStream.currentDf(spark, outDir)
      .as[(String, Long)].collect().toMap
    val batchDf = TextOps.lineDfCounts(all)
      .as[(String, Long)].collect().toMap
    assert(streamedDf == batchDf)

    // frozen scrub over the covered corpus ≡ the batch op
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_dropped", "scrubbed")
        .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val streamed = m(ScrubStream.scrubAgainst(spark, outDir, all))
    assert(streamed == m(TextOps.scrubBoilerplateLines(all)))
    // and the cross-batch line was actually dropped everywhere
    assert(streamed(1L)._2 == 1L && streamed(3L)._2 == 1L && streamed(4L)._2 == 1L)
    assert(streamed(4L)._3 == "x\ny")
  }
}
