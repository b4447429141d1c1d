package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.PretrainOps
import graft.stream.HllStream

/** Cross-batch HLL accumulation: the streamed running estimate equals
  * the batch sketch over everything ingested, across restarts, and
  * replay cannot move it (max-merge idempotence).
  */
class HllStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def latestEstimate(outDir: String) = {
    val all = spark.read.parquet(s"$outDir/estimate/b_*")
    val last = all.agg(max("batch_id")).head().getLong(0)
    all.filter(col("batch_id") === last)
      .select("source", "hll_est", "n_zero")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
  }

  test("running streamed estimate ≡ batch sketch over all ingested docs") {
    val docsDir = tmp("hll-docs")
    val outDir = tmp("hll-out")
    val ckpt = tmp("hll-ckpt")
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")

    val f1 = fixture.filter(col("doc_id") < 150)
    val f2 = fixture.filter(col("doc_id") >= 150 && col("doc_id") < 300)
    val f3 = fixture.filter(col("doc_id") >= 300)

    f1.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    f2.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(HllStream.run(spark, docsDir, outDir, ckpt))

    def batchExpect(df: org.apache.spark.sql.DataFrame) =
      PretrainOps.hllEstimates(PretrainOps.hllRegisters(df))
        .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
        .toMap

    assert(latestEstimate(outDir) == batchExpect(f1.unionByName(f2)),
      "streamed running sketch must equal the batch sketch")

    // restart with more data: the compacted state carries the history
    f3.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(HllStream.run(spark, docsDir, outDir, ckpt))
    assert(latestEstimate(outDir) == batchExpect(fixture),
      "post-restart running sketch must cover everything ever ingested")
  }

  test("replayed registers cannot move the estimate (max-merge idempotence)") {
    val docs = Seq((1L, "alpha beta gamma delta", "s"),
      (2L, "epsilon zeta eta theta", "s")).toDF("doc_id", "text", "source")
    val regs = PretrainOps.hllRegisters(docs)
    val doubled = regs.unionByName(regs)
      .groupBy("source", "bucket").agg(max("m").as("m"))
    assert(PretrainOps.hllEstimates(doubled).collect().toSeq ==
      PretrainOps.hllEstimates(regs).collect().toSeq)
  }
}
