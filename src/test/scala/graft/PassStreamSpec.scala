package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.PostTrainOps
import graft.stream.PassStream

/** Streaming pass@k: the published table converges to the batch
  * operator across batches and a restart, and a replayed batch's state
  * re-derivation is byte-stable (the CmsStream SUM-versioning argument).
  */
class PassStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("streamed pass@k converges to batch across batches and a restart") {
    val docsDir = tmp("ps-docs"); val outDir = tmp("ps-out"); val ckpt = tmp("ps-ckpt")
    val passTxt = "the quick brown fox jumps over the lazy dog again and again"
    val failTxt = Seq.fill(30)("spam").mkString(" ")
    // ids spread over prompt groups; mixed pass/fail by construction
    val file1 = (0L until 40L).map(i =>
      (i, if (i % 3 == 0) passTxt else failTxt, "s"))
    val file2 = (40L until 80L).map(i =>
      (i, if (i % 5 == 0) passTxt else failTxt, "s"))
    file1.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    file2.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PassStream.run(spark, docsDir, outDir, ckpt))

    def table(dir: String) = spark.read.parquet(dir)
      .select("prompt_id", "n_candidates", "n_passing", "pass_at_1", "pass_at_4")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap

    // after the last batch, the published table IS the batch operator's
    val batchAll = PostTrainOps.passAtK(
      (file1 ++ file2).toDF("doc_id", "text", "source"))
    val expect = batchAll.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(table(s"$outDir/batch_1") === expect)
    // mid-stream table = the running estimate over file1 only
    val expect1 = PostTrainOps.passAtK(file1.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(table(s"$outDir/batch_0") === expect1)

    // restart with a third file: state resumes from the compacted version
    val file3 = (80L until 100L).map(i => (i, passTxt, "s"))
    file3.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PassStream.run(spark, docsDir, outDir, ckpt))
    val expectAll = PostTrainOps.passAtK(
      (file1 ++ file2 ++ file3).toDF("doc_id", "text", "source"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(table(s"$outDir/batch_2") === expectAll)

    // replay byte-stability: re-deriving batch 2's state from its prior
    // version and input reproduces it exactly (the SUM-versioning
    // argument — a crash between sink write and checkpoint commit)
    val prior = spark.read.parquet(s"$outDir/_state/b_1")
    val mine = PostTrainOps.passState(file3.toDF("doc_id", "text", "source"))
    val rederived = mine.unionByName(prior).groupBy("prompt_id")
      .agg(sum("n_candidates").as("n_candidates"), sum("n_passing").as("n_passing"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = spark.read.parquet(s"$outDir/_state/b_2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rederived === stored)
  }
}
