package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.{PretrainOps, TextOps}
import graft.stream.BudgetStream

/** Streaming token-budget admission: a one-batch stream is byte-equal to
  * the batch operator, a multi-batch stream is the greedy fill over the
  * batch sequence, a saturated source stays closed across batches and
  * restarts, and per-batch state I/O is one sources-sized table.
  */
class BudgetStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** (bucket, doc_id) admission order of a set of docs — the operator's
    * deterministic order, recomputed via the same expressions.
    */
  private def bucketOrder(rows: Seq[(Long, String, String)]): Seq[Long] =
    rows.toDF("doc_id", "text", "source")
      .select(col("doc_id"),
        pmod(TextOps.tokenHash(concat(lit("budget:"), col("doc_id").cast("string"))),
          lit(PretrainOps.BudgetBuckets)).as("bucket"))
      .collect().map(r => (r.getLong(1), r.getLong(0)))
      .sortBy(identity).map(_._2).toSeq

  test("one-batch stream ≡ batch tokenBudgetFill; every doc emitted with a decision") {
    val docsDir = tmp("bu-docs"); val outDir = tmp("bu-out"); val ckpt = tmp("bu-ckpt")
    // per-source totals cross the 800 budget → a real boundary per source
    val rows = (0L until 12L).map(i =>
      (i, Seq.fill(200)("w" + i).mkString(" "), if (i % 2 == 0) "sA" else "sB"))
    rows.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(BudgetStream.run(spark, docsDir, outDir, ckpt))

    val streamed = spark.read.parquet(s"$outDir/batch_*")
    assert(streamed.count() === 12L, "audit superset: every doc emitted")
    val admitted = streamed.filter(col("admit"))
      .select("doc_id", "source", "n_tok", "cum_before").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = PretrainOps.tokenBudgetFill(rows.toDF("doc_id", "text", "source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(admitted === batch,
      "a single micro-batch must reproduce the batch operator exactly")
    assert(admitted.nonEmpty && admitted.size < 12,
      "the budget must actually have rejected something")
  }

  test("multi-batch greedy fill; saturated source stays closed across restart") {
    val docsDir = tmp("bm-docs"); val outDir = tmp("bm-out"); val ckpt = tmp("bm-ckpt")
    def doc(i: Long, n: Int) = (i, Seq.fill(n)("t" + i).mkString(" "), "s")
    val file1 = Seq(doc(1, 300), doc(2, 300))
    val file2 = Seq(doc(3, 300), doc(4, 300))
    file1.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    file2.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(BudgetStream.run(spark, docsDir, outDir, ckpt))

    val got = spark.read.parquet(s"$outDir/batch_*")
      .select("doc_id", "cum_before", "admit").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    // batch 1 admits both, in ITS (bucket, doc_id) order (0, then 300 —
    // both < 800); totals 600
    val Seq(a1, a2) = bucketOrder(file1)
    assert(got(a1) === ((0L, true)) && got(a2) === ((300L, true)))
    // batch 2 in (bucket, doc_id) order: first sees 600 (< 800, admit —
    // greedy boundary overshoot), second sees 900 (closed)
    val Seq(first, second) = bucketOrder(file2)
    assert(got(first) === ((600L, true)) && got(second) === ((900L, false)))

    // restart with a TINY doc: the source is saturated — it must stay
    // closed (cum counts all SEEN tokens, the batch monotone-prefix rule)
    Seq(doc(9, 5)).toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(BudgetStream.run(spark, docsDir, outDir, ckpt))
    val after = spark.read.parquet(s"$outDir/batch_*")
      .filter(col("doc_id") === 9L).collect()
    assert(after.length === 1 && !after.head.getAs[Boolean]("admit")
      && after.head.getAs[Long]("cum_before") === 1200L)

    // state is one sources-sized version per batch
    val totals = spark.read.parquet(s"$outDir/_totals/b_2")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(totals.toSeq === Seq(("s", 1205L)))
  }
}
