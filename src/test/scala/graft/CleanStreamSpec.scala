package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, DedupOps, TextOps}
import graft.stream.CleanStream

/** Streaming ingest clean pipeline: gates + cross-batch exact dedup via
  * the versioned hash-delta state + optional static-benchmark
  * decontamination, with a per-doc filter-reasons audit stream. The
  * survivors must equal the batch pipeline's gate+exact-dedup stages over
  * everything ingested — including across a restart, where the hash
  * deltas (not the stream's memory) carry the dedup history.
  */
class CleanStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Append one batch file and PIN its mtime: FileStreamSource orders
    * files by modification time, and two back-to-back writes can land on
    * the same timestamp — arbitrary batch order would flip first-seen-
    * wins and flake the min-doc_id equivalence assertions.
    */
  private val mtimeSeen = scala.collection.mutable.Set.empty[String]
  private def appendBatch(dir: String, rows: Seq[(Long, String)],
      order: Int): Unit = {
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .filterNot(f => mtimeSeen(f.getAbsolutePath))
      .foreach { f =>
        assert(f.setLastModified(1700000000000L + order * 60000L))
        mtimeSeen += f.getAbsolutePath
      }
  }

  /** Real corpus texts as material — they pass/fail the REAL gates the
    * way production text does (ids reassigned so batch order == id order).
    */
  private lazy val material: Seq[String] =
    spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").select("text").as[String].collect().toSeq

  private def expectedSurvivors(docs: Seq[(Long, String)]): Set[Long] = {
    val df = docs.toDF("doc_id", "text")
    val (_, quality) = TextOps.qualityCols(col("text"))
    val gated = df
      .filter(quality >= CorpusOps.QualityThreshold &&
        TextOps.detectLang(col("text")).isin(CorpusOps.AcceptedLangs: _*))
    gated.join(
        DedupOps.dedupExact(gated).select(col("rep_doc_id").as("doc_id")),
        "doc_id")
      .select("doc_id").as[Long].collect().toSet
  }

  test("streamed survivors equal the batch gate+dedup stages; dedup history survives a restart") {
    val docsDir = tmp("cs-docs")
    val outDir = tmp("cs-out")
    val ckpt = tmp("cs-ckpt")

    // file1: 40 distinct docs; file2: 5 cross-batch duplicates of file1
    // texts + 13 new + an in-batch duplicate pair (ids keep batch order)
    val file1 = (0 until 40).map(i => (i.toLong, material(i)))
    val file2 = (0 until 5).map(i => (100L + i, material(i))) ++
      (0 until 13).map(i => (110L + i, material(40 + i))) ++
      Seq((130L, material(55)), (131L, material(55)))
    appendBatch(docsDir, file1, 1)
    appendBatch(docsDir, file2, 2)
    awaitDone(CleanStream.run(spark, docsDir, outDir, ckpt))

    val got = spark.read.parquet(s"$outDir/batch_*")
      .select("doc_id").as[Long].collect().toSet
    val expect = expectedSurvivors(file1 ++ file2)
    assert(got == expect,
      s"streamed survivors diverged: extra=${got -- expect} missing=${expect -- got}")

    // reasons: one row per input doc; keep ≡ survivor membership;
    // the cross-batch copies are flagged dup_exact (their originals
    // passed the gates in batch 1)
    val reasons = spark.read.parquet(s"$outDir/reasons/batch_*")
    assert(reasons.count() == (file1.size + file2.size).toLong)
    val keepSet = reasons.filter(col("keep")).select("doc_id")
      .as[Long].collect().toSet
    assert(keepSet == got)
    val gatedOriginals = expectedSurvivors(file1).intersect((0L until 5L).toSet)
    val dupFlagged = reasons.filter(col("dup_exact")).select("doc_id")
      .as[Long].collect().toSet
    assert(gatedOriginals.map(_ + 100L).subsetOf(dupFlagged),
      "cross-batch copies of surviving docs must be dup_exact")

    // restart: a third file duplicating file1 content — the hash DELTAS,
    // not stream memory, must reject them
    val file3 = (0 until 6).map(i => (200L + i, material(i)))
    appendBatch(docsDir, file3, 3)
    awaitDone(CleanStream.run(spark, docsDir, outDir, ckpt))
    val got2 = spark.read.parquet(s"$outDir/batch_*")
      .select("doc_id").as[Long].collect().toSet
    assert(got2 == expectedSurvivors(file1 ++ file2 ++ file3),
      "post-restart survivors must still equal the batch stages")
    // file3 is ALL duplicates of file1 content — none may survive
    assert(got2.intersect((200L until 206L).toSet).isEmpty,
      "post-restart duplicates slipped past the delta state")
  }

  test("static-benchmark decontamination drops exactly the leaking doc") {
    val docsDir = tmp("csb-docs")
    val outDir = tmp("csb-out")
    val ckpt = tmp("csb-ckpt")
    val docs = (0 until 20).map(i => (i.toLong, material(i)))
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode(SaveMode.Append).parquet(docsDir)
    // benchmark = doc 3's text → doc 3 (if it passes the gates) must be
    // contaminated; docs sharing no 8-gram with it stay
    val bench = CleanStream.benchGramSet(
      Seq(material(3)).toDF("text"))
    awaitDone(CleanStream.run(spark, docsDir, outDir, ckpt, Some(bench)))
    val reasons = spark.read.parquet(s"$outDir/reasons/batch_*")
    val contam = reasons.filter(col("contaminated")).select("doc_id")
      .as[Long].collect().toSet
    val gated3 = expectedSurvivors(docs).contains(3L)
    if (gated3) {
      assert(contam.contains(3L), "the leaking doc must be flagged")
      val survivors = spark.read.parquet(s"$outDir/batch_*")
        .select("doc_id").as[Long].collect().toSet
      assert(!survivors.contains(3L))
      assert(survivors == expectedSurvivors(docs) -- contam)
    } else fail("test material invalid: doc 3 must pass the gates")
  }

  test("replayed batch does not read its own state delta (fresh-checkpoint rerun is idempotent)") {
    val docsDir = tmp("csr-docs")
    val outDir = tmp("csr-out")
    val docs = (0 until 15).map(i => (i.toLong, material(i))) ++
      Seq((20L, material(0))) // one duplicate
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(CleanStream.run(spark, docsDir, outDir, tmp("csr-ckpt1")))
    val first = spark.read.parquet(s"$outDir/batch_*")
      .select("doc_id").as[Long].collect().toSet
    // rerun with a FRESH checkpoint over the same out dir: batch 0
    // replays with its own b_0 delta already on disk — the `< batchId`
    // filter must hide it, or every doc would be "already seen"
    awaitDone(CleanStream.run(spark, docsDir, outDir, tmp("csr-ckpt2")))
    val second = spark.read.parquet(s"$outDir/batch_*")
      .select("doc_id").as[Long].collect().toSet
    assert(second == first, "replay must be idempotent")
    assert(first.nonEmpty && !first.contains(20L))
  }
}
