package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.PretrainOps
import graft.stream.SampleStream

/** Streaming deterministic reservoir: bounded per-stratum state across
  * micro-batches and restarts, converging to the batch operator.
  */
class SampleStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("streaming reservoir converges to batch sampleReservoir across restarts and eviction") {
    val docsDir = tmp("rs-docs")
    val outDir = tmp("rs-out")
    val ckpt = tmp("rs-ckpt")

    // 120 en docs (> ReservoirN=50, so the top-N must EVICT as better
    // keys arrive) + 30 de docs (< N, all kept); split across two files
    // so arrival order differs from doc_id order
    def doc(i: Long, lang: String) = (i, lang, s"src${i % 3}")
    val file1 = (1L to 80L).map(doc(_, "en")) ++ (201L to 215L).map(doc(_, "de"))
    val file2 = (81L to 120L).map(doc(_, "en")) ++ (216L to 230L).map(doc(_, "de"))
    val all = (file1 ++ file2).toDF("doc_id", "lang", "source")

    file1.toDF("doc_id", "lang", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q1 = SampleStream.run(spark, docsDir, outDir, ckpt)
    awaitDone(q1)

    // restart: state (the partial reservoirs) must survive the checkpoint
    file2.toDF("doc_id", "lang", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q2 = SampleStream.run(spark, docsDir, outDir, ckpt)
    awaitDone(q2)

    // documented consumption: current sample = latest snapshot per stratum
    val snaps = spark.read.parquet(s"$outDir/*")
    val latest = snaps.join(
      snaps.groupBy("lang").agg(max("batch_id").as("batch_id")),
      Seq("lang", "batch_id"))
    val got = latest.select("lang", "doc_id", "source", "h", "rk")
      .as[(String, Long, String, Long, Long)].collect().toSet

    val expected = PretrainOps.sampleReservoir(all)
      .select("lang", "doc_id", "source", "h", "rk")
      .as[(String, Long, String, Long, Long)].collect().toSet

    assert(got == expected, "streaming reservoir must equal the batch sample")
    // eviction really happened: en holds exactly N of the 120 candidates
    assert(got.count(_._1 == "en") == PretrainOps.ReservoirN)
    assert(got.count(_._1 == "de") == 30)
    // and the en reservoir is not just "the first 50 that arrived"
    val enIds = got.filter(_._1 == "en").map(_._2)
    assert(enIds.exists(_ > 80L), "late arrivals must be admissible")
  }

  test("streaming mixture: running totals converge the rate table to the batch operator's") {
    val docsDir = tmp("mx-docs")
    val outDir = tmp("mx-out")
    val ckpt = tmp("mx-ckpt")

    def doc(i: Long, src: String, words: Int) =
      (i, (1 to words).map(w => s"w$w").mkString(" "), src)
    // src3 token-heavy + target 0.5 => constrained rates on src1/src2... the
    // exact algebra is the operator's; the spec only needs rates < 1 somewhere
    val file1 = (1L to 20L).map(doc(_, "src1", 10)) ++
      (101L to 110L).map(doc(_, "src3", 40))
    val file2 = (21L to 40L).map(doc(_, "src2", 20)) ++
      (111L to 120L).map(doc(_, "src3", 40))
    val all = (file1 ++ file2).toDF("doc_id", "text", "source")

    file1.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q1 = SampleStream.runMixture(spark, docsDir, outDir, ckpt)
    awaitDone(q1)

    // restart: the versioned totals table must carry across queries
    file2.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q2 = SampleStream.runMixture(spark, docsDir, outDir, ckpt)
    awaitDone(q2)

    val lastBatch = spark.read.parquet(s"$outDir/*")
      .filter(col("batch_id") === spark.read.parquet(s"$outDir/*")
        .agg(max("batch_id")).head().getLong(0))

    // after the last batch the running totals ARE the global totals, so
    // the rate table equals the batch operator's — exactly (same exact
    // integer totals, same IEEE arithmetic)
    val batchOp = PretrainOps.sampleMixture(all)
    val gotRates = lastBatch.select("source", "keep_rate")
      .distinct().as[(String, Double)].collect().toMap
    // full rate table (sampleMixture's output only carries KEPT rows —
    // a source whose every doc was cut is absent there)
    val expRates = PretrainOps.mixtureRates(PretrainOps.mixTokenTotals(all))
      .as[(String, Double)].collect().toMap
    // (the final batch carries src2/src3 docs; src1's rate is in the
    // totals table but absent from this batch's rows)
    assert(gotRates.nonEmpty)
    for ((s, r) <- gotRates)
      assert(expRates(s) == r, s"rate mismatch for $s: $r vs ${expRates(s)}")

    // and the final batch's admissions match the batch operator's
    // decisions for its docs (the deterministic bucket is shared)
    val lastIds = file2.map(_._1).toSet
    val gotKept = lastBatch.filter(col("keep")).select("doc_id")
      .as[Long].collect().toSet
    val expKept = batchOp.select("doc_id").as[Long].collect().toSet
      .intersect(lastIds)
    assert(gotKept == expKept, s"admissions diverge: $gotKept vs $expKept")

    // every incoming doc was audited, kept or not
    assert(lastBatch.count() == file2.size)
  }
}
