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
}
