package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps
import graft.stream.IndexStream

/** Streaming IVF index maintenance: exactly-once appends into the
  * partitioned serving layout, converging to the batch-built index.
  */
class IndexStreamSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("streamed index equals batch index; probe search served from it, pruned") {
    val embDir = Files.createTempDirectory("ix-emb").toString
    val indexDir = Files.createTempDirectory("ix-idx").toString
    val ckpt = Files.createTempDirectory("ix-ckpt").toString

    val half = emb.filter($"vec_id" % 2 === 0)
    val rest = emb.filter($"vec_id" % 2 =!= 0)
    half.coalesce(1).write.mode(SaveMode.Append).parquet(embDir)
    val q1 = IndexStream.run(spark, embDir, indexDir, ckpt)
    awaitDone(q1)

    // restart: the file-sink metadata log must carry over, no double-appends
    rest.coalesce(1).write.mode(SaveMode.Append).parquet(embDir)
    val q2 = IndexStream.run(spark, embDir, indexDir, ckpt)
    awaitDone(q2)

    // the streamed index holds exactly the full vector set, once each
    val ids = spark.read.parquet(indexDir).select("vec_id").as[Long].collect()
    assert(ids.length == ids.distinct.length, "replay must never double-append")
    assert(ids.toSet == emb.select("vec_id").as[Long].collect().toSet)

    // and serves the probe search identically to the batch-built index
    val got = SimilarityOps.annIvfProbeIndexed(spark, indexDir, emb)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val base = SimilarityOps.annIvfProbe(emb)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == base)
  }

  test("streamed IVFADC index: restart-safe PQ-coded appends, ADC search equals in-memory") {
    val embDir = Files.createTempDirectory("ixpq-emb").toString
    val indexDir = Files.createTempDirectory("ixpq-idx").toString
    val ckpt = Files.createTempDirectory("ixpq-ckpt").toString

    val half = emb.filter($"vec_id" % 2 === 0)
    val rest = emb.filter($"vec_id" % 2 =!= 0)
    half.coalesce(1).write.mode(SaveMode.Append).parquet(embDir)
    awaitDone(IndexStream.runPq(spark, embDir, indexDir, ckpt))
    rest.coalesce(1).write.mode(SaveMode.Append).parquet(embDir)
    awaitDone(IndexStream.runPq(spark, embDir, indexDir, ckpt))

    // codes only, every vector exactly once
    val idx = spark.read.parquet(indexDir)
    assert(idx.columns.toSet == Set("vec_id", "codes", "centroid"))
    val ids = idx.select("vec_id").as[Long].collect()
    assert(ids.length == ids.distinct.length, "replay must never double-append")
    assert(ids.toSet == emb.select("vec_id").as[Long].collect().toSet)

    val got = SimilarityOps.annIvfPqProbeIndexed(spark, indexDir, emb)
      .select("query_id", "neighbor_id", "rank", "approx_d2")
      .as[(Long, Long, Long, Double)].collect().toSet
    val base = SimilarityOps.annIvfPqProbe(emb)
      .select("query_id", "neighbor_id", "rank", "approx_d2")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == base)
  }

  test("appending the wrong index flavor refuses loudly (exact vs PQ-coded)") {
    val embDir = Files.createTempDirectory("ixfl-emb").toString
    val indexDir = Files.createTempDirectory("ixfl-idx").toString
    val ckpt = Files.createTempDirectory("ixfl-ckpt").toString
    emb.limit(50).coalesce(1).write.mode(SaveMode.Append).parquet(embDir)
    awaitDone(IndexStream.run(spark, embDir, indexDir, ckpt))
    // a PQ appender pointed at the exact-vector index: metadata log
    // exists, so only the flavor check can save the user
    val e = intercept[IllegalStateException] {
      IndexStream.runPq(spark, embDir, indexDir,
        Files.createTempDirectory("ixfl-ckpt2").toString)
    }
    assert(e.getMessage.contains("flavor"), e.getMessage)
  }

  test("appending into a batch-written index refuses loudly (metadata log would hide it)") {
    val batchDir = Files.createTempDirectory("ix-batch").toString
    val embDir = Files.createTempDirectory("ix-emb2").toString
    val ckpt = Files.createTempDirectory("ix-ckpt2").toString
    SimilarityOps.writeIvfIndex(emb, batchDir)
    emb.limit(10).write.mode(SaveMode.Append).parquet(embDir)
    val e = intercept[IllegalStateException] {
      IndexStream.run(spark, embDir, batchDir, ckpt)
    }
    assert(e.getMessage.contains("_spark_metadata"))
  }

  test("compactIndex: one file per list, probe-identical, in-place refused") {
    val embDir = Files.createTempDirectory("ixc-emb").toString
    val indexDir = Files.createTempDirectory("ixc-idx").toString
    val ckpt = Files.createTempDirectory("ixc-ckpt").toString
    // four micro-batches → four appended files per touched list
    for (k <- 0 until 4)
      emb.filter($"vec_id" % 4 === k).coalesce(1)
        .write.mode(SaveMode.Append).parquet(embDir)
    awaitDone(IndexStream.run(spark, embDir, indexDir, ckpt))

    def filesPerList(dir: String): Map[String, Int] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("centroid="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    }
    val before = filesPerList(indexDir)
    assert(before.values.exists(_ > 1),
      "test setup must produce a fragmented index")

    val compactDir = Files.createTempDirectory("ixc-out").toString
    SimilarityOps.compactIndex(spark, indexDir, compactDir)
    val after = filesPerList(compactDir)
    assert(after.keySet == before.keySet, "no list may vanish")
    assert(after.values.forall(_ == 1), s"still fragmented: $after")

    // identical rows AND identical probe results from the compacted dir
    val a = spark.read.parquet(indexDir).select("vec_id").as[Long].collect().toSet
    val b = spark.read.parquet(compactDir).select("vec_id").as[Long].collect().toSet
    assert(a == b)
    val got = SimilarityOps.annIvfProbeIndexed(spark, compactDir, emb)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val base = SimilarityOps.annIvfProbeIndexed(spark, indexDir, emb)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == base)

    val e = intercept[IllegalArgumentException] {
      SimilarityOps.compactIndex(spark, indexDir, indexDir)
    }
    assert(e.getMessage.contains("in-place"), e.getMessage)
  }
}
