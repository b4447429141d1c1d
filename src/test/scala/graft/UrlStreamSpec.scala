package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.stream.UrlStream

/** Streaming crawl frontier: noise variants fold before the membership
  * check, a canonical URL emits exactly once across batches and
  * restarts, and the union of emissions equals batch dedupUrl's
  * first-seen clusters when files arrive in doc_id order.
  */
class UrlStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("fresh-only emission across batches + restart; ≡ batch dedupUrl first-seen") {
    val urlsDir = tmp("uf-urls"); val outDir = tmp("uf-out"); val ckpt = tmp("uf-ckpt")

    // batch-side corpus: urls synthesized by the SAME rawUrl rule the
    // batch key uses; stream-side files carry exactly those raw strings
    val docs = (0L until 20L).map(i => (i, "x", "srcA"))
      .toDF("doc_id", "text", "source")
    val raws = TextOps.urlNormalize(docs)
      .select("doc_id", "url_raw").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

    // ascending doc_id split: ids 0..7 (every item id once per variant
    // pattern), then 8..19 (each a noise variant of an ALREADY-seen
    // canonical: id 8 clean = id 0's page, id 9's :443/ form = id 1's …)
    val (file1, file2) = raws.partition(_._1 < 8)
    file1.toSeq.toDF("doc_id", "url_raw")
      .coalesce(1).write.mode(SaveMode.Append).parquet(urlsDir)
    file2.toSeq.toDF("doc_id", "url_raw")
      .coalesce(1).write.mode(SaveMode.Append).parquet(urlsDir)
    awaitDone(UrlStream.run(spark, urlsDir, outDir, ckpt))

    val emitted = spark.read.parquet(s"$outDir/batch_*")
      .select("url_canon", "rep_doc_id", "batch_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // every canonical URL emits exactly once
    assert(emitted.map(_._1).distinct.length === emitted.length)
    // all of file2's URLs were noise variants of file1 pages → batch 1
    // emits NOTHING fresh
    assert(emitted.forall(_._3 === 0L),
      "cross-batch variants of seen pages must not re-enter the frontier")

    // ≡ batch dedupUrl over everything ingested (first-seen reps)
    val batchClusters = TextOps.dedupUrl(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(emitted.map(e => (e._1, e._2)).toSet === batchClusters)

    // restart with one genuinely new page + one more variant of an old
    // one: only the new page emits
    Seq((100L, "https://NEWHOST.example.com:443/item/9/"),
        (101L, raws(3)._2))
      .toDF("doc_id", "url_raw")
      .coalesce(1).write.mode(SaveMode.Append).parquet(urlsDir)
    awaitDone(UrlStream.run(spark, urlsDir, outDir, ckpt))
    val b2 = spark.read.parquet(s"$outDir/batch_2").collect()
    assert(b2.length === 1)
    assert(b2.head.getAs[String]("url_canon")
      === "https://newhost.example.com/item/9")
    assert(b2.head.getAs[Long]("rep_doc_id") === 100L)
  }
}
