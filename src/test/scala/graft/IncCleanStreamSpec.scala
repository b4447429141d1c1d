package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.ops.CorpusOps
import graft.stream.IncCleanStream

/** The streaming daily-rebuild loop: a change feed of upserts +
  * tombstones, each batch PATCHING the full four-stage clean state —
  * the queryable clean table must equal batch cleanCorpus over the
  * folded document store after every ingest, including across a
  * restart, with edits, deletions (promotion) and re-additions in the
  * churn.
  */
class IncCleanStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("change-feed patches ≡ batch cleanCorpus over the folded store, across restart") {
    val changesDir = tmp("incclean-chg")
    val outDir = tmp("incclean-out")
    val ckpt = tmp("incclean-ckpt")
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")

    // batch 0: the initial load (the one-time full state build)
    fixture.withColumn("deleted", lit(false))
      .coalesce(1).write.mode(SaveMode.Append).parquet(changesDir)
    awaitDone(IncCleanStream.run(spark, changesDir, outDir, ckpt))
    assert(rows(IncCleanStream.currentClean(spark, outDir)) ===
      rows(CorpusOps.cleanCorpus(fixture)),
      "initial load must equal the batch clean")

    // batch 1 (post-restart): edits (%11 upper-cased), deletions (%5),
    // and a brand-new doc — the realistic recrawl churn
    val edits = fixture.filter(col("doc_id") % 11 === 0)
      .withColumn("text", upper(col("text")))
      .withColumn("deleted", lit(false))
    // %5∧%11 docs are edited, not deleted (one row per doc per batch —
    // the feed contract)
    val dels = fixture.filter(col("doc_id") % 5 === 0 && col("doc_id") % 11 =!= 0)
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        col("source"), lit(true).as("deleted"))
    val added = Seq((900001L,
      "the quick brown fox jumps over the lazy dog and then the small " +
        "cat sits on the warm mat near the open door", "s0"))
      .toDF("doc_id", "text", "source").withColumn("deleted", lit(false))
    edits.unionByName(dels).unionByName(added)
      .coalesce(1).write.mode(SaveMode.Append).parquet(changesDir)
    awaitDone(IncCleanStream.run(spark, changesDir, outDir, ckpt))

    // the reference corpus after the churn, folded by hand
    val v2 = fixture.filter(col("doc_id") % 5 =!= 0 || col("doc_id") % 11 === 0)
      .withColumn("text",
        when(col("doc_id") % 11 === 0, upper(col("text")))
          .otherwise(col("text")))
      .unionByName(added.drop("deleted"))
    assert(rows(IncCleanStream.currentClean(spark, outDir)) ===
      rows(CorpusOps.cleanCorpus(v2)),
      "patched clean after churn must equal the from-scratch rebuild")
  }
}
