package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.PostTrainOps
import graft.stream.PrefStream

/** Streaming preference state: the queryable pair set over everything
  * ingested equals batch dpoPairs on the same corpus, across restarts;
  * state is split-invariant (shard/batch boundaries can't move a pair).
  */
class PrefStreamSpec extends SparkSuite {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("prompt_id", "chosen_id", "rejected_id", "n_candidates")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("streamed pairs ≡ batch dpoPairs over all ingested docs, across a restart") {
    val docsDir = tmp("pref-docs")
    val outDir = tmp("pref-out")
    val ckpt = tmp("pref-ckpt")
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val f1 = fixture.filter(col("doc_id") < 150)
    val f2 = fixture.filter(col("doc_id") >= 150 && col("doc_id") < 300)
    val f3 = fixture.filter(col("doc_id") >= 300)

    f1.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    f2.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PrefStream.run(spark, docsDir, outDir, ckpt))
    assert(pairSet(PrefStream.pairs(spark, outDir)) ==
      pairSet(PostTrainOps.dpoPairs(f1.unionByName(f2))),
      "streamed pairs must equal batch dpoPairs over the ingested prefix")

    // restart with more data: compacted state carries the history, and a
    // previously-emitted pair may be displaced by a better/worse candidate
    f3.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PrefStream.run(spark, docsDir, outDir, ckpt))
    assert(pairSet(PrefStream.pairs(spark, outDir)) ==
      pairSet(PostTrainOps.dpoPairs(fixture)),
      "post-restart pairs must equal batch dpoPairs over everything")
  }

  test("nodup face: streamed ≡ batch dpoPairsNodup across restart; cross-batch near-dup pair dropped") {
    import spark.implicits._
    val docsDir = tmp("prefnd-docs")
    val outDir = tmp("prefnd-out")
    val ckpt = tmp("prefnd-ckpt")
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "the small cat sits on the warm mat near the open door while many " +
      "other gentle words continue in this long sentence about nothing"
    // prompt group 250 is vacated in the fixture and repopulated with a
    // planted near-dup candidate pair (one token apart → simhash within
    // the hamming gate, rewards strictly differing → a pair IS emitted)
    val planted = Seq(
      (250L, base, "s"),
      (506L, base + " okay then", "s")).toDF("doc_id", "text", "source")
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
      .filter(pmod(col("doc_id"), lit(256)) =!= 250)
    val corpus = fixture.unionByName(planted)
    // the planted pair SPANS the restart: 506 in the first ingest, 250
    // in the second — the accumulated signature index must connect them
    val f1 = corpus.filter(col("doc_id") < 150 || col("doc_id") === 506L)
    val f2 = corpus.filter(col("doc_id") >= 150 && col("doc_id") =!= 506L)
    f1.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PrefStream.run(spark, docsDir, outDir, ckpt))
    f2.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PrefStream.run(spark, docsDir, outDir, ckpt))
    val streamedAll = pairSet(PrefStream.pairs(spark, outDir))
    val streamedNodup = pairSet(PrefStream.pairsNodup(spark, outDir))
    assert(streamedNodup == pairSet(PostTrainOps.dpoPairsNodup(corpus)),
      "streamed nodup pairs must equal batch dpoPairsNodup over everything")
    val dropped = streamedAll -- streamedNodup
    assert(dropped.exists(p => Set(p._2, p._3) == Set(250L, 506L)),
      s"the planted cross-batch near-dup pair must be dropped: $dropped")
  }

  test("re-ingested doc folds to ONE signature (latest batch wins): no pair fan-out") {
    import spark.implicits._
    val docsDir = tmp("prefri-docs")
    val outDir = tmp("prefri-out")
    val ckpt = tmp("prefri-ckpt")
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    fixture.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PrefStream.run(spark, docsDir, outDir, ckpt))
    // re-ingest a slice with CHANGED text: each doc now carries two
    // signature delta rows; the read-side fold must keep the newest
    val reingested = fixture.filter(col("doc_id") < 50)
      .withColumn("text", concat(col("text"), lit(" entirely new suffix")))
    reingested.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PrefStream.run(spark, docsDir, outDir, ckpt))
    val nodup = PrefStream.pairsNodup(spark, outDir)
    val rowsAll = nodup.collect()
    assert(rowsAll.length == rowsAll.distinct.length &&
      rowsAll.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).distinct.length
        == rowsAll.length,
      "a re-ingested doc's duplicate signature rows must not fan pairs out")
    // latest-wins: the gate must evaluate against the LATEST signatures
    // of everything ingested — i.e. batch dpoPairsNodup over the folded
    // corpus (original docs with the re-ingested slice's new text),
    // with the re-ingested rewards MERGED into the accumulated state
    // (max/min merge — the state face's own contract)
    val foldedCorpus = fixture.filter(col("doc_id") >= 50)
      .unionByName(reingested)
    val latestSigs = graft.ops.DedupOps.simhashSignature(foldedCorpus)
    val p = PrefStream.pairs(spark, outDir)
    val expected = p
      .join(latestSigs.select(col("doc_id").as("chosen_id"),
        col("simhash").as("sim_c")), Seq("chosen_id"), "left")
      .join(latestSigs.select(col("doc_id").as("rejected_id"),
        col("simhash").as("sim_r")), Seq("rejected_id"), "left")
      .filter(coalesce(
        bit_count(col("sim_c").bitwiseXOR(col("sim_r")))
          > graft.ops.DedupOps.MaxHamming, lit(true)))
    assert(pairSet(nodup) == pairSet(expected.select(p.columns.map(col): _*)),
      "nodup gate must evaluate against the latest-batch signatures")
  }

  test("advantages face: frozen accumulated stats over the full corpus reproduce batch grpoAdvantage exactly") {
    val docsDir = tmp("prefadv-docs")
    val outDir = tmp("prefadv-out")
    val ckpt = tmp("prefadv-ckpt")
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    // ingest in two batches; the accumulated stats then cover the corpus
    fixture.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.mode(SaveMode.Append).parquet(docsDir)
    fixture.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PrefStream.run(spark, docsDir, outDir, ckpt))
    def advMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val streamed = advMap(PrefStream.advantages(spark, outDir, fixture))
    val batch = advMap(PostTrainOps.grpoAdvantage(fixture))
    assert(streamed == batch,
      "frozen-stats advantages over the full corpus must BE batch grpoAdvantage")
  }

  test("split-invariance and replay: merging shard states equals the union's state, byte-stable") {
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val a = fixture.filter(col("doc_id") % 2 === 0)
    val b = fixture.filter(col("doc_id") % 2 === 1)
    def stateMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val merged = stateMap(PostTrainOps.mergePrefStates(
      PostTrainOps.prefState(a), PostTrainOps.prefState(b)))
    assert(merged == stateMap(PostTrainOps.prefState(fixture)),
      "shard-state merge must equal the union's state")
    // replay in miniature: re-deriving from the same (prior, batch) is stable
    val again = stateMap(PostTrainOps.mergePrefStates(
      PostTrainOps.prefState(a), PostTrainOps.prefState(b)))
    assert(merged == again)
  }

  test("nodup face reads legacy _sims deltas written without a batch_id column") {
    val docsDir = tmp("preflg-docs")
    val outDir = tmp("preflg-out")
    val ckpt = tmp("preflg-ckpt")
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    fixture.filter(col("doc_id") < 150).coalesce(1)
      .write.mode(SaveMode.Append).parquet(docsDir)
    fixture.filter(col("doc_id") >= 150).coalesce(1)
      .write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(PrefStream.run(spark, docsDir, outDir, ckpt))
    val expected = pairSet(PrefStream.pairsNodup(spark, outDir))
    // rewrite batch 0's delta in the PRE-batch_id format (the legacy
    // store): the fold key must recover from the b_<id> dir name, so a
    // mixed-vintage store reads without schema failures or stale picks
    val b0 = s"$outDir/_sims/b_0"
    val legacy = spark.read.parquet(b0).drop("batch_id").collect()
    val schema = spark.read.parquet(b0).drop("batch_id").schema
    spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(legacy: _*)), schema)
      .coalesce(1).write.mode("overwrite").parquet(b0)
    assert(!spark.read.parquet(b0).columns.contains("batch_id"))
    assert(pairSet(PrefStream.pairsNodup(spark, outDir)) == expected,
      "legacy deltas must fold identically via the path-derived batch id")
  }
}
