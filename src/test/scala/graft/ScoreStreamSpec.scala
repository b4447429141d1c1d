package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.PretrainOps
import graft.stream.ScoreStream

/** Streaming DSIR scoring: the frozen-λ apply face equals the batch
  * operator, per-batch cost is stateless, and restarts neither lose nor
  * duplicate scores.
  */
class ScoreStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("dsirWeightWith(full λ of the corpus) ≡ dsirWeight on that corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lam = PretrainOps.dsirLambdaFull(docs)
    assert(lam.size == PretrainOps.DsirBuckets)
    val got = PretrainOps.dsirWeightWith(docs, lam)
      .select("doc_id", "n_grams", "weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = PretrainOps.dsirWeight(docs)
      .select("doc_id", "n_grams", "weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp,
      "the in-row frozen-λ fold must reproduce the distributed-join scorer")
  }

  test("dsirWeightWith refuses a partial λ table") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      PretrainOps.dsirWeightWith(docs, Map(0L -> 0L))
    }
  }

  test("curation e2e: CleanStream survivors → frozen-λ scores ≡ batch clean+score") {
    import graft.ops.{CorpusOps, DedupOps, TextOps}
    import graft.stream.{CleanStream, DedupStream}
    val docsDir = tmp("ce-docs")
    val outDir = tmp("ce-out")
    val ckpt = tmp("ce-ckpt")
    val scoreDir = tmp("ce-scores")

    // real corpus texts so the REAL gates fire; one in-batch duplicate
    // pair (order-free: same file) — cross-batch dup mechanics belong to
    // CleanStreamSpec, THIS spec is the composition contract
    val material = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").select("text").as[String].collect().toSeq
    val file1 = (0 until 25).map(i => (i.toLong, material(i)))
    val file2 = (0 until 10).map(i => (100L + i, material(30 + i))) ++
      Seq((120L, material(50)), (121L, material(50)))
    val lam = PretrainOps.dsirLambdaFull(
      spark.read.parquet(s"$sf/documents.parquet"))

    file1.toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    file2.toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(CleanStream.runFrom(spark,
      spark.readStream.schema(DedupStream.docSchema)
        .option("maxFilesPerTrigger", 1).parquet(docsDir),
      outDir, ckpt, benchGrams = None,
      onSurvivors = (surv, bid) =>
        PretrainOps.dsirWeightWith(surv, lam)
          .withColumn("batch_id", lit(bid))
          .write.mode("overwrite").parquet(s"$scoreDir/b_$bid")))

    // batch twin of the whole composition: gates + exact dedup, then the
    // same frozen-λ scorer
    val all = (file1 ++ file2).toDF("doc_id", "text")
    val (_, quality) = TextOps.qualityCols(col("text"))
    val gated = all.filter(quality >= CorpusOps.QualityThreshold &&
      TextOps.detectLang(col("text")).isin(CorpusOps.AcceptedLangs: _*))
    val survivors = gated.join(
      DedupOps.dedupExact(gated).select(col("rep_doc_id").as("doc_id")),
      "doc_id")
    val expect = PretrainOps.dsirWeightWith(survivors, lam)
      .select("doc_id", "n_grams", "weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = spark.read.parquet(s"$scoreDir/b_*")
      .select("doc_id", "n_grams", "weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect,
      "streamed clean→score composition must equal the batch pipeline")
    assert(got.nonEmpty && got.size < (file1.size + file2.size),
      "the gates/dedup must actually have filtered something")
  }

  test("streamed scores ≡ batch scores across a restart, exactly once") {
    val docsDir = tmp("ds-docs")
    val outDir = tmp("ds-out")
    val ckpt = tmp("ds-ckpt")

    // λ trains on the HISTORICAL corpus (the fixture), then freezes; the
    // stream scores new docs the trainer never saw — including tokens
    // hashing to buckets the training corpus left empty (the smoothed
    // ct=0/cr=0 λ, not a hole)
    val hist = spark.read.parquet(s"$sf/documents.parquet")
    val lam = PretrainOps.dsirLambdaFull(hist)

    val file1 = Seq((1000L, "the market opened higher"),
      (1001L, "zzqx vvkp unseen tokens"))
    val file2 = Seq((1002L, "the cat sat on the mat"))
    val file3 = Seq((1003L, "shares closed lower on friday"))

    file1.toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    file2.toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(ScoreStream.run(spark, docsDir, outDir, ckpt, lam))

    // restart with one more file: the checkpoint must resume, scoring
    // ONLY the new arrival
    file3.toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(ScoreStream.run(spark, docsDir, outDir, ckpt, lam))

    val streamed = spark.read.parquet(s"$outDir/b_*")
    // exactly once: no doc scored twice across all batch outputs
    assert(streamed.count() == streamed.select("doc_id").distinct().count())
    val got = streamed.select("doc_id", "n_grams", "weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exp = PretrainOps.dsirWeightWith(
        (file1 ++ file2 ++ file3).toDF("doc_id", "text"), lam)
      .select("doc_id", "n_grams", "weight_micro").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp, "streamed union must equal the batch apply")
    // ≥ 3 batches really ran (maxFilesPerTrigger=1, 3 files)
    assert(streamed.select("batch_id").distinct().count() >= 3)
  }
}
