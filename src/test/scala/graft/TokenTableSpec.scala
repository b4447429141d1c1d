package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import graft.ops.{DedupOps, PretrainOps, TextOps, TokenizerOps}

/** The tokenize-once shared token table (TextOps.tokenize/toksOf):
  * every batch token consumer resolves its tokens through `toksOf`, so
  * handing an operator the pre-tokenized `documents.* + toks` frame —
  * cached in-process (SparkEntry) or written as parquet (the 100 TB
  * face) — must produce BIT-IDENTICAL results to inline tokenization,
  * and must actually skip the re-tokenize (no split() of text left in
  * the plan above the shared table).
  */
class TokenTableSpec extends SparkSuite {

  private def docs: DataFrame = spark.read.parquet(s"$sf/documents.parquet")

  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).sorted.toSeq
  }

  /** Representative consumers across the families the table serves:
    * n-gram card, fluency ladder, vocabulary, decontamination, substring
    * trim-apply, BPE.
    */
  private def consumers: Seq[(String, DataFrame => DataFrame)] = Seq(
    "ngram_topk" -> (d => PretrainOps.ngramTopk(d)),
    "quality_bigram_fluency" -> (d => PretrainOps.qualityBigramFluency(d)),
    "vocab_coverage" -> (d => PretrainOps.vocabCoverage(d)),
    "decontaminate" -> (d => PretrainOps.decontaminate(d)),
    "dedup_substring_apply" -> (d => PretrainOps.dedupSubstringApply(d)),
    "unigram_commonness" -> (d => PretrainOps.unigramCommonness(d)),
    "minhash_signature" -> (d => DedupOps.minhashSignature(d)),
    "tokenize_bpe" -> (d =>
      TokenizerOps.tokenizeBpe(d, Seq(TokenizerOps.BpeMerge("t", "h", 1))))
  )

  test("shared token table (cached) ≡ inline tokenization, per consumer") {
    val shared = TextOps.tokenize(docs).cache()
    try {
      for ((name, op) <- consumers)
        assert(rows(op(shared)) == rows(op(docs)),
          s"$name drifted when fed the shared token table")
    } finally shared.unpersist()
  }

  test("parquet-materialized token table (the 100 TB face) ≡ inline") {
    val dir = java.nio.file.Files.createTempDirectory("toktbl").toString
    TextOps.tokenize(docs).write.mode("overwrite").parquet(dir)
    val shared = spark.read.parquet(dir)
    assert(shared.columns.contains(TextOps.ToksCol))
    for ((name, op) <- Seq(consumers.head, consumers(3)))
      assert(rows(op(shared)) == rows(op(docs)),
        s"$name drifted when fed the parquet token table")
  }

  test("consumers of the shared table do not re-tokenize") {
    // no split(lower(text)) above the pre-tokenized frame: a StringSplit
    // in the optimized plan of a consumer fed the MATERIALIZED table
    // would be a re-derivation bug in some op's internals. (The table
    // must be materialized — parquet here, cache in SparkEntry — or the
    // optimizer legitimately collapses the projection and inlines the
    // split back; that is the lazy-view case, not the shared-table one.)
    val dir = java.nio.file.Files.createTempDirectory("toktbl2").toString
    TextOps.tokenize(docs).write.mode("overwrite").parquet(dir)
    val shared = spark.read.parquet(dir)
    for ((name, op) <- consumers if name != "tokenize_bpe") {
      val plan = op(shared).queryExecution.optimizedPlan
      val splits = plan.collectWithSubqueries { case p => p }
        .flatMap(_.expressions)
        .flatMap(_.collect {
          case s: org.apache.spark.sql.catalyst.expressions.StringSplit => s })
      assert(splits.isEmpty,
        s"$name re-tokenizes despite the shared toks column: $splits")
    }
  }

  test("SparkEntry text-family queries read the per-corpus cached table") {
    // run one text query to force the cache, then assert another's
    // EXECUTED plan scans the InMemoryRelation rather than parquet
    SparkEntry.queries("token_count")(spark, sf).collect()
    val df = SparkEntry.queries("ngram_topk")(spark, sf)
    df.collect()
    def all(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(all)) ++ (p match {
        case a: AdaptiveSparkPlanExec => all(a.executedPlan)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec => all(qs.plan)
        case _ => Seq.empty
      })
    assert(all(df.queryExecution.executedPlan)
        .exists(_.isInstanceOf[InMemoryTableScanExec]),
      "ngram_topk should consume the shared cached token table")
  }
}
