package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling and constraint validation — the Deequ-style
  * gate a production pipeline runs BEFORE spending cluster-days on a
  * corpus: a one-pass statistical profile (the data card's table
  * section) and a rule table of constraint violation counts (the
  * hard gate: nonzero rows block the run).
  *
  * Scale shape: [[profileCorpus]] is ONE aggregation pass to ONE row —
  * every statistic is map-side combinable (counts, conditional counts,
  * min/max, sums); the distinct counts are over the two LOW-cardinality
  * columns only (lang, source — never text). [[validateCorpus]] pays
  * one extra doc_id-keyed exchange for the duplicate-key rule (the one
  * constraint that genuinely needs a shuffle) and derives every other
  * rule from the same one-pass conditional counts.
  */
object ProfileOps {

  /** One-row statistical profile of the documents table. */
  def profileCorpus(docs: DataFrame): DataFrame =
    docs.agg(
      count(lit(1)).as("n_rows"),
      count(col("text")).as("n_text"),
      count(col("lang")).as("n_lang"),
      count(col("source")).as("n_source"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      min(col("n_chars")).as("min_chars"),
      max(col("n_chars")).as("max_chars"),
      sum(col("n_chars")).as("sum_chars"),
      count(when(col("n_chars") === 0, 1)).as("n_empty"))

  def sqlProfileCorpus: String =
    """SELECT count(*) AS n_rows,
      |  count(text) AS n_text,
      |  count(lang) AS n_lang,
      |  count(source) AS n_source,
      |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |  min(n_chars) AS min_chars,
      |  max(n_chars) AS max_chars,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(count(CASE WHEN n_chars = 0 THEN 1 END) AS BIGINT) AS n_empty
      |FROM documents""".stripMargin

  /** Constraint-violation rule table: one row per rule with its
    * violation count — zero everywhere or the corpus does not ship.
    * Rules: primary key present and unique; text present; declared
    * n_chars consistent with the text; lang present. The rule NAMES
    * are the contract (a dashboard keys on them), so they are literals
    * here, not derived.
    */
  def validateCorpus(docs: DataFrame): DataFrame = {
    // one pass for the four row-local rules, reshaped to rule rows —
    // LAZY (no collect: the gate composes into plans and noop-write
    // benches without running jobs at construction time)
    val base = docs.agg(
      count(when(col("doc_id").isNull, 1)).as("null_key"),
      count(when(col("text").isNull, 1)).as("null_text"),
      count(when(col("lang").isNull, 1)).as("null_lang"),
      count(when(col("n_chars") =!= length(col("text")), 1))
        .as("chars_mismatch"))
    val dups = docs.filter(col("doc_id").isNotNull)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L))
        .as("dup_key"))
    // reshape via ONE map-explode over the joined one-row frames — a
    // per-rule union would re-run the base aggregate (and re-scan the
    // corpus) once per arm: measured 6 exchanges vs 4, and 5 scans
    base.crossJoin(dups)
      .select(explode(map(
        lit("pk_not_null"), col("null_key").cast("long"),
        lit("pk_unique"), col("dup_key").cast("long"),
        lit("text_not_null"), col("null_text").cast("long"),
        lit("lang_not_null"), col("null_lang").cast("long"),
        lit("n_chars_consistent"), col("chars_mismatch").cast("long"))))
      .toDF("rule", "n_violations")
  }

  /** THE published data card (one (metric, value) table) — the summary
    * every corpus release ships: size, token mass, dedup rate, language
    * share, quality mean. Everything derives from TWO single-pass
    * aggregations (one over the raw docs incl. the exact-dup distinct,
    * one over the quality-score table), cross-joined 1×1 and reshaped
    * by one map-explode (the validateCorpus discipline). Doubles come
    * from exact integer sums divided once — partition order cannot
    * move a digit.
    */
  def dataCard(docs: DataFrame): DataFrame = {
    val toks = TextOps.toksOf(docs)
    val base = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(toks).cast("long")).as("n_tokens"),
      sum(col("n_chars")).as("sum_chars"),
      count(when(col("lang") === "en", 1)).as("n_en"),
      countDistinct(DedupOps.normalizedContentHash).as("n_distinct"),
      count(when(col("n_chars") === 0, 1)).as("n_empty"))
    val quality = TextOps.qualityScore(docs)
      .agg(sum(floor(col("quality") * 1e6).cast("long")).as("q_micros"),
        count(col("quality")).as("n_scored"))
    base.crossJoin(quality)
      .select(explode(map(
        lit("n_docs"), col("n_docs").cast("double"),
        lit("n_tokens"), col("n_tokens").cast("double"),
        lit("mean_doc_chars"),
        col("sum_chars").cast("double") / col("n_docs"),
        lit("pct_en"), col("n_en").cast("double") / col("n_docs"),
        lit("exact_dup_rate"),
        lit(1.0) - col("n_distinct").cast("double") / col("n_docs"),
        lit("empty_rate"), col("n_empty").cast("double") / col("n_docs"),
        lit("mean_quality"),
        col("q_micros").cast("double") / col("n_scored") / lit(1e6))))
      .toDF("metric", "value")
  }

  def sqlDataCard: String =
    s"""WITH base AS MATERIALIZED (
       |  SELECT count(*) AS n_docs,
       |    CAST(sum(len(${TextOps.sqlTokens("text")})) AS BIGINT) AS n_tokens,
       |    CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |    count(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
       |    CAST(count(DISTINCT ${DedupOps.SqlNormalizedContentHash}) AS BIGINT) AS n_distinct,
       |    count(CASE WHEN n_chars = 0 THEN 1 END) AS n_empty
       |  FROM documents),
       |q AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(floor(quality * 1e6) AS BIGINT)) AS BIGINT) AS q_micros,
       |    count(quality) AS n_scored
       |  FROM (${TextOps.sqlQualityScore}))
       |SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM base
       |UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM base
       |UNION ALL SELECT 'mean_doc_chars', CAST(sum_chars AS DOUBLE) / n_docs FROM base
       |UNION ALL SELECT 'pct_en', CAST(n_en AS DOUBLE) / n_docs FROM base
       |UNION ALL SELECT 'exact_dup_rate', 1.0 - CAST(n_distinct AS DOUBLE) / n_docs FROM base
       |UNION ALL SELECT 'empty_rate', CAST(n_empty AS DOUBLE) / n_docs FROM base
       |UNION ALL SELECT 'mean_quality', CAST(q_micros AS DOUBLE) / n_scored / 1e6 FROM q""".stripMargin

  def sqlValidateCorpus: String =
    """SELECT 'pk_not_null' AS rule,
      |  CAST(count(CASE WHEN doc_id IS NULL THEN 1 END) AS BIGINT) AS n_violations
      |FROM documents
      |UNION ALL
      |SELECT 'pk_unique',
      |  CAST(coalesce(sum(c - 1), 0) AS BIGINT) FROM (
      |  SELECT count(*) AS c FROM documents
      |  WHERE doc_id IS NOT NULL GROUP BY doc_id HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'text_not_null',
      |  CAST(count(CASE WHEN text IS NULL THEN 1 END) AS BIGINT) FROM documents
      |UNION ALL
      |SELECT 'lang_not_null',
      |  CAST(count(CASE WHEN lang IS NULL THEN 1 END) AS BIGINT) FROM documents
      |UNION ALL
      |SELECT 'n_chars_consistent',
      |  CAST(count(CASE WHEN n_chars <> length(text) THEN 1 END) AS BIGINT)
      |FROM documents""".stripMargin
}
