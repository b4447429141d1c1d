package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline over the
  * `documents` table: token counting, language ID (stopword-profile
  * heuristic), quality scoring, and rolling-hash document fingerprinting.
  *
  * All operators are single-pass narrow projections — no shuffle, no UDF,
  * everything stays inside whole-stage codegen, so they scale linearly with
  * input splits (a 100 TB corpus is just more parquet row-groups).
  *
  * Each operator has an exact DuckDB-SQL twin (the `sql*` builders) used as
  * the driver's oracle. Parity rules used throughout this file and the other
  * training-data ops:
  *   - token/shingle hashes derive from `md5` (bit-identical hex in Spark
  *     and DuckDB) parsed to a 32-bit int — never engine-native `hash()`;
  *   - every fold is a LEFT fold: Spark `aggregate(xs, zero, f)` ≙ DuckDB
  *     `list_reduce(list_prepend(zero, xs), f)`;
  *   - int division is avoided; `/` promotes to double identically in both.
  */
object TextOps {

  /** Polynomial/rolling-hash modulus (fits (P-1)*131 + 2^32 in int64). */
  val P: Long = 1000000007L

  /** Fingerprint rolling-window width (tokens) and multiplier. */
  val FpWindow = 8
  val FpMult = 131L

  /** "BPE-ish" token pattern: letter runs, digit runs, single punctuation. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Stopword profiles for the language-ID heuristic (priority order). */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  // ------------------------------------------------------------ primitives

  /** Lower-cased whitespace tokens. NULL text ≡ '' (one empty token):
    * without the coalesce, a null-text doc null-propagates through the
    * Spark sketch expressions but DuckDB's fold idiom
    * (`list_reduce(list_prepend(0, NULL), …) = 0`) turns the SAME doc
    * into a real zero-valued hash — the two engines then disagree on
    * every token-derived operator (signatures, fingerprints, spans,
    * chunks) exactly when the corpus contains a null document. One
    * definition point, one rule, both engines: null text behaves like
    * empty text.
    */
  def tokens(text: Column): Column =
    split(trim(lower(coalesce(text, lit("")))), "\\s+")

  /** SQL twin of [[tokens]] over an expression. */
  def sqlTokens(e: String): String =
    s"string_split_regex(trim(lower(coalesce($e, ''))), '\\s+')"

  /** Column name carrying pre-computed [[tokens]] in a shared token table
    * (see [[tokenize]]).
    */
  val ToksCol = "toks"

  /** The shared token table: `documents.* + toks` — tokenize ONCE per
    * corpus and let every token-consuming operator (the n-gram/fluency
    * ladder, decontamination, vocabulary, BPE, packing) read the same
    * materialized column instead of re-paying the scan+split pass. This
    * is the tokenize-once-reuse-many shape a production pipeline runs: a
    * 100 TB curation job writes `tokenize(documents)` as a parquet table
    * (or caches it across a query sweep) and every downstream op consumes
    * it. The same amortization the reference applies to bulk actions —
    * serialize once at AddActions, reuse the bytes at every flush
    * (elasticsearch/bulk/bulk.go:129-137).
    *
    * Results are bit-identical to inline tokenization by construction:
    * [[toksOf]] is the SAME deterministic expression, evaluated earlier.
    */
  def tokenize(docs: DataFrame): DataFrame =
    docs.withColumn(ToksCol, tokens(col("text")))

  /** The token list of a documents frame: the pre-computed [[ToksCol]]
    * when the input IS the shared token table, else inline [[tokens]].
    * Every batch token-consumer resolves its tokens through this one
    * gate, so handing an operator `tokenize(docs)` (cached or parquet)
    * skips re-tokenization with zero semantic drift.
    */
  def toksOf(docs: DataFrame): Column =
    if (docs.columns.contains(ToksCol)) col(ToksCol)
    else tokens(col("text"))

  /** 32-bit token hash: first 8 hex digits of md5, parsed. md5 is
    * byte-identical across engines, unlike murmur-style `hash()`.
    */
  def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** SQL twin of [[tokenHash]] (DuckDB has no hex→int conv; fold digits). */
  def sqlTokenHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(substr(md5($e),1,8),''), " +
      s"c -> CASE WHEN unicode(c) >= 97 THEN unicode(c)-87 ELSE unicode(c)-48 END)), " +
      s"(a,x) -> a*16+x)"

  // ---------------------------------------------------------- token_count

  /** Token counting: whitespace tokens + BPE-ish regex tokens. The BPE
    * count coalesces like [[tokens]] does — a null-text doc counts as
    * empty (0 regex tokens), not NULL, so the two columns carry the same
    * null rule.
    */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(toksOf(docs)).cast("long").as("n_ws_tokens"),
      regexp_count(coalesce(col("text"), lit("")), lit(BpePattern))
        .cast("long").as("n_bpe_tokens")
    )

  def sqlTokenCount: String =
    s"""SELECT doc_id,
       |  CAST(len(${sqlTokens("text")}) AS BIGINT) AS n_ws_tokens,
       |  CAST(len(regexp_extract_all(coalesce(text, ''), '$BpePattern')) AS BIGINT) AS n_bpe_tokens
       |FROM documents""".stripMargin

  // -------------------------------------------------------------- lang_id

  private[ops] def stopScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  /** Language ID: per-language stopword counts, argmax with fixed priority
    * order on ties (en > es > de > fr > zh).
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = toksOf(docs)
    val scored = docs.select(
      col("doc_id") +: StopwordProfiles.map { case (l, ws) =>
        stopScore(toks, ws).as(s"s_$l")
      }: _*
    )
    val langs = StopwordProfiles.map(_._1)
    // first language whose score >= all later languages' scores wins
    val detect = langs.init.zipWithIndex
      .foldRight(lit(langs.last): Column) { case ((l, i), rest) =>
        val ge = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
          .reduce(_ && _)
        when(ge, lit(l)).otherwise(rest)
      }
    scored.withColumn("detected_lang", detect)
  }

  def sqlLangId: String = {
    val langs = StopwordProfiles.map(_._1)
    val scoreCols = StopwordProfiles.map { case (l, ws) =>
      val set = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(toks, t -> list_contains($set, t))) AS BIGINT) AS s_$l"
    }.mkString(",\n    ")
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val ge = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    s"""SELECT *, CASE $cases ELSE '${langs.last}' END AS detected_lang
       |FROM (
       |  SELECT doc_id, $scoreCols
       |  FROM (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents))""".stripMargin
  }

  // -------------------------------------------------- quality_feature_corr

  /** The integer quality features whose pairwise correlations
    * [[qualityFeatureCorr]] publishes, with their in-row expressions —
    * the raw signals under [[qualityScore]]'s weighted blend.
    */
  private def corrFeatures: Seq[(String, Column)] = {
    val toks = tokens(col("text"))
    Seq(
      "n_tokens" -> size(toks).cast("long"),
      "n_stop" -> stopScore(toks, StopwordProfiles.head._2),
      "n_alpha" ->
        regexp_count(coalesce(col("text"), lit("")), lit("[A-Za-z]")).cast("long"),
      "n_chars" -> length(coalesce(col("text"), lit(""))).cast("long"))
  }

  /** Pairwise Pearson correlations between the quality ladder's raw
    * integer features — the feature-engineering data card: two features
    * correlated ≈ 1 are one signal counted twice (the gate's weights
    * then over-count it), and a near-zero pair justifies keeping both.
    * One row per unordered pair (feature order pinned by the
    * [[corrFeatures]] list).
    *
    * The [[graft.ops.PostTrainOps]] reward_length_bias discipline
    * generalized to F×F: every moment (n, Σx, Σx², Σxy) is an EXACT
    * integer sum — map-side-combined, partition-order independent — and
    * the fp correlation formula runs ONCE per pair in a pinned
    * operation order, so both engines produce bit-identical doubles.
    * Zero-variance features emit NULL (corr undefined, loudly). ONE agg
    * over one scan; output is C(F,2) rows.
    *
    * Overflow discipline (review round-10): the formula terms n·Σxy and
    * Σx·Σy leave BIGINT range around 10^9 docs (n·Σxy ≈ n²·10^8), so
    * the moments are widened to DECIMAL(38,0) in Spark / HUGEINT
    * (int128) in DuckDB BEFORE the products — both exact integers with
    * the same ~1.7·10^38 ceiling, so the doubles stay bit-identical.
    * Hard bound, documented: exact up to n·Σxy < 10^38 — i.e. ~10^12
    * docs of ~10^6 chars, four orders past the 100 TB target.
    */
  def qualityFeatureCorr(docs: DataFrame): DataFrame = {
    val fs = corrFeatures
    val pairs = for {
      i <- fs.indices; j <- fs.indices if i < j
    } yield (i, j)
    val aggs =
      count(lit(1)).as("n") +:
        (fs.zipWithIndex.flatMap { case ((_, e), i) => Seq(
          sum(e).as(s"s$i"), sum(e * e).as(s"q$i")) } ++
          pairs.map { case (i, j) =>
            sum(fs(i)._2 * fs(j)._2).as(s"x${i}_$j") })
    def d(c: Column): Column = c.cast("decimal(38,0)")
    def corr(i: Int, j: Int): Column = {
      val num = d(col("n")) * d(col(s"x${i}_$j")) - d(col(s"s$i")) * d(col(s"s$j"))
      val vx = d(col("n")) * d(col(s"q$i")) - d(col(s"s$i")) * d(col(s"s$i"))
      val vy = d(col("n")) * d(col(s"q$j")) - d(col(s"s$j")) * d(col(s"s$j"))
      when(vx === 0 || vy === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") /
          sqrt(vx.cast("double")) / sqrt(vy.cast("double")))
    }
    val entries = pairs.flatMap { case (i, j) =>
      Seq(lit(s"${fs(i)._1}:${fs(j)._1}"), corr(i, j))
    }
    docs.agg(aggs.head, aggs.tail: _*)
      .select(explode(map(entries: _*)))
      .toDF("feature_pair", "corr")
  }

  def sqlQualityFeatureCorr: String = {
    val stopSet = StopwordProfiles.head._2
      .map(w => s"'$w'").mkString("[", ", ", "]")
    val fexpr = Seq(
      "n_tokens" -> "CAST(len(toks) AS BIGINT)",
      "n_stop" ->
        s"CAST(len(list_filter(toks, t -> list_contains($stopSet, t))) AS BIGINT)",
      "n_alpha" ->
        "CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Za-z]')) AS BIGINT)",
      "n_chars" -> "CAST(length(coalesce(text, '')) AS BIGINT)")
    val pairs = for {
      i <- fexpr.indices; j <- fexpr.indices if i < j
    } yield (i, j)
    val moments =
      ("CAST(count(*) AS BIGINT) AS n" +:
        (fexpr.zipWithIndex.flatMap { case ((_, _), i) => Seq(
          s"CAST(sum(f$i) AS BIGINT) AS s$i",
          s"CAST(sum(f$i * f$i) AS BIGINT) AS q$i") } ++
          pairs.map { case (i, j) =>
            s"CAST(sum(f$i * f$j) AS BIGINT) AS x${i}_$j" })).mkString(",\n    ")
    def corr(i: Int, j: Int): String = {
      def d(e: String) = s"CAST($e AS HUGEINT)"
      val num = s"${d("n")} * ${d(s"x${i}_$j")} - ${d(s"s$i")} * ${d(s"s$j")}"
      val vx = s"${d("n")} * ${d(s"q$i")} - ${d(s"s$i")} * ${d(s"s$i")}"
      val vy = s"${d("n")} * ${d(s"q$j")} - ${d(s"s$j")} * ${d(s"s$j")}"
      s"CASE WHEN ($vx) = 0 OR ($vy) = 0 THEN NULL ELSE " +
        s"CAST($num AS DOUBLE) / sqrt(CAST($vx AS DOUBLE)) / sqrt(CAST($vy AS DOUBLE)) END"
    }
    val rows = pairs.map { case (i, j) =>
      s"SELECT '${fexpr(i)._1}:${fexpr(j)._1}' AS feature_pair, ${corr(i, j)} AS corr FROM m"
    }.mkString("\nUNION ALL\n")
    val feats = fexpr.zipWithIndex
      .map { case ((_, e), i) => s"$e AS f$i" }.mkString(",\n    ")
    s"""WITH feats AS (
       |  SELECT
       |    $feats
       |  FROM (SELECT text, ${sqlTokens("text")} AS toks FROM documents)),
       |m AS MATERIALIZED (
       |  SELECT
       |    $moments
       |  FROM feats)
       |$rows""".stripMargin
  }

  // ------------------------------------------------------ lang_consistency

  /** Label-noise monitor: the confusion matrix between the DECLARED
    * `lang` column and the stopword detector ([[langId]]) — (declared,
    * detected, n_docs, agree). Mislabeled language is among the most
    * common metadata defects in assembled corpora (upstream crawls
    * trust HTTP headers); this row says how much of each declared
    * stratum the detector disputes, and feeds the decision of which
    * column the mixture sampler should trust. A MONITOR, not a gate —
    * it reports, the reader decides (on this word-salad fixture the
    * detector is ≈ chance BY DESIGN, documented at [[langId]]; on
    * distinct vocabularies it is exact — see LangIdSpec).
    *
    * Shape: the detector's narrow in-row scoring + ONE (declared,
    * detected) groupBy — a ≤ L² row result at any corpus size.
    */
  def langConsistency(docs: DataFrame): DataFrame =
    langId(docs)
      .select(col("doc_id"), col("detected_lang"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("detected_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("agree", col("lang") === col("detected_lang"))

  def sqlLangConsistency: String =
    "WITH l AS (" + sqlLangId + ")\n" +
      """SELECT d.lang, l.detected_lang, count(*) AS n_docs,
        |  d.lang = l.detected_lang AS agree
        |FROM documents d JOIN l USING (doc_id)
        |GROUP BY d.lang, l.detected_lang""".stripMargin

  // --------------------------------------------------------- lang_id_ngram

  /** Char-n-gram width and per-language profile size for
    * [[langIdNgram]]. Production textcat uses 1–5-grams and K≈300–400;
    * trigrams at K=64 keep every profile populated on the synthetic
    * corpus.
    */
  val LangNgramWidth = 3
  val LangProfileK = 64L

  /** Character-n-gram PROFILE language ID — the published method behind
    * textcat (Cavnar & Trenkle 1994) and the CLD/fastText family's
    * feature space, one rung above [[langId]]'s stopword heuristic
    * (stopwords need per-language word lists and fail on unsegmented
    * scripts; char n-grams need only labeled text and see CJK fine).
    * Profiles: each language's top-[[LangProfileK]] trigram hashes by
    * frequency (count DESC, gram ASC — deterministic). A doc's predicted
    * language is the profile sharing the most DISTINCT trigrams with it
    * (ties break to the lexicographically-first language). Trained on
    * the corpus's own labels here — the operator face a production
    * pipeline points at a labeled seed corpus, then applies downstream;
    * `true_lang`/`correct` make it self-evaluating (the lang-ID
    * confusion audit of a data card).
    *
    * Scale shape: the gram stream materializes once and feeds the
    * profile agg (vocab-sized, map-side combined, then a per-language
    * WindowGroupLimit top-K — langs×K rows) and the per-doc distinct
    * sets; the hit join is against a BROADCAST of the langs×K profile
    * table; prediction is a per-doc window over ≤|langs| rows. Docs
    * sharing no gram with any profile are absent (both engines).
    *
    * Honest fixture note: the driver's synthetic corpus draws TEXT from
    * one shared vocabulary regardless of the `lang` label (the label is
    * an independent attribute), so on that fixture accuracy reads
    * ≈ chance (~0.26 over 5 labels) — which is the CORRECT output: no
    * content-based classifier can beat chance on content that carries no
    * language signal, and the audit column existing to say so is the
    * point. The spec proves the same plan reaches accuracy 1.0 on a
    * corpus whose languages actually have distinct vocabularies.
    */
  def langIdNgram(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftext.ArrayFunctions.{char_gram_hashes, sorted_distinct}
    // grams stay ARRAYS in the shared table: the profile side explodes
    // occurrences, the doc side explodes an IN-ROW sorted_distinct — so
    // the per-doc dedup costs no cross-row distinct shuffle (which would
    // be corpus-positions-sized, the operator's only scale risk)
    val g = DedupOps.materialize(
      DedupOps.fanout(docs).select(col("doc_id"), col("lang"),
        char_gram_hashes(coalesce(col("text"), lit("")),
          LangNgramWidth).as("grams")),
      "langid_grams")
    val occ = g.select(col("lang"), explode(col("grams")).as("g"))
    val wp = Window.partitionBy("lang").orderBy(col("cnt").desc, col("g"))
    val profiles = occ.groupBy("lang", "g").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(wp))
      .filter(col("rk") <= LangProfileK)
      .select(col("lang").as("pred_lang"), col("g"))
    val docG = g.select(col("doc_id"),
      explode(sorted_distinct(col("grams"))).as("g"))
    val wd = Window.partitionBy("doc_id")
      .orderBy(col("n_hits").desc, col("pred_lang"))
    docG.join(broadcast(profiles), Seq("g"))
      .groupBy("doc_id", "pred_lang").agg(count(lit(1)).as("n_hits"))
      .withColumn("rk", row_number().over(wd))
      .filter(col("rk") === 1)
      .join(docs.select(col("doc_id"), col("lang").as("true_lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("n_hits"),
        col("true_lang"), (col("pred_lang") === col("true_lang")).as("correct"))
  }

  def sqlLangIdNgram: String = {
    val gramHash = sqlTokenHash(
      s"substr(coalesce(text, ''), i, $LangNgramWidth)")
    s"""WITH occ AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    unnest(list_transform(
       |      range(1, greatest(length(coalesce(text, '')) - ${LangNgramWidth - 1}, 1) + 1),
       |      i -> $gramHash)) AS g
       |  FROM documents),
       |prof AS (
       |  SELECT lang AS pred_lang, g FROM (
       |    SELECT lang, g,
       |      row_number() OVER (PARTITION BY lang
       |        ORDER BY count(*) DESC, g) AS rk
       |    FROM occ GROUP BY lang, g)
       |  WHERE rk <= $LangProfileK),
       |docg AS (SELECT DISTINCT doc_id, g FROM occ),
       |hits AS (
       |  SELECT doc_id, pred_lang, count(*) AS n_hits
       |  FROM docg JOIN prof USING (g) GROUP BY doc_id, pred_lang),
       |best AS (
       |  SELECT doc_id, pred_lang, n_hits,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY n_hits DESC, pred_lang) AS rk
       |  FROM hits)
       |SELECT b.doc_id, b.pred_lang, b.n_hits, d.lang AS true_lang,
       |  b.pred_lang = d.lang AS correct
       |FROM best b JOIN documents d USING (doc_id)
       |WHERE b.rk = 1""".stripMargin
  }

  // --------------------------------------------------- length_percentiles

  /** Percentile points reported per source (plus max). */
  val PercentileQs: Seq[Int] = Seq(25, 50, 90, 99)

  /** Per-source token-length percentiles — the distribution table of a
    * data card, and the number that sets truncation/packing budgets
    * (p99 decides SeqLen waste; p25 exposes a stub-document source).
    * DISCRETE percentiles by construction: the value at ordered position
    * `ceil(q·n/100)` with a doc_id tiebreak — exact and
    * engine-deterministic, where interpolated percentiles
    * (`percentile`/`quantile_cont`) hang parity on each engine's fp
    * interpolation. `ceil` is stable across engines: position products
    * are exact doubles, and when q·n/100 is integral the quotient is
    * exactly representable.
    *
    * Shape: ONE per-source window (rank + count ride the same shuffle)
    * then a sources-sized agg — [[lengthHistogram]]'s cost with exact
    * order statistics. A pathologically dominant source skews the window
    * partition; the production monitor at that scale swaps in
    * `approx_percentile` (one pass, no window) and keeps this exact form
    * for bounded sources.
    */
  def lengthPercentiles(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = graft.ops.DedupOps.fanout(docs).select(col("source"),
      col("doc_id"), size(toksOf(docs)).cast("long").as("n"))
    val w = Window.partitionBy("source").orderBy(col("n").asc, col("doc_id").asc)
    val ranked = base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("source")))
    val qcols = PercentileQs.map(q =>
      max(when(col("rn") === ceil(col("cnt") * lit(q) / lit(100.0)), col("n")))
        .as(s"p$q"))
    ranked.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        (qcols :+ max(col("n")).as("max_tokens")): _*)
  }

  // ------------------------------------------- length_percentiles_sketch

  /** Retained-sample cap per source for the rank sketch — the accuracy
    * knob: relative rank error concentrates around 1/√cap (≈3% at
    * 1024), state is O(cap · log n) rows per source.
    */
  val SketchCap = 1024

  /** Mergeable DETERMINISTIC rank sketch for the percentile family —
    * retiring [[lengthPercentiles]]' per-source full-sort window (the
    * last per-source-global-sort shape; `approx_percentile` fixes the
    * cost but can't be oracle-checked). The KLL-style compactor made
    * order-independent: instead of buffer-order compaction decisions,
    * every doc draws a LEVEL from its own md5 (trailing-zero count of
    * [[tokenHash]](doc_id) — a hash-coin geometric), and the sketch of a
    * multiset S is the PURE FUNCTION
    *
    *   t(S) = min{ t ≥ 0 : |{x ∈ S : lvl(x) ≥ t}| ≤ cap },
    *   retained(S) = {x ∈ S : lvl(x) ≥ t(S)}, each weighing 2^t(S)
    *
    * — no arrival order anywhere, so Spark and DuckDB reproduce it
    * bit-identically, and merge is LOSSLESS: t(A∪B) ≥ max(t(A), t(B))
    * (surv counts only grow), and for every t ≥ that max the survivor
    * count of A∪B is exact from the retained rows alone — so
    * compact(retained(A) ∪ retained(B)) ≡ sketch(A∪B), the
    * split-invariance the shard/stream story needs (spec'd, and the
    * streaming face rides it).
    *
    * Estimator: rank̂(v) = 2^t · |{retained ≤ v}| (Bernoulli(2^-t)
    * sampling ⇒ std ≈ n/√cap); percentile q = the smallest retained
    * value whose estimated rank reaches the EXACT target ceil(q·n/100)
    * (n rides the same agg exactly), falling back to the retained max
    * when sampling undershoots the tail.
    *
    * Shape: one map-side-combined (source, lvl) count (≤33 rows per
    * source), one ≤cap-row-per-source window — the corpus-wide sort is
    * gone; at 100 TB each executor compacts its partition and the
    * O(cap·sources) survivors merge, exactly the HLL/CMS sketch
    * discipline with exact-integer determinism.
    */
  def lengthPercentilesSketch(docs: DataFrame): DataFrame =
    sketchPercentiles(sketchCompact(sketchLevels(docs), None))

  /** (source, doc_id, n, lvl) — the per-doc hash level, a narrow
    * projection riding the scan.
    */
  private[graft] def sketchLevels(docs: DataFrame): DataFrame =
    sketchLevelsOf(graft.ops.DedupOps.fanout(docs)
      .select(col("source"), col("doc_id"),
        size(toksOf(docs)).cast("long").as("n")))

  /** The level draw over an ARBITRARY (source, doc_id, n) value table —
    * the sketch is value-agnostic (the level comes from the doc_id
    * hash, never the value), so any per-doc metric rides the same
    * machinery: token lengths here, fluency micros for the CCNet
    * bucket cuts ([[PretrainOps.qualityPerplexityBucketsSketch]]).
    */
  private[graft] def sketchLevelsOf(rows: DataFrame): DataFrame = {
    val h = tokenHash(col("doc_id").cast("string"))
    rows
      .withColumn("h", h)
      .withColumn("lvl",
        when(col("h") === 0, lit(32))
          .otherwise(log2(col("h").bitwiseAND(-col("h"))).cast("int")))
      .drop("h")
  }

  /** Compact level rows (plus an optional PRIOR compacted state) to the
    * sketch state (source, doc_id, n, lvl, t, n_docs). The prior's `t`
    * is a floor (t can only grow as data accrues — see
    * [[lengthPercentilesSketch]]'s merge argument) and its `n_docs`
    * accumulates; with `prior` None this IS the from-scratch sketch.
    */
  private[graft] def sketchCompact(lv: DataFrame,
      prior: Option[DataFrame]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE corpus-wide reduction: the per-(source, lvl) batch histogram
    // — n_docs, the survivor curve and t* all derive from these ≤33
    // rows per source (an uncached form paid the level scan once for
    // the histogram and AGAIN for the count)
    val lvCnts = graft.ops.DedupOps.materialize(
      lv.groupBy("source", "lvl").agg(count(lit(1)).as("c")),
      "sketch_lv_cnts")
    val rowsAll = prior match {
      case Some(p) => lv.unionByName(p.select("source", "doc_id", "n", "lvl"))
      case None => lv
    }
    val cnts = prior match {
      case Some(p) =>
        lvCnts.unionByName(
          p.groupBy("source", "lvl").agg(count(lit(1)).as("c")))
          .groupBy("source", "lvl").agg(sum("c").as("c"))
      case None => lvCnts
    }
    val nBatch = lvCnts.groupBy("source").agg(sum("c").as("n_new"))
    val meta = prior match {
      case Some(p) =>
        val pm = p.groupBy("source")
          .agg(max("t").as("t_floor"), max("n_docs").as("n_prior"))
        nBatch.join(pm, Seq("source"), "full_outer")
          .select(col("source"),
            coalesce(col("t_floor"), lit(0)).as("t_floor"),
            (coalesce(col("n_new"), lit(0L)) +
              coalesce(col("n_prior"), lit(0L))).as("n_docs"))
      case None =>
        nBatch.select(col("source"), lit(0).as("t_floor"),
          col("n_new").as("n_docs"))
    }
    val wDesc = Window.partitionBy("source")
      .orderBy(col("lvl").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tstar = cnts
      .withColumn("surv", sum("c").over(wDesc))
      .groupBy("source")
      .agg(coalesce(max(when(col("surv") > SketchCap, col("lvl") + 1)),
        lit(0)).as("t_raw"))
    val perSource = broadcast(meta.join(tstar, "source")
      .select(col("source"),
        greatest(col("t_raw"), col("t_floor")).as("t"), col("n_docs")))
    rowsAll.join(perSource, "source").filter(col("lvl") >= col("t"))
  }

  /** The query face over a compacted state: per source, exact n_docs,
    * the sketch's t and retained count, and the estimated percentile
    * points ([[PercentileQs]] + max).
    */
  private[graft] def sketchPercentiles(state: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy("source")
      .orderBy(col("n").asc, col("doc_id").asc)
    val est = state
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("est_rank",
        col("rk") * pow(lit(2.0), col("t")).cast("long"))
    val qcols = PercentileQs.map(q =>
      coalesce(
        min(when(col("est_rank") >=
          ceil(col("n_docs") * lit(q) / lit(100.0)), col("n"))),
        max(col("n"))).as(s"p$q"))
    est.groupBy("source")
      .agg(max("n_docs").as("n_docs"),
        (max(col("t")).cast("long").as("sketch_t") +:
          count(lit(1)).as("n_retained") +: qcols): _*)
  }

  def sqlLengthPercentilesSketch: String = {
    val h = sqlTokenHash("CAST(doc_id AS VARCHAR)")
    val qcols = PercentileQs.map(q =>
      s"coalesce(CAST(min(CASE WHEN est_rank >= ceil(n_docs * $q / 100.0) " +
        s"THEN n END) AS BIGINT), CAST(max(n) AS BIGINT)) AS p$q")
      .mkString(",\n  ")
    s"""WITH lv AS (
       |  SELECT source, doc_id, n,
       |    CASE WHEN h = 0 THEN 32 ELSE CAST(log2(h & -h) AS INT) END AS lvl
       |  FROM (
       |    SELECT source, doc_id, CAST(len(${sqlTokens("text")}) AS BIGINT) AS n,
       |      $h AS h
       |    FROM documents)),
       |ts AS (
       |  SELECT source,
       |    coalesce(max(CASE WHEN surv > $SketchCap THEN lvl + 1 END), 0) AS t,
       |    CAST(sum(c) AS BIGINT) AS n_docs
       |  FROM (
       |    SELECT source, lvl, c,
       |      sum(c) OVER (PARTITION BY source ORDER BY lvl DESC
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS surv
       |    FROM (SELECT source, lvl, count(*) AS c FROM lv GROUP BY source, lvl))
       |  GROUP BY source),
       |est AS (
       |  SELECT lv.source, lv.n, ts.n_docs, ts.t,
       |    CAST(row_number() OVER (PARTITION BY lv.source ORDER BY lv.n, lv.doc_id)
       |      AS BIGINT) * CAST(power(2.0, ts.t) AS BIGINT) AS est_rank
       |  FROM lv JOIN ts USING (source)
       |  WHERE lv.lvl >= ts.t)
       |SELECT source, max(n_docs) AS n_docs,
       |  CAST(max(t) AS BIGINT) AS sketch_t,
       |  CAST(count(*) AS BIGINT) AS n_retained,
       |  $qcols
       |FROM est GROUP BY source""".stripMargin
  }

  def sqlLengthPercentiles: String = {
    val qcols = PercentileQs.map(q =>
      s"CAST(max(CASE WHEN rn = ceil(cnt * $q / 100.0) THEN n END) AS BIGINT) AS p$q")
      .mkString(",\n  ")
    s"""WITH ranked AS (
       |  SELECT source, n,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY n, doc_id)
       |      AS BIGINT) AS rn,
       |    count(*) OVER (PARTITION BY source) AS cnt
       |  FROM (
       |    SELECT source, doc_id, CAST(len(${sqlTokens("text")}) AS BIGINT) AS n
       |    FROM documents))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  $qcols,
       |  CAST(max(n) AS BIGINT) AS max_tokens
       |FROM ranked GROUP BY source""".stripMargin
  }

  // ------------------------------------------------------------- lang_mix

  /** Window width (tokens) for per-window language voting. */
  val LangMixWindow = 20

  /** Language-MIXTURE detection — the QC gate [[langId]]'s single label
    * cannot express: a document that switches language mid-stream (board
    * scrape + quoted translation, template + injected content) gets one
    * majority label from langId and silently pollutes a monolingual
    * corpus. Votes the langId heuristic per [[LangMixWindow]]-token
    * window, then per doc: window count, distinct window languages, the
    * majority language's share (exact micros — windows are integers, no
    * fp until one final floor), and the `mixed` flag a cleaning pipeline
    * filters or reroutes on.
    *
    * Shape: windowing is an in-row explode (no shuffle), the vote is ONE
    * doc-keyed agg with per-language conditional counts (languages are a
    * fixed handful — wide agg beats a (doc, lang) double shuffle).
    * Null, empty, or whitespace-only text produces no windows and is
    * absent from the output — checked on the TEXT, because tokens('')
    * is [''] under the null ≡ empty rule and a size guard alone would
    * hand empty docs a confident single-window 'en' vote.
    */
  def langMix(docs: DataFrame): DataFrame = {
    val langs = StopwordProfiles.map(_._1)
    val w = LangMixWindow
    val toks = toksOf(docs)
    val nwin = ceil(size(toks).cast("double") / lit(w.toDouble)).cast("int")
    // tokens('') is [''] (the null ≡ empty rule), so size(toks) is never
    // 0 — emptiness must be checked on the TEXT, or an empty doc would
    // get one empty window and a confident all-zero-scores 'en' vote
    val windows = when(length(trim(coalesce(col("text"), lit("")))) > 0,
      transform(sequence(lit(0), nwin - 1), i => slice(toks, i * w + 1, lit(w))))
    val scored = graft.ops.DedupOps.fanout(docs)
      .select(col("doc_id"), explode(windows).as("wtoks"))
      .select(
        col("doc_id") +: StopwordProfiles.map { case (l, ws) =>
          stopScore(col("wtoks"), ws).as(s"s_$l")
        }: _*)
    // same first-wins argmax fold as langId
    val detect = langs.init.zipWithIndex
      .foldRight(lit(langs.last): Column) { case ((l, i), rest) =>
        val ge = langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
          .reduce(_ && _)
        when(ge, lit(l)).otherwise(rest)
      }
    val counts = langs.map(l =>
      sum(when(col("wlang") === l, 1L).otherwise(0L)).as(s"c_$l"))
    val agged = scored.select(col("doc_id"), detect.as("wlang"))
      .groupBy("doc_id").agg(counts.head, counts.tail: _*)
      .withColumn("n_windows", langs.map(l => col(s"c_$l")).reduce(_ + _))
    agged
      .withColumn("n_langs",
        langs.map(l => when(col(s"c_$l") > 0, 1L).otherwise(0L)).reduce(_ + _))
      .withColumn("majority_share_micro",
        floor(greatest(langs.map(l => col(s"c_$l")): _*) * lit(1000000L)
          / col("n_windows")).cast("long"))
      .withColumn("mixed", col("n_langs") > 1L)
      .select("doc_id", "n_windows", "n_langs", "majority_share_micro", "mixed")
  }

  def sqlLangMix: String = {
    val langs = StopwordProfiles.map(_._1)
    val w = LangMixWindow
    val scoreCols = StopwordProfiles.map { case (l, ws) =>
      val set = ws.map(x => s"'$x'").mkString("[", ", ", "]")
      s"CAST(len(list_filter(wtoks, t -> list_contains($set, t))) AS BIGINT) AS s_$l"
    }.mkString(",\n    ")
    val cases = langs.init.zipWithIndex.map { case (l, i) =>
      val ge = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $ge THEN '$l'"
    }.mkString(" ")
    val counts = langs.map(l =>
      s"CAST(sum(CASE WHEN wlang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS c_$l")
      .mkString(",\n    ")
    val total = langs.map(l => s"c_$l").mkString(" + ")
    val nlangs = langs.map(l => s"CASE WHEN c_$l > 0 THEN 1 ELSE 0 END")
      .mkString(" + ")
    val majority = s"greatest(${langs.map(l => s"c_$l").mkString(", ")})"
    s"""WITH win AS (
       |  SELECT doc_id,
       |    list_slice(toks, i * $w + 1, (i + 1) * $w) AS wtoks
       |  FROM (
       |    SELECT doc_id, toks,
       |      unnest(range(CAST(ceil(len(toks) / $w.0) AS INT))) AS i
       |    FROM (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents
       |          WHERE len(trim(coalesce(text, ''))) > 0))),
       |voted AS (
       |  SELECT doc_id, CASE $cases ELSE '${langs.last}' END AS wlang
       |  FROM (SELECT doc_id, $scoreCols FROM win)),
       |agged AS (
       |  SELECT doc_id, $counts FROM voted GROUP BY doc_id)
       |SELECT doc_id, $total AS n_windows,
       |  CAST($nlangs AS BIGINT) AS n_langs,
       |  CAST(floor(CAST($majority * 1000000 AS DOUBLE) / ($total))
       |    AS BIGINT) AS majority_share_micro,
       |  ($nlangs) > 1 AS mixed
       |FROM agged""".stripMargin
  }

  // -------------------------------------------------------- quality_score

  /** (n_tokens, quality) as bare Columns over a text column — the same
    * expressions [[qualityScore]] materializes, exposed so a composite
    * pipeline (CorpusOps.cleanCorpus) can ride them in ONE projection
    * instead of joining the gate frame back on doc_id.
    */
  private[graft] def qualityCols(text: Column): (Column, Column) =
    qualityColsWith(text, tokens(text))

  /** [[qualityCols]] with the token array supplied — callers holding the
    * shared token table ([[toksOf]]) skip re-splitting the corpus text
    * (identical result: `toks` IS `tokens(text)` by the table contract).
    */
  private[graft] def qualityColsWith(text: Column, toks: Column): (Column, Column) = {
    val nTok = size(toks).cast("long")
    val nStop = stopScore(toks, StopwordProfiles.head._2)
    val nAlpha = regexp_count(text, lit("[A-Za-z]")).cast("long")
    val nChars = length(text).cast("long")
    // empty text ⇒ NULL, not NaN: 0.0/0.0 is NaN, and Spark orders NaN
    // ABOVE every number, so `NaN >= threshold` would PASS the quality
    // gate while the oracle's CASE WHEN n_chars = 0 THEN NULL drops it
    val quality = when(nChars === 0, lit(null).cast("double")).otherwise(
      lit(0.4) * least(nTok / lit(64.0), lit(1.0)) +
        lit(0.3) * least((nStop.cast("double") / nTok) * lit(4.0), lit(1.0)) +
        lit(0.3) * (nAlpha.cast("double") / nChars))
    (nTok, quality)
  }

  /** The argmax-with-priority language pick of [[langId]] as one Column
    * (per-language stopword scores inlined; Catalyst's collapsed langId
    * projection evaluates the same shape).
    */
  private[graft] def detectLang(text: Column): Column =
    detectLangWith(tokens(text))

  /** [[detectLang]] over a supplied token array (the [[qualityColsWith]]
    * discipline).
    */
  private[graft] def detectLangWith(toks: Column): Column = {
    val scores = StopwordProfiles.map { case (l, ws) => l -> stopScore(toks, ws) }.toMap
    val langs = StopwordProfiles.map(_._1)
    langs.init.zipWithIndex
      .foldRight(lit(langs.last): Column) { case ((l, i), rest) =>
        val ge = langs.drop(i + 1).map(o => scores(l) >= scores(o)).reduce(_ && _)
        when(ge, lit(l)).otherwise(rest)
      }
  }

  /** Quality scoring: length/stopword/alpha ratios blended into [0,1].
    * score = 0.4·min(n_tokens/64, 1) + 0.3·min(4·stop_ratio, 1) + 0.3·alpha_ratio
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = toksOf(docs)
    val nTok = size(toks).cast("long")
    val stopWords = StopwordProfiles.head._2
    val nStop = stopScore(toks, stopWords)
    val sumLen = aggregate(
      transform(toks, t => length(t).cast("long")), lit(0L), (a, x) => a + x)
    val nAlpha = regexp_count(col("text"), lit("[A-Za-z]")).cast("long")
    docs.select(col("doc_id"), nTok.as("n_tokens"), nStop.as("n_stop"),
        sumLen.as("sum_tok_len"), nAlpha.as("n_alpha"), length(col("text")).cast("long").as("n_chars_m"))
      .select(
        col("doc_id"), col("n_tokens"),
        (col("sum_tok_len").cast("double") / col("n_tokens")).as("mean_token_len"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        // empty text ⇒ NULL like the oracle's CASE, not NaN (NaN orders
        // ABOVE every number in Spark, so it would pass >= gates)
        when(col("n_chars_m") === 0, lit(null).cast("double"))
          .otherwise(col("n_alpha").cast("double") / col("n_chars_m"))
          .as("alpha_ratio")
      )
      .withColumn("quality",
        when(col("alpha_ratio").isNull, lit(null).cast("double")).otherwise(
          lit(0.4) * least(col("n_tokens") / lit(64.0), lit(1.0)) +
            lit(0.3) * least(col("stop_ratio") * lit(4.0), lit(1.0)) +
            lit(0.3) * col("alpha_ratio")))
  }

  def sqlQualityScore: String = {
    val set = StopwordProfiles.head._2.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""SELECT doc_id, n_tokens,
       |  CAST(sum_tok_len AS DOUBLE) / n_tokens AS mean_token_len,
       |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
       |  CASE WHEN n_chars_m = 0 THEN NULL ELSE CAST(n_alpha AS DOUBLE) / n_chars_m END AS alpha_ratio,
       |  CASE WHEN n_chars_m = 0 THEN NULL ELSE
       |    0.4 * least(n_tokens / 64.0, 1.0) +
       |    0.3 * least((CAST(n_stop AS DOUBLE) / n_tokens) * 4.0, 1.0) +
       |    0.3 * (CAST(n_alpha AS DOUBLE) / n_chars_m)
       |  END AS quality
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_filter(toks, t -> list_contains($set, t))) AS BIGINT) AS n_stop,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a,x) -> a+x) AS sum_tok_len,
       |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_alpha,
       |    CAST(length(text) AS BIGINT) AS n_chars_m
       |  FROM (SELECT doc_id, text, ${sqlTokens("text")} AS toks FROM documents))""".stripMargin
  }

  // ------------------------------------------------ quality_gopher_gates

  /** The Gopher stop-word rule's word list (Rae et al. 2021, A.1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinWords = 50L
  val GopherMaxWords = 100000L

  /** The Gopher quality rule set (Rae et al. 2021, appendix A.1.1),
    * doc-level subset, as ALL-INTEGER gates: every published threshold
    * is rational, so each rule compares exact longs (mean word length ∈
    * [3, 10] ⟺ 3n ≤ Σlen ≤ 10n; EACH symbol's ratio ≤ 0.1 ⟺ 10·count ≤
    * words; ≥ 80% alpha words ⟺ 5·alpha ≥ 4·words) — no fp anywhere,
    * engine hash parity for free. Rules: word count ∈
    * [[[GopherMinWords]], [[GopherMaxWords]]]; mean word length ∈
    * [3, 10] chars; hash-to-word ratio ≤ 0.1 AND ellipsis-to-word ratio
    * ≤ 0.1 — gated PER SYMBOL as published (a doc at 0.06 on each must
    * pass), ellipsis matching both ASCII '...' and Unicode '…'; ≥ 80%
    * of words contain a letter; ≥ 2 distinct [[GopherStopwords]]
    * present. (The line-based bullet/ellipsis-ending rules need
    * document structure the single-line synthetic corpus doesn't carry
    * — scoped out by name.) One narrow projection, zero shuffle; pairs
    * with [[qualityScore]] (a blended score) as the published HARD gate
    * set.
    */
  /** The six Gopher gate statistics as named Columns over a text
    * expression — the single definition point shared by
    * [[qualityGopherGates]] (the audit face) and [[gopherPass]] (the
    * label used by [[qualityLinearTrainStep]]), so the report and the
    * classifier's training labels cannot disagree.
    */
  private[ops] def gopherStatCols(text: Column): Map[String, Column] = {
    val txt = coalesce(text, lit(""))
    val toks = tokens(text)
    Map(
      "n_words" -> size(toks).cast("long"),
      "sum_word_chars" ->
        aggregate(toks, lit(0L), (a, x) => a + length(x).cast("long")),
      "n_alpha_words" -> size(filter(toks, x => x.rlike("[a-z]"))).cast("long"),
      "n_hash" -> regexp_count(txt, lit("#")).cast("long"),
      "n_ellipsis" -> regexp_count(txt, lit("\\.\\.\\.|…")).cast("long"),
      "stop_hits" -> GopherStopwords.map(w =>
        when(array_contains(toks, w), lit(1L)).otherwise(lit(0L))).reduce(_ + _))
  }

  /** The five gates + their conjunction, as (name, Column) pairs over a
    * stat-column lookup — shared between the audit DataFrame (stats are
    * materialized named columns) and the in-row label (stats are inline
    * expressions; codegen subexpression elimination dedups them).
    */
  private[ops] def gopherGateCols(s: String => Column): Seq[(String, Column)] = {
    val gCount = s("n_words") >= GopherMinWords && s("n_words") <= GopherMaxWords
    val gWordlen = lit(3L) * s("n_words") <= s("sum_word_chars") &&
      s("sum_word_chars") <= lit(10L) * s("n_words")
    val gSymbol = lit(10L) * s("n_hash") <= s("n_words") &&
      lit(10L) * s("n_ellipsis") <= s("n_words")
    val gAlpha = lit(5L) * s("n_alpha_words") >= lit(4L) * s("n_words")
    val gStop = s("stop_hits") >= 2L
    Seq("g_count" -> gCount, "g_wordlen" -> gWordlen, "g_symbol" -> gSymbol,
      "g_alpha" -> gAlpha, "g_stop" -> gStop,
      "pass" -> (gCount && gWordlen && gSymbol && gAlpha && gStop))
  }

  private val GopherStatOrder = Seq("n_words", "sum_word_chars",
    "n_alpha_words", "n_hash", "n_ellipsis", "stop_hits")

  /** The full gate conjunction as one in-row Column over `text`. */
  private[ops] def gopherPass(text: Column): Column = {
    val stats = gopherStatCols(text)
    gopherGateCols(stats).collectFirst { case ("pass", c) => c }.get
  }

  def qualityGopherGates(docs: DataFrame): DataFrame = {
    val stats = gopherStatCols(col("text"))
    docs
      .select(col("doc_id") +: GopherStatOrder.map(n => stats(n).as(n)): _*)
      .select(col("doc_id") +: GopherStatOrder.map(col) ++:
        gopherGateCols(col).map { case (n, c) => c.as(n) }: _*)
  }

  def sqlQualityGopherGates: String = {
    val stopCases = GopherStopwords.map(w =>
      s"(CASE WHEN list_contains(toks, '$w') THEN 1 ELSE 0 END)").mkString(" + ")
    s"""SELECT doc_id, n_words, sum_word_chars, n_alpha_words, n_hash, n_ellipsis, stop_hits,
       |  n_words >= $GopherMinWords AND n_words <= $GopherMaxWords AS g_count,
       |  3 * n_words <= sum_word_chars AND sum_word_chars <= 10 * n_words AS g_wordlen,
       |  10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words AS g_symbol,
       |  5 * n_alpha_words >= 4 * n_words AS g_alpha,
       |  stop_hits >= 2 AS g_stop,
       |  n_words >= $GopherMinWords AND n_words <= $GopherMaxWords
       |    AND 3 * n_words <= sum_word_chars AND sum_word_chars <= 10 * n_words
       |    AND 10 * n_hash <= n_words AND 10 * n_ellipsis <= n_words
       |    AND 5 * n_alpha_words >= 4 * n_words
       |    AND stop_hits >= 2 AS pass
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a,x) -> a+x)
       |      AS sum_word_chars,
       |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
       |      AS n_alpha_words,
       |    CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS n_hash,
       |    CAST(len(regexp_extract_all(text, '\\.\\.\\.|…')) AS BIGINT) AS n_ellipsis,
       |    CAST($stopCases AS BIGINT) AS stop_hits
       |  FROM (SELECT doc_id, coalesce(text, '') AS text,
       |        ${sqlTokens("text")} AS toks FROM documents))""".stripMargin
  }

  // ------------------------------------------------------- text_normalize

  /** Unicode NFC normalization — the hygiene pass ahead of every
    * hash-based operator in this library: "é" as precomposed U+00E9 and
    * as e+COMBINING ACUTE are byte-different, so without this pass the
    * same visible text fingerprints, dedups, shingles, and tokenizes as
    * DIFFERENT content (md5 hashes see bytes). One codegen'd kernel
    * expression ([[graft.sparkext]] `nfc_normalize`, UAX #15 via
    * java.text.Normalizer with an already-normalized fast path that
    * returns the input buffer untouched); DuckDB's `nfc_normalize` twins
    * it — both engines implement the same Unicode algorithm. Zero
    * shuffles; `was_nfc` reports how much of the corpus actually needed
    * work (real corpora: almost none — the fast path is the operator).
    */
  def textNormalize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
        org.apache.spark.sql.graftext.ArrayFunctions
          .nfc_normalize(col("text")).as("normalized"))
      .select(col("doc_id"), col("normalized"),
        (col("text") === col("normalized")).as("was_nfc"),
        length(col("normalized")).cast("long").as("n_chars"))

  def sqlTextNormalize: String =
    s"""SELECT doc_id, normalized, text = normalized AS was_nfc,
       |  CAST(length(normalized) AS BIGINT) AS n_chars
       |FROM (SELECT doc_id, text, nfc_normalize(text) AS normalized
       |      FROM documents)""".stripMargin

  // ----------------------------------------------------------- text_scrub

  /** PII/URL scrubbing — the standard pre-training redaction pass:
    * URLs → `<URL>`, emails → `<EMAIL>`, long digit runs → `<NUM>`,
    * whitespace collapsed. Pure regexp_replace chain (codegen'd, one
    * pass); patterns are RE2/Java-compatible subsets so the oracle runs
    * them verbatim.
    */
  val UrlPattern = "https?://[^\\s]+"
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val NumPattern = "[0-9]{6,}"

  def textScrub(docs: DataFrame): DataFrame = {
    val scrubbed =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), UrlPattern, "<URL>"),
            EmailPattern, "<EMAIL>"),
          NumPattern, "<NUM>"),
        "\\s+", " ")
    docs.select(
      col("doc_id"),
      trim(scrubbed).as("scrubbed"),
      (length(col("text")) - length(trim(scrubbed))).cast("long").as("n_removed_chars"))
  }

  def sqlTextScrub: String =
    s"""SELECT doc_id, trim(scrubbed) AS scrubbed,
       |  CAST(length(text) - length(trim(scrubbed)) AS BIGINT) AS n_removed_chars
       |FROM (
       |  SELECT doc_id, text,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
       |      '$UrlPattern', '<URL>', 'g'),
       |      '$EmailPattern', '<EMAIL>', 'g'),
       |      '$NumPattern', '<NUM>', 'g'),
       |      '\\s+', ' ', 'g') AS scrubbed
       |  FROM documents)""".stripMargin

  // ----------------------------------------------------- html_extract

  /** Link-density gate for [[htmlExtract]]: chrome-dominated pages (nav
    * + promo anchors outweighing body text) land above it, long body
    * text far below — the jusText/trafilatura-family block heuristic
    * reduced to its measurable core.
    */
  val LinkDensityMax = 0.1

  /** HTML text extraction — the first operator every web-crawl pipeline
    * runs (CommonCrawl WARC → text): strip tags, pull the `<title>`,
    * measure link density (anchor-text chars ÷ extracted chars), gate
    * chrome-dominated pages. The container ships no real crawl, so the
    * HTML is SYNTHESIZED in-row from (doc_id, text) — the multimodal
    * declared-fake discipline ([[graft.ops.BinaryOps]]): a deterministic
    * head/nav/body/promo wrapper both engines rebuild bit-identically,
    * making the EXTRACTION path (the real deliverable: regex kernels,
    * density algebra, gate) oracle-checkable end-to-end. Every step is a
    * narrow codegen'd projection — zero shuffles, the whole operator
    * rides the scan.
    */
  def htmlExtract(docs: DataFrame): DataFrame = {
    val title3 = concat_ws(" ", slice(toksOf(docs), 1, 3))
    val html = concat(
      lit("<html><head><title>"), title3, lit("</title></head><body>"),
      lit("<nav><a href=\"/\">home</a> <a href=\"/about\">about us</a></nav>"),
      // null ≡ empty (the tokens() house rule): a null text must not
      // null-propagate through the whole wrapper
      lit("<p>"), coalesce(col("text"), lit("")), lit("</p>"),
      when(col("doc_id") % 3 === 0,
        lit("<div class=\"promo\"><a href=\"/buy\">click here for great deals and top offers</a></div>"))
        .otherwise(lit("")),
      lit("</body></html>"))
    docs.select(col("doc_id"), html.as("html"))
      .select(
        col("doc_id"),
        regexp_extract(col("html"), "<title>([^<]*)</title>", 1).as("title"),
        trim(regexp_replace(regexp_replace(col("html"), "<[^>]*>", " "),
          "\\s+", " ")).as("extracted"),
        length(concat_ws("",
          regexp_extract_all(col("html"), lit("<a[^>]*>([^<]*)</a>"), lit(1))))
          .cast("long").as("n_anchor_chars"))
      // empty-extraction guard (review round-10): Spark (non-ANSI)
      // double-divides to NULL where DuckDB gives IEEE Infinity — pin
      // NULL explicitly in BOTH faces so the twins agree even on the
      // real-crawl inputs the synthesized wrapper can't produce
      .withColumn("link_density",
        when(length(col("extracted")) === 0, lit(null).cast("double"))
          .otherwise(col("n_anchor_chars").cast("double") /
            length(col("extracted")).cast("double")))
      .withColumn("is_chrome", col("link_density") > LinkDensityMax)
  }

  def sqlHtmlExtract: String =
    s"""SELECT doc_id, title, extracted, n_anchor_chars,
       |  CAST(n_anchor_chars AS DOUBLE) / CAST(nullif(length(extracted), 0) AS DOUBLE)
       |    AS link_density,
       |  CAST(n_anchor_chars AS DOUBLE) / CAST(nullif(length(extracted), 0) AS DOUBLE)
       |    > $LinkDensityMax AS is_chrome
       |FROM (
       |  SELECT doc_id,
       |    regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
       |    trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
       |      '\\s+', ' ', 'g')) AS extracted,
       |    CAST(length(array_to_string(
       |      regexp_extract_all(html, '<a[^>]*>([^<]*)</a>', 1), '')) AS BIGINT)
       |      AS n_anchor_chars
       |  FROM (
       |    SELECT doc_id,
       |      '<html><head><title>'
       |      || array_to_string(list_slice(${sqlTokens("text")}, 1, 3), ' ')
       |      || '</title></head><body>'
       |      || '<nav><a href="/">home</a> <a href="/about">about us</a></nav>'
       |      || '<p>' || coalesce(text, '') || '</p>'
       |      || CASE WHEN doc_id % 3 = 0 THEN
       |           '<div class="promo"><a href="/buy">click here for great deals and top offers</a></div>'
       |         ELSE '' END
       |      || '</body></html>' AS html
       |    FROM documents))""".stripMargin

  // -------------------------------------- url_normalize / dedup_url

  /** The synthesized raw URL of a document — the [[htmlExtract]]
    * declared-fake discipline again (the corpus ships no URL column):
    * four deterministic noise variants by doc_id%4 — clean, uppercased
    * host + default port + trailing slash, utm tracking params, fragment
    * — all of which MUST canonicalize to the same URL. doc_id%8 as the
    * item id makes same-source docs collide on the canonical form, so
    * the dedup stage has real clusters to find.
    */
  private def rawUrl: Column = {
    val item = pmod(col("doc_id"), lit(8)).cast("string")
    val clean = concat(lit("https://"), col("source"),
      lit(".example.com/item/"), item)
    when(col("doc_id") % 4 === 1,
        concat(lit("https://"), upper(col("source")), lit(".EXAMPLE.COM:443/item/"),
          item, lit("/")))
      .when(col("doc_id") % 4 === 2,
        concat(clean, lit("?utm_source=feed&utm_campaign=c"), item))
      .when(col("doc_id") % 4 === 3,
        concat(clean, lit("#sec-"), col("doc_id").cast("string")))
      .otherwise(clean)
  }

  // single-line on purpose: this fragment interpolates into outer
  // stripMargin SQL, where a continuation line starting with `||` would
  // have its first pipe eaten as a margin marker
  private def sqlRawUrl: String =
    "CASE CAST(doc_id % 4 AS INTEGER) " +
      "WHEN 1 THEN 'https://' || upper(source) || '.EXAMPLE.COM:443/item/' " +
      "|| CAST(doc_id % 8 AS VARCHAR) || '/' " +
      "WHEN 2 THEN 'https://' || source || '.example.com/item/' " +
      "|| CAST(doc_id % 8 AS VARCHAR) " +
      "|| '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 8 AS VARCHAR) " +
      "WHEN 3 THEN 'https://' || source || '.example.com/item/' " +
      "|| CAST(doc_id % 8 AS VARCHAR) || '#sec-' || CAST(doc_id AS VARCHAR) " +
      "ELSE 'https://' || source || '.example.com/item/' " +
      "|| CAST(doc_id % 8 AS VARCHAR) END"

  /** URL canonicalization kernel — the crawl-frontier/dedup-key rule set
    * (fragment is client-side; utm_* is tracking noise; scheme+host are
    * case-insensitive per RFC 3986 while the PATH is not; :443/:80 are
    * scheme defaults; a trailing slash is the same resource for the
    * document pipeline's purposes). Order matters and is pinned:
    * fragment → utm → dangling separator → authority lowercase → default
    * port → trailing slash. A pure regexp_replace chain: codegen'd, no
    * backreferences (Spark `$n` vs RE2 `\\n` replacement syntax would
    * make the twins diverge silently).
    */
  private[graft] def canonUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // utm params strip at PARAMETER boundaries only (review round-9: the
    // unanchored form ate the tail of 'xutm_source=…' and utm-like path
    // text) — three backref-free steps: '&utm…' mid-list, '?utm…&' at
    // the head of a longer list, '?utm…$' as the only param. (?i)
    // (review round-10): UTM_SOURCE= / utm_Campaign= spellings appear in
    // the wild and must fold into the same frontier key
    val noUtm = regexp_replace(regexp_replace(regexp_replace(noFrag,
      "(?i)&utm_[a-z]+=[^&]*", ""),
      "(?i)\\?utm_[a-z]+=[^&]*&", "?"),
      "(?i)\\?utm_[a-z]+=[^&]*$", "")
    val noDangle = regexp_replace(noUtm, "[?&]$", "")
    // authority = scheme://host[:port], STOPPING at /, ? or # (review:
    // '[^/]*' swallowed the query string of a path-less URL and matched
    // only lowercase schemes); (?i) covers 'HTTPS://' spellings, and the
    // default port strips at the END of the isolated authority only —
    // never inside a path segment. Simplification (documented): both
    // :80 and :443 strip for either scheme.
    val authPat = "(?i)^(https?://[^/?#]*)"
    val auth = regexp_replace(
      lower(regexp_extract(noDangle, authPat, 1)), ":(443|80)$", "")
    val lowAuth = concat(auth, regexp_replace(noDangle, authPat, ""))
    regexp_replace(lowAuth, "/$", "")
  }

  // single-line for the same nested-stripMargin reason as sqlRawUrl;
  // every regex matches the Spark twin above step for step (all 'g'
  // flags explicit — a missing one silently de-globals DuckDB)
  private[graft] def sqlCanonUrl(e: String): String = {
    val stripped = "regexp_replace(regexp_replace(regexp_replace(" +
      s"regexp_replace(regexp_replace($e, " +
      "'#.*$', ''), '(?i)&utm_[a-z]+=[^&]*', '', 'g'), " +
      "'(?i)\\?utm_[a-z]+=[^&]*&', '?', 'g'), " +
      "'(?i)\\?utm_[a-z]+=[^&]*$', ''), '[?&]$', '')"
    s"regexp_replace(regexp_replace(" +
      s"lower(regexp_extract($stripped, '(?i)^(https?://[^/?#]*)', 1)), " +
      "':(443|80)$', '') " +
      s"|| regexp_replace($stripped, '(?i)^https?://[^/?#]*', ''), " +
      "'/$', '')"
  }

  /** Per-doc URL canonicalization: (doc_id, url_raw, url_canon,
    * was_canonical). Narrow codegen'd projection, zero shuffle.
    */
  def urlNormalize(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), rawUrl.as("url_raw"))
      .withColumn("url_canon", canonUrl(col("url_raw")))
      .withColumn("was_canonical", col("url_raw") === col("url_canon"))

  def sqlUrlNormalize: String =
    s"""SELECT doc_id, url_raw, ${sqlCanonUrl("url_raw")} AS url_canon,
       |  url_raw = ${sqlCanonUrl("url_raw")} AS was_canonical
       |FROM (SELECT doc_id, $sqlRawUrl AS url_raw FROM documents)""".stripMargin

  /** URL-level dedup over the CANONICAL form — the crawl-frontier "have
    * I fetched this page" key: cluster by url_canon, survivor = min
    * doc_id; `n_variants` counts distinct RAW spellings folded into the
    * cluster (> 1 ⇒ the canonicalization did real work — tracking-param
    * and case noise, not just re-crawls). Same minimal shape as
    * [[graft.ops.DedupOps.dedupExact]]: one hash-keyed map-side agg.
    */
  def dedupUrl(docs: DataFrame): DataFrame =
    urlNormalize(docs)
      .groupBy("url_canon")
      .agg(min("doc_id").as("rep_doc_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("url_raw")).as("n_variants"))

  def sqlDedupUrl: String =
    s"""SELECT url_canon, min(doc_id) AS rep_doc_id, count(*) AS n_copies,
       |  CAST(count(DISTINCT url_raw) AS BIGINT) AS n_variants
       |FROM (
       |  SELECT doc_id, url_raw, ${sqlCanonUrl("url_raw")} AS url_canon
       |  FROM (SELECT doc_id, $sqlRawUrl AS url_raw FROM documents))
       |GROUP BY url_canon""".stripMargin

  // ------------------------------------------- scrub_boilerplate_lines

  /** A line appearing in at least this many DISTINCT documents is
    * boilerplate (nav bars, cookie banners, license headers — the
    * C4/RefinedWeb line-level correction).
    */
  val LineDupDocFreq = 3

  /** Boilerplate-line removal (C4 §2.2 / RefinedWeb line-wise
    * corrections): drop every line whose document frequency is ≥
    * [[LineDupDocFreq]], rebuild each document from its surviving lines
    * in original order, report `n_lines`/`n_dropped`. Docs whose every
    * line is boilerplate stay in the output with empty text — the
    * downstream length gate drops them EXPLICITLY (filter_reasons
    * observability), not silently here.
    *
    * Fixture honesty: the synthetic corpus has no newlines, so on it
    * each doc is ONE line and the oracle key degenerates to "drop
    * full texts duplicated across ≥ K docs" — still the df-threshold
    * semantics end-to-end; the multiline behavior (partial scrub,
    * order preservation, within-doc repeats counting once toward df)
    * is pinned on a hand-built fixture in the spec.
    *
    * Shape: one narrow line explode; df counts via ONE hash-keyed agg
    * over IN-ROW-deduped per-doc lines (a doc repeating its own line
    * counts once — and the in-row distinct removes the per-doc
    * duplicate shuffle rows); the boilerplate hit set joins back on
    * the line hash (AQE broadcasts it when small — it usually is: few
    * lines clear a corpus-wide df threshold); one doc-keyed rebuild
    * agg. Nothing is ever keyed by raw line text — always the md5.
    */
  def scrubBoilerplateLines(docs: DataFrame): DataFrame =
    scrubWithBoilerplate(docs, lineDfCounts(docs)
      .filter(col("df") >= LineDupDocFreq)
      .select(col("h"), lit(true).as("bp")))

  /** Per-line document-frequency contributions of `docs` — in-row
    * distinct per doc first (a doc repeating its own line counts once).
    * Shared by the batch op and [[graft.stream.ScrubStream]]'s delta
    * writer; counts merge by SUM across batches/shards.
    */
  private[graft] def lineDfCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(array_distinct(split(col("text"), "\n"))).as("line"))
      .groupBy(md5(col("line")).as("h"))
      .agg(count(lit(1)).as("df"))

  /** Drop lines in the `boilerplate` (h, bp) hit set, rebuild docs in
    * line order — the ACTION shared by the batch op (df from the same
    * corpus) and the streaming frozen-index face.
    */
  private[graft] def scrubWithBoilerplate(docs: DataFrame,
      boilerplate: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("idx", "line")))
      .withColumn("h", md5(col("line")))
      .join(boilerplate, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(col("bp")).as("n_dropped"),
        array_join(transform(
          sort_array(collect_list(
            when(col("bp").isNull, struct(col("idx"), col("line"))))),
          s => s.getField("line")), "\n").as("scrubbed"))
      .select(col("doc_id"), col("n_lines"), col("n_dropped"), col("scrubbed"))

  def sqlScrubBoilerplateLines: String =
    s"""WITH split_docs AS (
       |  SELECT doc_id, string_split(text, chr(10)) AS lst FROM documents),
       |lines AS (
       |  SELECT doc_id, idx, lst[idx] AS line, md5(lst[idx]) AS h
       |  FROM (SELECT doc_id, lst,
       |          unnest(range(1, len(lst) + 1)) AS idx
       |        FROM split_docs)),
       |bp AS (
       |  SELECT h FROM (
       |    SELECT md5(line) AS h, count(*) AS df
       |    FROM (SELECT DISTINCT doc_id, unnest(lst) AS line FROM split_docs)
       |    GROUP BY 1)
       |  WHERE df >= $LineDupDocFreq)
       |SELECT l.doc_id,
       |  count(*) AS n_lines,
       |  CAST(count(*) FILTER (WHERE bp.h IS NOT NULL) AS BIGINT) AS n_dropped,
       |  coalesce(string_agg(l.line, chr(10) ORDER BY l.idx)
       |    FILTER (WHERE bp.h IS NULL), '') AS scrubbed
       |FROM lines l LEFT JOIN bp ON l.h = bp.h
       |GROUP BY l.doc_id""".stripMargin

  // ----------------------------------------------------------- tfidf_topk

  /** Top terms per document by tf·idf. idf is the BM25-style rational
    * `(N - df + 0.5)/(df + 0.5)` — exact arithmetic (a log-based idf would
    * hang result parity on libm rounding). The exploded (doc, token)
    * relation is the inverted-index shuffle: tf groups by (doc, token),
    * df by token; at 100 TB both are classic map-side-combined aggs and
    * the per-doc top-k runs as WindowGroupLimit.
    */
  val TfidfTopK = 5

  def tfidfTopK(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // N as a 1-row broadcast cross join (the oracle's `n` CTE) — keeps the
    // whole operator ONE lazy plan: no eager driver-side count() job at
    // build time, and N is evaluated against the same input snapshot as
    // the rest of the query
    val nDf = docs.agg(count(lit(1)).cast("double").as("_n"))
    // outer + null filter: an inner explode would infer a size(tokens)>0
    // filter and push the tokenization below the scan a second time
    val toks = docs.select(col("doc_id"), explode_outer(toksOf(docs)).as("token"))
      .filter(col("token").isNotNull)
    val tf = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "token")
      .crossJoin(broadcast(nDf))
      .withColumn("score",
        col("tf") * (col("_n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TfidfTopK)
      .select("doc_id", "token", "tf", "df", "rank", "score")
  }

  def sqlTfidfTopK: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${sqlTokens("text")}) AS token FROM documents),
       |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
       |SELECT doc_id, token, tf, df, rank, score FROM (
       |  SELECT doc_id, token, tf, df,
       |    tf * (n.n - df + 0.5) / (df + 0.5) AS score,
       |    CAST(row_number() OVER (PARTITION BY doc_id
       |      ORDER BY tf * (n.n - df + 0.5) / (df + 0.5) DESC, token) AS BIGINT) AS rank
       |  FROM tf JOIN df USING (token) CROSS JOIN n)
       |WHERE rank <= $TfidfTopK""".stripMargin

  // ------------------------------------------------------ doc_fingerprint

  /** Document fingerprint: min over all [[FpWindow]]-token windows of the
    * window's polynomial rolling hash (winnowing-style content signature —
    * stable under small edits outside the minimal window).
    */
  def docFingerprint(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftext.ArrayFunctions.{md5_prefix_hashes, rolling_fingerprint}
    val ths = md5_prefix_hashes(toksOf(docs))
    // one-pass sketch expression: n_windows interpreted
    // aggregate(slice(...)) folds otherwise dominate (and the un-fanned
    // single-file local input would run them in ONE task)
    DedupOps.fanout(docs).select(
      col("doc_id"),
      size(ths).cast("long").as("n_tokens"),
      rolling_fingerprint(ths, FpWindow, FpMult, P).as("fingerprint")
    )
  }

  def sqlDocFingerprint: String =
    s"""SELECT doc_id, CAST(len(ths) AS BIGINT) AS n_tokens,
       |  list_min(list_transform(range(1, greatest(len(ths) - ${FpWindow - 1}, 1) + 1),
       |    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(ths, i, i + ${FpWindow - 1})),
       |           (a,x) -> (a * $FpMult + x) % $P))) AS fingerprint
       |FROM (
       |  SELECT doc_id, list_transform(${sqlTokens("text")}, t -> ${sqlTokenHash("t")}) AS ths
       |  FROM documents)""".stripMargin

  // --------------------------------------------------------- chunk_tokens

  /** Training-sequence windowing: [[ChunkWindow]] tokens per chunk,
    * [[ChunkStride]]-token stride (25% overlap). Window starts run
    * 0, S, 2S, …; the LAST window may be short — every token is covered,
    * interior tokens appear in ≤ ⌈W/S⌉ chunks.
    */
  val ChunkWindow = 32
  val ChunkStride = 24

  /** Sliding-window token chunking — the context-window preparation step
    * for embedding/RAG indexing (vs [[graft.ops.PretrainOps.packSequences]],
    * which concatenates docs INTO fixed windows; this SPLITS docs into
    * overlapping ones). One row per (doc, window): start offset, width,
    * and the window's text.
    *
    * Scale shape: a narrow generate — tokenize once, per-row arithmetic
    * for the window count, explode, slice. Zero shuffle, no state; the
    * fan-out factor is bounded by ~n/S windows per doc. Parallelism rides
    * the scan (the fanout repartition is the usual one-local-file
    * insurance, a no-op on real multi-split inputs).
    */
  def chunkTokens(docs: DataFrame,
      window: Int = ChunkWindow, stride: Int = ChunkStride): DataFrame =
    DedupOps.fanout(docs)
      .select(col("doc_id"), toksOf(docs).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      // n ≥ 1 always (tokens('') = ['']), so nwin ≥ 1 and the sequence is
      // never descending-by-accident
      .withColumn("nwin",
        expr(s"CAST((greatest(n - $window, 0) + ${stride - 1}) DIV $stride AS BIGINT) + 1"))
      // OUTER generate + null filter, not plain posexplode: an inner
      // generate lets the optimizer infer size()>0 filters and push the
      // whole tokenization below the fanout exchange (duplicated
      // pre-shuffle evaluation — see minhashSignature)
      .select(col("doc_id"), col("n"), col("toks"),
        posexplode_outer(sequence(lit(0L), col("nwin") - 1)))
      .filter(col("pos").isNotNull)
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        (col("pos") * stride).cast("long").as("start_tok"),
        least(lit(window.toLong), col("n") - col("pos") * stride).as("n_tokens"),
        concat_ws(" ",
          slice(col("toks"), (col("pos") * stride + 1).cast("int"), lit(window)))
          .as("chunk_text"))

  def sqlChunkTokens: String =
    s"""WITH s AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
       |  FROM (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents)),
       |w AS (
       |  SELECT doc_id, n, toks,
       |    unnest(range(0, (greatest(n - $ChunkWindow, 0) + ${ChunkStride - 1}) // $ChunkStride + 1)) AS chunk_id
       |  FROM s)
       |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       |  CAST(chunk_id * $ChunkStride AS BIGINT) AS start_tok,
       |  CAST(least($ChunkWindow, n - chunk_id * $ChunkStride) AS BIGINT) AS n_tokens,
       |  array_to_string(list_slice(toks, chunk_id * $ChunkStride + 1,
       |    chunk_id * $ChunkStride + $ChunkWindow), ' ') AS chunk_text
       |FROM w""".stripMargin

  // ----------------------------------------------------------- bm25_topk

  /** BM25 K (per-query results) and the standard k1/b parameters. */
  val Bm25TopK = 5
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** Per-query term budget: each benchmark item queries with its
    * [[Bm25QueryTerms]] RAREST distinct tokens (lowest df ⇒ highest idf;
    * ties by token). Benchmark items are whole documents, and whole-doc
    * queries against a corpus whose vocabulary is far smaller than its
    * document count degenerate into a docs×queries cross join — every
    * common term matches nearly every doc while contributing ~zero to the
    * score (idf ≈ 0). Selecting the max-idf terms is the standard
    * long-query pruning (the static sibling of WAND/max-score) and bounds
    * the match fan-out at |queries|·T·df instead of |queries|·|doc terms|
    * ·df. The truncation is declared semantics, not an approximation
    * knob: scores are exact BM25 over the selected terms.
    */
  val Bm25QueryTerms = 8

  /** Per-term impact cap: each selected query term contributes only its
    * top-[[Bm25ImpactCap]] docs BY TF to the candidate set — static
    * block-max/WAND-style doc-side pruning. Rarest-first term selection
    * bounds terms per query; this bounds docs per term, so the scored
    * set is ≤ |queries|·[[Bm25QueryTerms]]·[[Bm25ImpactCap]] rows no
    * matter how large the corpus grows — the fix for the one curve that
    * was still linear in corpus size. Docs dropped for a term are the
    * LOWEST-tf occurrences of a term that (having survived rarest-first
    * selection) is still common — precisely the matches BM25's tf
    * saturation scores lowest. Like [[Bm25QueryTerms]], the cap is
    * declared semantics shared with the oracle, and it is OBSERVABLE:
    * `n_capped` on every result row counts the candidate (term, doc)
    * rows pruned for that query — exactly df − cap per capped term, so
    * observability costs zero extra passes.
    */
  val Bm25ImpactCap = 1000

  /** BM25 retrieval of training docs for each held-out benchmark item —
    * the ranking function the engine's Elasticsearch target runs,
    * exercised corpus-side: retrieval-based contamination triage (the
    * ranked sibling of [[graft.ops.PretrainOps.contaminationReport]]'s
    * exact-overlap counts) and a self-serve relevance check before
    * shipping an index. Query terms are each benchmark doc's distinct
    * tokens; scores are Robertson/Spärck-Jones BM25 with the repo's
    * rational idf `(N − df + 0.5)/(df + 0.5)` ([[tfidfTopK]]'s rule —
    * log idf would hang parity on libm), and the per-term scores are
    * micro-quantized to longs BEFORE the per-(query, doc) sum so the
    * cross-term reduction is partition-order independent. df counts come
    * from the matched subset, which is exact: every train doc containing
    * a query term is in it.
    *
    * Scale shape: the [[graft.ops.PretrainOps.decontaminate]] asymmetry
    * — the benchmark term set is broadcast-scale, so the corpus tf table
    * joins it and ONLY matching rows shuffle (df agg + per-query-doc
    * sum); the per-query top-K plans as WindowGroupLimit.
    */
  def bm25TopK(docs: DataFrame,
      impactCap: Int = Bm25ImpactCap): DataFrame =
    bm25TopKOn(docs, bm25TfTable(docs), impactCap)

  /** The train-split term-frequency POSTINGS table — (doc_id, token,
    * tf) — THE retrieval serving artifact: a production BM25 deployment
    * builds the inverted index once per corpus version beside the
    * corpus and every query batch reads it (Lucene's segment files, the
    * token-table discipline for retrieval). Everything else the scorer
    * needs (document lengths, global document frequencies, corpus
    * stats) is a cheap doc- or vocab-sized aggregate OF this table.
    */
  def bm25TfTable(docs: DataFrame): DataFrame = {
    import graft.ops.PretrainOps.BenchmarkSource
    val train = docs.filter(col("source") =!= BenchmarkSource)
    val toks = graft.ops.DedupOps.fanout(train)
      .select(col("doc_id"), explode_outer(toksOf(docs)).as("token"))
      .filter(col("token").isNotNull)
    toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
  }

  /** [[bm25TopK]] over an explicit (already materialized) postings
    * table (see [[bm25TfTable]]).
    */
  def bm25TopKOn(docs: DataFrame, tfRaw: DataFrame,
      impactCap: Int = Bm25ImpactCap): DataFrame = {
    import graft.ops.PretrainOps.BenchmarkSource
    import org.apache.spark.sql.expressions.Window
    // materialize tf ONCE: four consumers hang off it (dl, global df, the
    // capped-candidate window, the scoring join) — without this the
    // corpus-wide tokenize+explode+agg subtree re-executes per consumer,
    // and at x32 that recompute, not the (now capped) match fan-out, was
    // the whole scaling slope. A caller passing a persisted artifact
    // makes this a no-op (already materialized).
    val tf = graft.ops.DedupOps.materialize(tfRaw, "bm25_tf")
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    // exact global df per token: tf rows are distinct (doc, token) pairs
    // already, so this is one vocab-sized agg over the tf table
    val dfAll = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val qterms = docs.filter(col("source") === BenchmarkSource)
      .select(col("doc_id").as("query_id"),
        explode_outer(toksOf(docs)).as("token"))
      .filter(col("token").isNotNull).distinct()
    // rarest-first term selection (see Bm25QueryTerms): vocab-sized
    // broadcast + a |queries|·|vocab|-row window — never corpus-scale
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("df").asc, col("token"))
    val qsel = qterms.join(broadcast(dfAll), "token")
      .withColumn("trank", row_number().over(wq))
      .filter(col("trank") <= Bm25QueryTerms)
      .select("query_id", "token", "df")
    // impact-ordered doc-side pruning: per SELECTED term keep only the
    // top-Bm25ImpactCap docs by tf. The rank<=cap filter plans as
    // WindowGroupLimit (map-side partial limit before the token
    // shuffle), and only rows matching a selected term enter the window
    // at all — the decontaminate broadcast asymmetry preserved.
    val wImp = Window.partitionBy(col("token"))
      .orderBy(col("tf").desc, col("doc_id"))
    val tfCapped = tf
      .join(broadcast(qsel.select("token").distinct()), "token")
      .withColumn("imprank", row_number().over(wImp))
      .filter(col("imprank") <= impactCap)
      .drop("imprank")
    // per-query pruning observability, FREE of any extra pass over the
    // corpus: a term with df docs loses exactly max(df - cap, 0) of them
    val qCapped = qsel.groupBy("query_id")
      .agg(sum(greatest(col("df") - lit(impactCap.toLong), lit(0L)))
        .as("n_capped"))
    val matched = tfCapped.join(broadcast(qsel), "token")
    val scored = matched
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5)))
      .withColumn("rel_len",
        (col("dl") * col("n_docs")).cast("double") / col("sum_dl").cast("double"))
      .withColumn("term_score",
        col("idf") * (col("tf").cast("double") * lit(Bm25K1 + 1.0))
          / (col("tf").cast("double")
            + lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * col("rel_len"))))
      .withColumn("micro",
        floor(col("term_score") * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("query_id", "doc_id")
      .agg(sum("micro").as("score_micro"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Bm25TopK)
      .join(broadcast(qCapped), "query_id")
      .select(col("query_id"), col("doc_id"), col("rank"), col("score_micro"),
        (col("score_micro").cast("double") / lit(1000000.0)).as("score"),
        col("n_capped"))
  }

  def sqlBm25TopK: String = {
    import graft.ops.PretrainOps.BenchmarkSource
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${sqlTokens("text")}) AS token
       |  FROM documents WHERE source <> '$BenchmarkSource'),
       |tf AS MATERIALIZED (
       |  SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
       |dl AS MATERIALIZED (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
       |stats AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
       |dfall AS (
       |  SELECT token, count(*) AS df FROM tf GROUP BY token),
       |qterms AS (
       |  SELECT DISTINCT doc_id AS query_id, token FROM (
       |    SELECT doc_id, unnest(${sqlTokens("text")}) AS token
       |    FROM documents WHERE source = '$BenchmarkSource')),
       |qsel AS (
       |  SELECT query_id, token, df FROM (
       |    SELECT q.query_id, q.token, f.df,
       |      row_number() OVER (PARTITION BY q.query_id
       |        ORDER BY f.df ASC, q.token) AS trank
       |    FROM qterms q JOIN dfall f USING (token))
       |  WHERE trank <= $Bm25QueryTerms),
       |tfcapped AS MATERIALIZED (
       |  SELECT doc_id, token, tf FROM (
       |    SELECT t.doc_id, t.token, t.tf,
       |      row_number() OVER (PARTITION BY t.token
       |        ORDER BY t.tf DESC, t.doc_id) AS imprank
       |    FROM tf t JOIN (SELECT DISTINCT token FROM qsel) s USING (token))
       |  WHERE imprank <= $Bm25ImpactCap),
       |qcapped AS (
       |  SELECT query_id,
       |    CAST(sum(greatest(df - $Bm25ImpactCap, 0)) AS BIGINT) AS n_capped
       |  FROM qsel GROUP BY query_id),
       |matched AS MATERIALIZED (
       |  SELECT t.doc_id, t.token, t.tf, q.query_id, q.df
       |  FROM tfcapped t JOIN qsel q USING (token)),
       |scored AS (
       |  SELECT m.query_id, m.doc_id,
       |    CAST(sum(CAST(floor(
       |      ((CAST(s.n_docs AS DOUBLE) - CAST(m.df AS DOUBLE) + 0.5)
       |        / (CAST(m.df AS DOUBLE) + 0.5))
       |      * (CAST(m.tf AS DOUBLE) * ${Bm25K1 + 1.0})
       |      / (CAST(m.tf AS DOUBLE)
       |        + $Bm25K1 * (${1.0 - Bm25B} + $Bm25B
       |          * (CAST(d.dl * s.n_docs AS DOUBLE) / CAST(s.sum_dl AS DOUBLE))))
       |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS score_micro
       |  FROM matched m
       |  JOIN dl d ON d.doc_id = m.doc_id
       |  CROSS JOIN stats s
       |  GROUP BY m.query_id, m.doc_id)
       |SELECT query_id, doc_id, rank, score_micro,
       |  CAST(score_micro AS DOUBLE) / 1000000.0 AS score, c.n_capped
       |FROM (
       |  SELECT query_id, doc_id, score_micro,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rank
       |  FROM scored)
       |JOIN qcapped c USING (query_id)
       |WHERE rank <= $Bm25TopK""".stripMargin
  }

  // -------------------------------------------------------- phrase_match

  /** The published phrase-query set — fixed literals (a search API's
    * query side), chosen to have hits at every fixture SF. The operator
    * is generic over any word sequence ≥ 2.
    */
  val PhraseQueries: Seq[String] = Seq("big order scan", "group slow spark")

  /** Positional phrase search — the other half of the IR story beside
    * [[bm25TopK]]'s ranked bag-of-words: exact ADJACENT-WORD phrase
    * matching by positional posting-list intersection (what an
    * Elasticsearch `match_phrase` runs against its positions index).
    * For a phrase [w0..wL-1]: postings of w0 join postings of each wi
    * on (doc_id, pos_i = pos_0 + i); one row per (phrase, matching doc)
    * with the match count and first position.
    *
    * Scale shape — the decontaminate asymmetry again: the postings
    * table is filtered to THE QUERY'S OWN TERMS at the scan (an `isin`
    * over a literal set — pushed below the explode), so only
    * query-term postings ever shuffle: O(Σ df(term)) rows, not the
    * corpus. The filtered postings materialize ONCE and every phrase's
    * join branches read them; joins key on (doc_id, pos) — exact,
    * skew-free (a position is unique per doc). A substring scan
    * (`contains`) would re-read every text byte per query; the postings
    * form pays the explode once for ALL queries and each new query
    * costs only its own df.
    */
  def phraseMatch(docs: DataFrame,
      queries: Seq[String] = PhraseQueries): DataFrame = {
    val phrases = queries.map(p => p -> p.split(" ").toSeq)
    val allTerms = phrases.flatMap(_._2).distinct
    val post = graft.ops.DedupOps.materialize(
      graft.ops.DedupOps.fanout(docs)
        .select(col("doc_id"), posexplode_outer(toksOf(docs)).as(Seq("pos", "token")))
        .filter(col("token").isin(allTerms: _*))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token")),
      "phrase_postings")
    phrases.map { case (q, ws) =>
      val base = post.filter(col("token") === ws.head)
        .select(col("doc_id"), col("pos"))
      val joined = ws.zipWithIndex.drop(1).foldLeft(base) { case (acc, (w, i)) =>
        acc.join(
          post.filter(col("token") === w)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
      joined.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_matches"), min(col("pos")).as("first_pos"))
        .select(lit(q).as("phrase"), col("doc_id"),
          col("n_matches"), col("first_pos"))
    }.reduce(_ unionByName _)
  }

  def sqlPhraseMatch: String = {
    val allTerms = PhraseQueries.flatMap(_.split(" ")).distinct
      .map(t => s"'$t'").mkString(", ")
    val branches = PhraseQueries.map { q =>
      val ws = q.split(" ").toSeq
      val joins = ws.zipWithIndex.drop(1).map { case (w, i) =>
        s"JOIN post p$i ON p$i.doc_id = p0.doc_id AND p$i.pos = p0.pos + $i AND p$i.token = '$w'"
      }.mkString(" ")
      s"SELECT '$q' AS phrase, p0.doc_id, count(*) AS n_matches, " +
        s"min(p0.pos) AS first_pos FROM post p0 $joins " +
        s"WHERE p0.token = '${ws.head}' GROUP BY p0.doc_id"
    }.mkString(" UNION ALL ")
    s"""WITH post AS MATERIALIZED (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
       |  FROM (
       |    SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
       |    FROM (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents))
       |  WHERE toks[i] IN ($allTerms))
       |$branches""".stripMargin
  }

  // ----------------------------------------------------- length_histogram

  /** Per-source doc-length distribution as a log₂ histogram — the
    * first-look QC chart of any corpus drop (truncation cliffs, boiler-
    * plate spikes, a crawl source gone short). Bucket b holds docs with
    * token count in [2^b − 1, 2^(b+1) − 1): `b = floor(log2(n+1))`,
    * computed EXACTLY as the bit length of n+1 (`length(bin(n+1)) − 1`) —
    * no floating log whose last-ulp rounding could flip a doc at a
    * power-of-two boundary between engines. All-integer output: doc and
    * token totals plus the exact min/max token counts in the bucket.
    *
    * Scale shape: one narrow scan projecting (source, n) and one
    * map-side-combined agg on (source, bucket) — output is
    * O(sources × 64) rows regardless of corpus size.
    */
  def lengthHistogram(docs: DataFrame): DataFrame =
    graft.ops.DedupOps.fanout(docs)
      .select(col("source"),
        size(toksOf(docs)).cast("long").as("n"))
      .withColumn("bucket", (length(bin(col("n") + 1)) - 1).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("sum_tokens"),
        min(col("n")).as("min_tokens"),
        max(col("n")).as("max_tokens"))

  def sqlLengthHistogram: String =
    s"""SELECT source, CAST(len(bin(n + 1)) - 1 AS BIGINT) AS bucket,
       |  count(*) AS n_docs,
       |  CAST(sum(n) AS BIGINT) AS sum_tokens,
       |  CAST(min(n) AS BIGINT) AS min_tokens,
       |  CAST(max(n) AS BIGINT) AS max_tokens
       |FROM (
       |  SELECT source, CAST(len(${sqlTokens("text")}) AS BIGINT) AS n
       |  FROM documents)
       |GROUP BY source, bucket""".stripMargin

  // ------------------------------------------------- quality_linear_score

  /** Hashed-feature dimensionality for the linear quality classifier. */
  val LinearBuckets = 1024L
  /** Weight range: micro-units in [−1000, 1000] per feature. */
  val LinearWeightMod = 2001L

  /** Classifier-based quality filtering — the model-scored rung above the
    * heuristic ladder ([[qualityScore]] → gopher gates → n-gram fluency):
    * a fastText-style linear model over hashed bag-of-words features,
    * the shape of CCNet's / LLaMA's wikiref quality classifier. Each
    * token hashes into one of [[LinearBuckets]] feature buckets; the
    * document's logit is the integer-micro sum of its tokens' bucket
    * weights, folded IN-ROW over the token array — so the whole operator
    * is a zero-shuffle narrow projection that scales with input splits.
    *
    * Weights here are a deterministic arithmetic stand-in
    * (`w(b) = ((b+1)·2654435761 mod 2001) − 1000` micros, shared with
    * the oracle as pure arithmetic); a TRAINED model slots into the same
    * plan as a broadcast bucket→weight lookup (vocab-sized, like
    * [[graft.ops.TokenizerOps]]'s merge table) without changing the
    * operator's shape. The logit is summed in exact integer micros —
    * partition order can't perturb it — and `accept` is the logit-sign
    * gate a filtering pipeline would apply.
    */
  /** Hashed feature bucket of a token — one definition for scoring,
    * training, and the trained-weight lookup.
    */
  private def linearBucket(c: Column): Column = tokenHash(c) % LinearBuckets

  /** The deterministic placeholder weight (micros) of a token — the
    * arithmetic stand-in shared with the oracle.
    */
  private def seedWeight(c: Column): Column =
    ((linearBucket(c) + 1L) * 2654435761L) % LinearWeightMod - 1000L

  /** The placeholder weights as an explicit bucket→micros map — the
    * exact same arithmetic as [[seedWeight]], materialized driver-side
    * as the starting point for [[qualityLinearTrain]].
    */
  def seedWeightsMicro: Map[Long, Long] =
    (0L until LinearBuckets).map(b =>
      b -> (((b + 1L) * 2654435761L) % LinearWeightMod - 1000L)).toMap

  private def linearScored(docs0: DataFrame,
      weight: Column => Column): DataFrame = {
    // the per-token weight fold is the heavy map — fan a serial-scan
    // input out first (fixture insurance, no-op on multi-split corpora)
    val docs = graft.ops.DedupOps.fanoutIfNarrow(docs0)
    val toks = toksOf(docs)
    docs.select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        aggregate(transform(toks, weight), lit(0L), (a, x) => a + x)
          .as("logit_micro"))
      .withColumn("score", col("logit_micro").cast("double") / lit(1000000.0))
      .withColumn("accept", col("logit_micro") > 0L)
  }

  def qualityLinearScore(docs: DataFrame): DataFrame =
    linearScored(docs, seedWeight)

  /** [[qualityLinearScore]] with EXPLICIT weights — the plan a trained
    * model runs in: identical zero-shuffle in-row fold, with the weight
    * arithmetic swapped for a bucket→micros literal-map lookup (the
    * [[graft.ops.CdcOps]] routing-map pattern; [[LinearBuckets]] entries,
    * materialized once, never per row). Unknown buckets weigh 0.
    */
  def qualityLinearScoreWith(docs: DataFrame,
      weightsMicro: Map[Long, Long]): DataFrame =
    linearScored(docs, c =>
      coalesce(element_at(typedlit(weightsMicro), linearBucket(c)), lit(0L)))

  def sqlQualityLinearScore: String = {
    val w = s"((${sqlTokenHash("t")} % $LinearBuckets + 1) * 2654435761) % $LinearWeightMod - 1000"
    s"""SELECT doc_id, n_tokens, logit_micro,
       |  CAST(logit_micro AS DOUBLE) / 1000000.0 AS score,
       |  logit_micro > 0 AS accept
       |FROM (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(toks, t -> $w)), (a,x) -> a + x) AS logit_micro
       |  FROM (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents))""".stripMargin
  }

  // ------------------------------------------------- quality_linear_train

  /** Inverse learning rate for [[qualityLinearTrain]]: η = 1/[[LinearEtaInv]]. */
  val LinearEtaInv = 1000L

  /** One training step of the linear quality classifier — the CCNet/LLaMA
    * recipe's missing half: [[qualityLinearScore]] scores with weights,
    * this LEARNS them, with labels taken from [[qualityGopherGates]]'
    * verdicts (the published hard gates acting as the silver-label
    * teacher — exactly how wikiref-style classifiers are bootstrapped
    * when no human labels exist). Emits the per-bucket logistic gradient
    * gᵦ = Σ_docs (p − y) · xᵦ where xᵦ is the doc's token count in
    * bucket b, p is the FAST-sigmoid prediction p = ½ + z/(2(1+|z|))
    * (pure IEEE arithmetic — a libm `exp` would hang cross-engine hash
    * parity, the [[graft.ops.PretrainOps]] Jelinek-Mercer discipline),
    * and the per-doc residual is micro-quantized BEFORE the per-bucket
    * sum so the reduction is partition-order independent. (p−y)·x is the
    * exact gradient of the convex matching loss of any monotone link
    * (Auer et al. 1995), so the step is a true descent direction.
    *
    * Scale shape: the [[graft.ops.SimilarityOps.pqTrainStep]] altitude —
    * one narrow scan computes label + logit + residual IN-ROW (gopher
    * stats and the score fold share one projection), then the token
    * explode feeds ONE map-side-combined agg with ≤ [[LinearBuckets]]
    * keys; only the 1024-row gradient ever reaches a driver.
    */
  def qualityLinearTrainStep(docs: DataFrame): DataFrame =
    qualityLinearTrainStepWith(docs, None)

  /** [[qualityLinearTrainStep]] against EXPLICIT current weights — the
    * SGD form [[graft.stream.TrainStream]] iterates: gradients are taken
    * at the weights learned so far (broadcast literal-map lookup, the
    * [[qualityLinearScoreWith]] plan), not at the seed. `None` keeps the
    * oracle face's arithmetic seed weights.
    */
  def qualityLinearTrainStepWith(docs0: DataFrame,
      weightsMicro: Option[Map[Long, Long]]): DataFrame = {
    // gradient scan = the same heavy per-token fold (see linearScored)
    val docs = graft.ops.DedupOps.fanoutIfNarrow(docs0)
    val weight: Column => Column = weightsMicro match {
      case None => seedWeight(_)
      case Some(w) =>
        c => coalesce(element_at(typedlit(w), linearBucket(c)), lit(0L))
    }
    val labeled = docs
      .select(col("doc_id"), toksOf(docs).as("toks"),
        when(gopherPass(col("text")), lit(1.0)).otherwise(lit(0.0)).as("y"),
        aggregate(transform(toksOf(docs), weight), lit(0L),
          (a, x) => a + x).as("logit_micro"))
      .withColumn("z", col("logit_micro").cast("double") / lit(1000000.0))
      .withColumn("p",
        lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
      .withColumn("r_micro",
        floor((col("p") - col("y")) * lit(1000000.0) + lit(0.5)).cast("long"))
    labeled
      .select(col("r_micro"), explode(col("toks")).as("tok"))
      .select(linearBucket(col("tok")).as("bucket"), col("r_micro"))
      .groupBy("bucket")
      .agg(sum("r_micro").as("grad_micro"), count(lit(1)).as("n_terms"))
  }

  /** The gradient CTE chain (labels → seed-weight logits → fast-sigmoid
    * residuals → per-bucket gradient), shared by the train-step oracle
    * and the trained-scoring composition so they cannot drift.
    */
  private def sqlLinearGradCtes: String = {
    val w = s"((${sqlTokenHash("t")} % $LinearBuckets + 1) * 2654435761) % $LinearWeightMod - 1000"
    s"""gates AS (SELECT doc_id, pass FROM (
       |${sqlQualityGopherGates}
       |) gg),
       |tk AS (SELECT doc_id, ${sqlTokens("text")} AS toks FROM documents),
       |scored AS (
       |  SELECT tk.doc_id, tk.toks,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(tk.toks, t -> $w)), (a,x) -> a + x) AS logit_micro,
       |    CASE WHEN g.pass THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END AS y
       |  FROM tk JOIN gates g USING (doc_id)),
       |resid AS (
       |  SELECT doc_id, toks,
       |    CAST(floor(
       |      ((0.5 + (CAST(logit_micro AS DOUBLE) / 1000000.0)
       |        / (2.0 * (1.0 + abs(CAST(logit_micro AS DOUBLE) / 1000000.0))))
       |       - y) * 1000000.0 + 0.5) AS BIGINT) AS r_micro
       |  FROM scored),
       |grads AS (
       |  SELECT bucket, CAST(sum(r_micro) AS BIGINT) AS grad_micro,
       |    count(*) AS n_terms
       |  FROM (
       |    SELECT ${sqlTokenHash("tok")} % $LinearBuckets AS bucket, r_micro
       |    FROM (SELECT r_micro, unnest(toks) AS tok FROM resid))
       |  GROUP BY bucket)""".stripMargin
  }

  def sqlQualityLinearTrainStep: String =
    s"""WITH ${sqlLinearGradCtes}
       |SELECT bucket, grad_micro, n_terms FROM grads""".stripMargin

  /** Oracle twin of train→score composed END-TO-END: the updated weights
    * are recomputed IN SQL (seed arithmetic − floor-divided mean
    * gradient) and applied by a bucket join — while the Spark side trains
    * driver-side ([[qualityLinearTrain]], Java `floorDiv`) and scores via
    * the literal-map fold. Everything is integer arithmetic, so the two
    * independently-computed weight tables are value-identical; `//` in
    * DuckDB truncates toward zero, hence the explicit
    * `(g − (((g % d) + d) % d)) / d` floor-division (exact: the adjusted
    * numerator is divisible).
    */
  /** Calibration (reliability) table for the TRAINED quality classifier
    * — the table a shipped gate publishes so a threshold choice is a
    * read, not a rerun: logits bucketed into clamped integer bins, per
    * bin the silver-label pass rate ([[gopherPass]] — the same labels
    * the classifier trained on, so this measures fit, not transfer).
    * A well-calibrated gate shows pass_rate rising with the bin.
    *
    * Shape: scored ⋈ labels on doc_id (both derive from the same
    * corpus — co-keyed join), then ONE ≤11-group agg; binning is
    * floor(logit) clamped to [−5, 5], all from the exact integer
    * logit_micro, so the bin edges cannot drift between engines.
    */
  def qualityCalibration(docs: DataFrame): DataFrame = {
    val scored = qualityLinearScoreWith(docs, qualityLinearTrain(docs))
      .select(col("doc_id"), col("logit_micro"))
    val labeled = docs.select(col("doc_id"),
      when(gopherPass(col("text")), 1L).otherwise(0L).as("y"))
    scored.join(labeled, Seq("doc_id"))
      .withColumn("bin",
        least(greatest(floor(col("logit_micro").cast("double") / 1e6),
          lit(-5L)), lit(5L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pass"))
      .select(col("bin"), col("n"), col("n_pass"),
        (col("n_pass").cast("double") / col("n")).as("pass_rate"))
  }

  def sqlQualityCalibration: String =
    s"""WITH scored AS (
${sqlQualityLinearScoreTrained.linesIterator.map(l => "       |  " + l).mkString("\n")}
       |),
       |labeled AS (
       |  SELECT doc_id, CASE WHEN pass THEN 1 ELSE 0 END AS y FROM (
${sqlQualityGopherGates.linesIterator.map(l => "       |    " + l).mkString("\n")}
       |)),
       |binned AS (
       |  SELECT least(greatest(CAST(floor(CAST(s.logit_micro AS DOUBLE) / 1e6) AS BIGINT),
       |      -5), 5) AS bin, l.y
       |  FROM scored s JOIN labeled l USING (doc_id))
       |SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pass,
       |  CAST(sum(y) AS DOUBLE) / count(*) AS pass_rate
       |FROM binned GROUP BY bin""".stripMargin

  def sqlQualityLinearScoreTrained: String = {
    val d = s"($LinearEtaInv * n.n)"
    s"""WITH ${sqlLinearGradCtes},
       |n AS (SELECT count(*) AS n FROM documents),
       |seeds AS (
       |  SELECT i AS bucket,
       |    CAST(((i + 1) * 2654435761) % $LinearWeightMod - 1000 AS BIGINT) AS w
       |  FROM (SELECT unnest(range(0, $LinearBuckets)) AS i)),
       |weights AS (
       |  SELECT s.bucket, s.w - CASE WHEN g.grad_micro IS NULL OR n.n = 0 THEN 0
       |    ELSE CAST((g.grad_micro - (((g.grad_micro % $d) + $d) % $d)) / $d AS BIGINT)
       |  END AS w
       |  FROM seeds s LEFT JOIN grads g USING (bucket) CROSS JOIN n),
       |dt AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, unnest(toks) AS tok
       |  FROM tk),
       |docw AS (
       |  SELECT dt.doc_id, dt.n_tokens, CAST(sum(w.w) AS BIGINT) AS logit_micro
       |  FROM dt JOIN weights w ON w.bucket = ${sqlTokenHash("dt.tok")} % $LinearBuckets
       |  GROUP BY dt.doc_id, dt.n_tokens)
       |SELECT doc_id, n_tokens, logit_micro,
       |  CAST(logit_micro AS DOUBLE) / 1000000.0 AS score,
       |  logit_micro > 0 AS accept
       |FROM docw""".stripMargin
  }

  /** Full one-step train: seed weights − η · mean gradient, all in exact
    * integer micros (`floorDiv` — deterministic toward −∞ regardless of
    * sign). Only the ≤1024-row gradient and a 1-row count reach the
    * driver; the returned map drops into [[qualityLinearScoreWith]]'s
    * unchanged scoring plan.
    */
  /** The weight update w ← w − η·(g/n) in exact integer micros
    * (`floorDiv` — deterministic toward −∞ regardless of sign). One
    * definition point shared by the batch [[qualityLinearTrain]] and the
    * streaming [[graft.stream.TrainStream]] fold.
    */
  def applyGradient(weights: Map[Long, Long], grads: Seq[(Long, Long)],
      nDocs: Long, etaInv: Long = LinearEtaInv): Map[Long, Long] =
    if (nDocs <= 0) weights
    else grads.foldLeft(weights) { case (w, (b, g)) =>
      w.updated(b, w.getOrElse(b, 0L) - Math.floorDiv(g, etaInv * nDocs))
    }

  def qualityLinearTrain(docs: DataFrame,
      etaInv: Long = LinearEtaInv): Map[Long, Long] = {
    val grads = qualityLinearTrainStep(docs).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("grad_micro")).toSeq
    applyGradient(seedWeightsMicro, grads, docs.count(), etaInv)
  }

  /** Mean |p − y| of `weightsMicro` over the corpus — the trainer's loss
    * gauge: label, logit and fast-sigmoid prediction all compute IN-ROW
    * in one scan, one 1-row agg. None on empty input.
    */
  def linearMeanAbsResidual(docs0: DataFrame,
      weightsMicro: Map[Long, Long]): Option[Double] = {
    val docs = graft.ops.DedupOps.fanoutIfNarrow(docs0)
    val wmap = typedlit(weightsMicro)
    val weight = (c: Column) =>
      coalesce(element_at(wmap, linearBucket(c)), lit(0L))
    val row = docs
      .select(
        when(gopherPass(col("text")), lit(1.0)).otherwise(lit(0.0)).as("y"),
        aggregate(transform(toksOf(docs), weight), lit(0L),
          (a, x) => a + x).as("logit_micro"))
      .withColumn("z", col("logit_micro").cast("double") / lit(1000000.0))
      .withColumn("p",
        lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
      .agg(avg(abs(col("p") - col("y"))).as("l"), count(lit(1)).as("n"))
      .collect()(0)
    if (row.getAs[Long]("n") == 0L) None else Some(row.getAs[Double]("l"))
  }

  /** Iterated full-batch training — [[qualityLinearTrain]] looped with a
    * loss history, the [[graft.ops.SimilarityOps.pqTrain]] discipline:
    * hist(i) measures the weights BEFORE step i, a final pass is
    * appended so `hist.last` always measures the RETURNED weights, and
    * the tol-based stop acts on real measurements. Each iteration is two
    * corpus scans (loss gauge + gradient agg) with only the ≤1024-row
    * gradient and two 1-row aggs reaching the driver; the corpus is
    * cached across iterations like every training loop here.
    */
  def qualityLinearTrainLoop(docs: DataFrame, maxIter: Int = 5,
      etaInv: Long = LinearEtaInv, tol: Double = 1e-6)
      : (Map[Long, Long], Seq[Double]) = {
    // fan ONCE into the iteration cache (every loop scan re-reads it),
    // and carry the shared token table's column so the ~2·maxIter scans
    // skip re-splitting the text
    val keep = Seq("doc_id", "text") ++
      (if (docs.columns.contains(ToksCol)) Seq(ToksCol) else Nil)
    val d = graft.ops.DedupOps.fanoutIfNarrow(
      docs.select(keep.map(col): _*)).cache()
    try {
      val nDocs = d.count()
      var w = seedWeightsMicro
      val hist = scala.collection.mutable.ArrayBuffer.empty[Double]
      var iter = 0
      var improving = true
      while (iter < maxIter && improving && nDocs > 0) {
        val loss = linearMeanAbsResidual(d, w).get
        improving = hist.lastOption.forall(prev => prev - loss > tol)
        if (improving) {
          hist += loss
          val grads = qualityLinearTrainStepWith(d, Some(w)).collect()
            .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("grad_micro"))
            .toSeq
          w = applyGradient(w, grads, nDocs, etaInv)
        }
        iter += 1
      }
      // measure the weights we actually return
      linearMeanAbsResidual(d, w).foreach(hist += _)
      (w, hist.toSeq)
    } finally { d.unpersist(); () }
  }
}
