package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{PretrainOps, TextOps}

/** Round-8 (cont.) curation operators: Kneser–Ney fluency, DSIR
  * importance weights, and the cross-source overlap matrix — each checked
  * against an INDEPENDENT plain-Scala reimplementation of the published
  * contract on hand-built corpora (the oracle-twin discipline, but
  * in-JVM), plus the behavioral properties that motivate the algorithm
  * (continuation-count backoff, target-distribution sign, containment
  * catching subset sources).
  */
class CurationR8Spec extends SparkSuite {

  import spark.implicits._

  // ---- naive twins of the shared hashing/tokenizing contracts --------

  /** First-8-hex-digits-of-md5 token hash — [[graft.ops.TextOps.tokenHash]]
    * recomputed from first principles.
    */
  private def h(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  private def toks(text: String): Vector[String] =
    text.trim.toLowerCase.split("\\s+", -1).toVector

  /** Positional word grams with the kernel's short-doc rule: a doc
    * shorter than the window yields ONE whole-doc gram.
    */
  private def grams(ts: Vector[String], w: Int): Vector[String] = {
    val n = math.max(ts.length - (w - 1), 1)
    (0 until n).map(i => ts.slice(i, i + w).mkString(" ")).toVector
  }

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  // ------------------------------------------------- quality_kn_fluency

  /** Naive Kneser–Ney bigram per-doc (n_bigrams, sum_micro) with D=3/4 in
    * the operator's exact integer arithmetic.
    */
  private def naiveKn(corpus: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val bis = corpus.map { case (id, t) =>
      val ts = toks(t); id -> ts.zip(ts.drop(1))
    }
    val all = bis.flatMap(_._2)
    val cnt2 = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = cnt2.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n1f = cnt2.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val n1b = cnt2.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val n1tot = cnt2.size.toLong
    bis.filter(_._2.nonEmpty).map { case (id, bs) =>
      val sum = bs.map { b =>
        val (w1, w2) = b
        val (cc2, cc1) = (cnt2(b), c1(w1))
        ((math.max(4 * cc2 - 3, 0) * 1000000L) / (4 * cc1)) +
          ((3 * n1f(w1) * ((n1b(w2) * 1000000L) / n1tot)) / (4 * cc1))
      }.sum
      id -> (bs.size.toLong, sum)
    }.toMap
  }

  test("quality_kn_fluency ≡ naive Kneser–Ney on a hand-built corpus") {
    val corpus = Seq[(Long, String)](
      1L -> "the cat sat on the mat",
      2L -> "the cat ran to the mat",
      3L -> "san francisco san francisco san francisco",
      4L -> "a dog sat on a rug",
      5L -> "zz",                      // 1 token → no bigrams → absent
      6L -> "the dog sat on the rug and the cat sat too")
    val got = PretrainOps.qualityKnFluency(docsDf(corpus))
      .select("doc_id", "n_bigrams", "sum_micro").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naiveKn(corpus))
    assert(!got.contains(5L), "a 1-token doc must be absent")
  }

  test("KN continuation backoff: many-context words beat single-context words") {
    // "b" completes bigrams after 4 distinct contexts; "f" has the same
    // corpus frequency but only ever follows "s" (the San-Francisco
    // shape). The two probe docs "q b" / "q f" are symmetric in every
    // bigram statistic EXCEPT the continuation count — raw-ML bigram
    // scoring (qualityBigramFluency) cannot tell them apart; KN must.
    val corpus = Seq[(Long, String)](
      1L -> "u b", 2L -> "v b", 3L -> "w b",
      4L -> "s f s f s f",
      10L -> "q b", 11L -> "q f")
    val kn = PretrainOps.qualityKnFluency(docsDf(corpus))
      .select("doc_id", "fluency").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(kn(10L) > kn(11L),
      s"KN must prefer the many-context continuation: ${kn(10L)} !> ${kn(11L)}")
    val ml = PretrainOps.qualityBigramFluency(docsDf(corpus))
      .select("doc_id", "fluency").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ml(10L) == ml(11L),
      "raw ML bigram scoring is blind to the distinction by construction")
  }

  test("KN probabilities are a (sub-)distribution: per-occurrence p in (0, 1e6]") {
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
    val r = PretrainOps.qualityKnFluency(fixture)
      .agg(min(col("sum_micro").cast("double") / col("n_bigrams")),
        max(col("sum_micro").cast("double") / col("n_bigrams"))).head()
    assert(r.getDouble(0) > 0.0 && r.getDouble(1) <= 1000000.0)
  }

  // ------------------------------------------------------- dsir_weight

  /** Naive DSIR per-doc weight_micro with the operator's exact integers. */
  private def naiveDsir(corpus: Seq[(Long, String, String)])
      : Map[Long, (Long, Long)] = {
    val b = PretrainOps.DsirBuckets
    val occ = corpus.map { case (id, lang, t) =>
      (id, lang, grams(toks(t), 2).map(g => h(g) % b))
    }
    val tr = occ.map(_._3.size.toLong).sum
    val tt = occ.filter(_._2 == PretrainOps.DsirTargetLang)
      .map(_._3.size.toLong).sum
    val cr = occ.flatMap(_._3).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val ct = occ.filter(_._2 == PretrainOps.DsirTargetLang).flatMap(_._3)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .withDefaultValue(0L)
    def lam(bk: Long): Long = {
      val num = (ct(bk) + 1) * (tr + b)
      val den = num + (cr(bk) + 1) * (tt + b)
      (num * 1000000L) / den - 500000L
    }
    occ.map { case (id, _, gs) =>
      id -> (gs.size.toLong, gs.map(lam).sum)
    }.toMap
  }

  test("dsir_weight ≡ naive DSIR on a hand-built bilingual corpus") {
    val corpus = Seq[(Long, String, String)](
      (1L, "en", "the market opened higher on tuesday"),
      (2L, "en", "the market closed lower on friday"),
      (3L, "en", "shares of the market rallied"),
      (4L, "zh", "股市 周二 高开 上涨"),
      (5L, "zh", "股市 周五 低开 下跌"),
      (6L, "en", "单 token 外语 混入 the market"),
      (7L, "en", "x"))                        // 1 token → 1 degenerate gram
    val df = corpus.toDF("doc_id", "lang", "text")
    val got = PretrainOps.dsirWeight(df)
      .select("doc_id", "n_grams", "weight_micro").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == naiveDsir(corpus))
  }

  test("DSIR weights separate target-looking from non-target-looking docs") {
    // target (en) text is drawn from one phrase family, zh from another:
    // an en doc's buckets are target-heavy (λ > 0), a zh doc's are
    // target-absent (λ < 0) — the importance-resampling contract.
    val corpus = (1L to 8L).map(i => (i, "en", "aa bb aa bb aa")) ++
      (9L to 16L).map(i => (i, "zh", "cc dd cc dd cc"))
    val w = PretrainOps.dsirWeight(corpus.toDF("doc_id", "lang", "text"))
      .select("doc_id", "weight").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    (1L to 8L).foreach(i => assert(w(i) > 0.0, s"target doc $i: ${w(i)}"))
    (9L to 16L).foreach(i => assert(w(i) < 0.0, s"raw-only doc $i: ${w(i)}"))
  }

  test("dsir_weight covers every doc with ≥1 token and sums grams right") {
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
    val out = PretrainOps.dsirWeight(fixture)
    assert(out.count() == fixture.count(),
      "every fixture doc tokenizes to ≥1 gram and must be scored")
    // n_grams per doc = max(len-1, 1) — the kernel's short-doc rule
    val bad = out.join(fixture, "doc_id")
      .withColumn("exp",
        greatest(size(split(trim(lower(col("text"))), "\\s+")) - 1, lit(1)))
      .filter(col("n_grams") =!= col("exp").cast("long"))
    assert(bad.isEmpty, "n_grams must equal the positional bigram count")
  }

  test("dsir_resample keeps the per-source top-N by weight, ties by doc_id") {
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
    val sel = PretrainOps.dsirResample(fixture).cache()
    try {
      // every source contributes ≤ N rows, rk is 1..N dense per source
      val per = sel.groupBy("source")
        .agg(count(lit(1)).as("n"), max("rk").as("mx")).collect()
      assert(per.forall(r => r.getLong(1) <= PretrainOps.DsirKeepPerSource &&
        r.getLong(1) == r.getLong(2)))
      // the kept set IS the argmax: no unkept doc of the same source may
      // beat a kept doc's (weight, -doc_id) order
      val w = PretrainOps.dsirWeight(fixture)
        .join(fixture.select("doc_id", "source"), "doc_id")
      val worstKept = sel.groupBy("source").agg(
        min(struct(col("weight_micro"), -col("doc_id"))).as("floor"))
      val unkept = w.join(sel.select("doc_id", "rk"), Seq("doc_id"), "left_anti")
      val violations = unkept.join(worstKept, "source")
        .filter(struct(col("weight_micro"), -col("doc_id")) > col("floor"))
      assert(violations.isEmpty, "an unkept doc outranks a kept one")
    } finally { sel.unpersist() }
  }

  // ------------------------------------------------------ lang_id_ngram

  test("langIdNgram: perfect separation on distinct vocabularies; chance on the signal-free fixture") {
    // three languages with genuinely distinct character distributions
    val corpus = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "en", "a quiet morning with tea and the daily paper on the porch"),
      (3L, "en", "rain fell on the quiet town through the long afternoon"),
      (4L, "de", "der schnelle braune fuchs springt über den faulen hund hinweg"),
      (5L, "de", "ein ruhiger morgen mit tee und der täglichen zeitung draußen"),
      (6L, "de", "über den dächern der stadt zog langsam der nebel auf"),
      (7L, "zh", "敏捷的棕色狐狸跳过了那只懒惰的狗然后跑远了"),
      (8L, "zh", "清晨安静的小镇上飘着茶香和报纸的味道"),
      (9L, "zh", "雨水落在安静的小镇上整个下午都没有停")
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.langIdNgram(corpus).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(4))).toMap
    assert(out.size == 9)
    assert(out.values.forall(_._2),
      s"distinct vocabularies must classify perfectly: $out")
    // the fixture's text is label-independent by construction — the
    // audit honestly reads ~chance there, and must NOT read high (a
    // high score on signal-free content would mean label leakage)
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
    val acc = TextOps.langIdNgram(fixture)
      .agg(avg(col("correct").cast("double"))).head().getDouble(0)
    assert(acc < 0.5, s"label leakage? accuracy $acc on signal-free text")
  }

  // -------------------------------------------------- source_distinct_hll

  test("sourceDistinctHll: accurate in its valid range; registers merge by max") {
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
    val out = PretrainOps.sourceDistinctHll(fixture).cache()
    try {
      // every fixture source's trigram vocabulary clears the raw
      // estimator's 2.5m threshold, so the estimate must be close
      val bad = out.filter(col("n_exact") >= 2.5 * PretrainOps.HllM)
        .filter(col("rel_err") > 0.15)
      assert(bad.isEmpty, "raw HLL off by >15% inside its valid range")
      assert(out.count() == 20)
      // sketch mergeability — the scale/streaming story: the estimate
      // of the UNION corpus equals max-merging per-half registers,
      // which is exactly what computing over the union does (max is
      // associative/commutative/idempotent). Split the corpus, relabel
      // both halves to one source, and compare against the full corpus
      // relabeled the same way.
      val relabeled = fixture.withColumn("source", lit("all"))
      val whole = PretrainOps.sourceDistinctHll(relabeled)
        .select("hll_est").head().getDouble(0)
      val h1 = relabeled.filter(col("doc_id") % 2 === 0)
      val h2 = relabeled.filter(col("doc_id") % 2 === 1)
      val merged = PretrainOps.sourceDistinctHll(h1.unionByName(h2))
        .select("hll_est").head().getDouble(0)
      assert(merged == whole, "register merge must be order/split-free")
    } finally { out.unpersist() }
  }

  // ----------------------------------------------------- token_freq_cms

  test("tokenFreqCms: NEVER undercounts; exact when collision-free; tight when squeezed") {
    val fixture = TextOps.tokenize(spark.read.parquet(s"$sf/documents.parquet"))
    // default width: the ~31-word vocabulary is collision-free in at
    // least one of the 4 rows for every heavy hitter → estimates exact
    val wide = PretrainOps.tokenFreqCms(fixture)
    assert(wide.count() == PretrainOps.CmsTopK)
    assert(wide.filter(col("overcount") =!= 0L).isEmpty,
      "256 counters over a 31-word vocab should be collision-free at the min")
    // squeezed to w=4 the counters MUST collide — the structural CMS
    // guarantee is one-sided: estimate ≥ truth, never below
    val tight = PretrainOps.tokenFreqCms(fixture, w = 4)
    assert(tight.filter(col("overcount") < 0L).isEmpty,
      "CMS undercounted — the min-of-counters bound is broken")
    assert(tight.filter(col("overcount") > 0L).count() > 0,
      "4 counters over 31 words cannot be collision-free")
  }

  // ----------------------------------------------- pack_attention_spans

  test("packAttentionSpans: spans tile every sequence; parse-consistent") {
    val fixture = TextOps.tokenize(spark.read.parquet(s"$sf/documents.parquet"))
    val out = PretrainOps.packAttentionSpans(fixture).cache()
    try {
      // packing is a partition of the token stream: no gaps, no overlaps
      assert(out.filter(!col("covered")).isEmpty,
        "spans must tile each sequence exactly")
      // every row's spans string reparses to n_docs ordered half-open
      // intervals summing to filled_tokens and starting at 0 for full seqs
      out.collect().foreach { r =>
        val spans = r.getAs[String]("spans").split(",").map { s =>
          val Array(a, b) = s.split(":").map(_.toLong); (a, b)
        }
        assert(spans.length == r.getAs[Long]("n_docs"))
        assert(spans.map { case (a, b) => b - a }.sum ==
          r.getAs[Long]("filled_tokens"))
        spans.sliding(2).foreach {
          case Array((_, b1), (a2, _)) => assert(b1 == a2, s"gap in $r")
          case _ =>
        }
        assert(spans.forall { case (a, b) => a >= 0 && b <= PretrainOps.SeqLen && a < b })
      }
    } finally { out.unpersist() }
  }

  // ------------------------------------------------------- embed_drift

  test("embed_drift flags a planted per-dimension shift, not the null split") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // same-distribution halves of the fixture: nothing should drift
    val base = PretrainOps.embedDrift(emb)
    assert(base.count() == 64)
    assert(base.filter(col("drifted")).isEmpty,
      "parity halves of one corpus must not read as drifted")
    // plant a +0.5 shift in dim 3 of the ODD (incoming) split
    val shifted = emb.select(col("vec_id"), col("label"),
      when(col("vec_id") % 2 === 1,
        transform(col("embedding"), (x, i) =>
          when(i === 3, x + lit(0.5f)).otherwise(x)))
        .otherwise(col("embedding")).as("embedding"))
    val drifted = PretrainOps.embedDrift(shifted)
      .filter(col("drifted")).select("dim_idx")
      .collect().map(_.getLong(0)).toSeq
    assert(drifted == Seq(3L), s"expected exactly dim 3, got $drifted")
    // the delta is the planted shift (±quantization)
    val d = PretrainOps.embedDrift(shifted)
      .filter(col("dim_idx") === 3).head().getAs[Long]("delta_micro")
    // float32 addition of 0.5 carries per-element rounding: allow ~1%%
    assert(math.abs(d - 500000L) < 5000, s"delta $d")
  }

  // ---------------------------------------------------- source_overlap

  test("source_overlap ≡ naive set overlap, full matrix, subset containment") {
    val corpus = Seq(
      // A: two docs, three distinct 5-grams
      ("srcA", "a b c d e f"),           // grams: "a b c d e", "b c d e f"
      ("srcA", "p q r s t"),             // gram:  "p q r s t"
      // B: identical to A's first doc → Jaccard 2/3, containment 1
      ("srcB", "a b c d e f"),
      // C: subset — one gram, contained in A → containment 1, Jaccard 1/3
      ("srcC", "a b c d e"),
      // D: disjoint
      ("srcD", "zz yy xx ww vv"))
    val df = corpus.zipWithIndex
      .map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val got = PretrainOps.sourceOverlap(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    // full C(4,2) matrix, zero pairs included, s1 < s2
    assert(got.size == 6)
    assert(got.keySet.forall { case (a, b) => a < b })
    // naive gram sets
    val sets = corpus.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(d => grams(toks(d._2), PretrainOps.DecontamGram)).toSet
    }
    for (((s1, s2), (n1, n2, ni, jac, cont)) <- got) {
      val (g1, g2) = (sets(s1), sets(s2))
      assert(n1 == g1.size && n2 == g2.size)
      assert(ni == g1.intersect(g2).size.toLong, s"($s1,$s2)")
      assert(math.abs(jac - ni.toDouble / (n1 + n2 - ni)) < 1e-12)
      assert(math.abs(cont - ni.toDouble / math.min(n1, n2)) < 1e-12)
    }
    // the subset source is INVISIBLE to Jaccard but loud to containment
    val (_, _, _, jacAC, contAC) = got(("srcA", "srcC"))
    assert(contAC == 1.0 && jacAC < 0.5)
    assert(got(("srcA", "srcD"))._3 == 0L, "disjoint pair present with 0")
  }

  test("degenerate corpora: single source, empty corpus") {
    // one source: the matrix is C(1,2) = 0 rows, not an error
    val one = Seq((1L, "srcX", "some text here"), (2L, "srcX", "more text"))
      .toDF("doc_id", "source", "text")
    assert(PretrainOps.sourceOverlap(one).count() == 0)
    // empty corpus: weights/overlap/KN all come back empty, no throw
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "lang", "source", "text")
    assert(PretrainOps.dsirWeight(empty).count() == 0)
    assert(PretrainOps.sourceOverlap(empty).count() == 0)
    assert(PretrainOps.qualityKnFluency(empty).count() == 0)
    // frozen-λ table of an empty corpus is the all-smoothed table and
    // still scores new docs (everything lands on the ct=0/cr=0 value)
    val lam = PretrainOps.dsirLambdaFull(empty)
    assert(lam.size == PretrainOps.DsirBuckets)
    assert(lam.values.toSet.size == 1)
    val scored = PretrainOps.dsirWeightWith(
      Seq((1L, "hello world")).toDF("doc_id", "text"), lam)
    assert(scored.count() == 1)
  }

  test("source_overlap on the fixture: C(20,2) rows, bounds hold") {
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
    val out = PretrainOps.sourceOverlap(fixture).cache()
    try {
      assert(out.count() == 190L)
      val r = out.agg(min("jaccard"), max("jaccard"), max("containment")).head()
      assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0 &&
        r.getDouble(2) <= 1.0)
      // symmetric-by-construction: every (s1, s2) has s1 < s2, no dupes
      assert(out.select("s1", "s2").distinct().count() == 190L)
    } finally { out.unpersist() }
  }
}
