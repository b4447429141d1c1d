package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, PretrainOps, TextOps}

/** Round-9 curation additions: token-budget fill (the decomposed prefix
  * sum vs a naive single-window reference), prefix dedup (tail-differing
  * crawl dups), soft dedup weighting (unit mass per cluster), and HTML
  * extraction (synthesized-wrapper title/strip/link-density algebra).
  */
class CurationR9Spec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  // ------------------------------------------------------ token_budget_fill

  test("tokenBudgetFill ≡ naive per-source running total, admitted set is a prefix") {
    // enough docs that buckets scatter; deterministic texts
    val corpus = docs((0L until 40L).map(i =>
      (i, Seq.fill((i % 7 + 1).toInt * 20)("w" + i).mkString(" "),
        if (i < 20) "sA" else "sB")): _*)
    val got = PretrainOps.tokenBudgetFill(corpus)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // naive reference: per source, order by (bucket, doc_id), running cumsum
    val withKeys = corpus.select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tok"),
        pmod(TextOps.tokenHash(concat(lit("budget:"), col("doc_id").cast("string"))),
          lit(PretrainOps.BudgetBuckets)).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expect = withKeys.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).init
      ordered.zip(cums).collect { case ((id, src, nt, _), cb)
        if cb < PretrainOps.TokenBudget => (id, src, nt, cb) }
    }.toSet
    assert(got.toSet === expect)
    assert(got.nonEmpty)
    // partial fill actually exercised: some docs rejected in each source
    assert(got.count(_._2 == "sA") < 20 && got.count(_._2 == "sB") < 20)
    // prefix property: per source, the admitted ids are exactly the first
    // k in (bucket, doc_id) order — greedy fill never skips then resumes
    withKeys.groupBy(_._2).foreach { case (src, rows) =>
      val orderedIds = rows.sortBy(r => (r._4, r._1)).map(_._1)
      val admitted = got.filter(_._2 == src).map(_._1).toSet
      val k = orderedIds.indexWhere(!admitted.contains(_)) match {
        case -1 => orderedIds.length
        case i => i
      }
      assert(orderedIds.drop(k).forall(!admitted.contains(_)),
        s"$src admitted set is not an order-prefix")
    }
  }

  test("tokenBudgetFill admits everything under a huge budget, boundary doc may overshoot") {
    val corpus = docs(
      (1L, "a b c", "s"), (2L, "d e", "s"), (3L, "f g h i", "s"))
    val all = PretrainOps.tokenBudgetFill(corpus).collect()
    assert(all.length === 3) // total 9 tokens < TokenBudget=800
    // cum_before of the last admitted doc + its n_tok = 9 (cumsum closes)
    val totals = all.map(r => r.getAs[Long]("cum_before") + r.getAs[Long]("n_tok"))
    assert(totals.max === 9L)
  }

  // ---------------------------------------------------------- dedup_prefix

  test("dedupPrefix clusters tail-differing docs exact dedup splits") {
    val head = (1 to DedupOps.PrefixTokens).map("t" + _).mkString(" ")
    val corpus = docs(
      (1L, s"$head updated 2024-01-01 views 1532", "s"),
      (2L, s"$head updated 2024-02-02 views 99871", "s"),
      (3L, s"$head updated 2024-01-01 views 1532", "s"), // exact dup of 1
      (4L, "a completely different document body", "s"),
      (5L, "short", "s"))
    val got = DedupOps.dedupPrefix(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // docs 1,2,3 share the 16-token prefix: one cluster, rep=1, copies=3,
    // TWO distinct texts (1≡3, 2 differs) — the catch exact dedup misses
    val big = got.filter(_._3 === 3L)
    assert(big.length === 1 && big.head._2 === 1L && big.head._4 === 2L)
    // singletons stay singletons
    assert(got.count(_._3 === 1L) === 2)
    // docs shorter than the prefix window key on their full token list
    assert(got.length === 3)
  }

  // ----------------------------------------------------- soft_dedup_weight

  test("softDedupWeight: unit mass per cluster, audit superset") {
    val corpus = docs(
      (1L, "same text here", "s"), (2L, "Same   TEXT here!", "s"),
      (3L, "same text here", "s"), (4L, "unique body", "s"))
    val got = DedupOps.softDedupWeight(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length === 4) // every doc emitted
    // normalization folds case/punct/whitespace: 1,2,3 are ONE cluster
    assert(got.filter(_._3 === 3L).map(_._1).toSet === Set(1L, 2L, 3L))
    assert(got.find(_._1 === 4L).get._3 === 1L)
    // Σ weight per cluster = 1 ⇒ total weight = #clusters
    val totalW = got.map(_._4).sum
    assert(math.abs(totalW - 2.0) < 1e-12)
  }

  // ------------------------------------------------ url_normalize/dedup_url

  test("canonUrl folds all four noise variants to the clean form, idempotently") {
    // doc_ids chosen ≡ 0,1,2,3 (mod 4) AND ≡ same item (mod 8): 8,1,2,3
    // share item ids 0,1,2,3 — use ids 0..3 with one source so the four
    // VARIANT shapes all appear; then 8 and 0 collide on the clean form
    val corpus = docs(
      (0L, "x", "srcA"), (1L, "x", "srcA"), (2L, "x", "srcA"),
      (3L, "x", "srcA"), (8L, "x", "srcA"))
    val rows = TextOps.urlNormalize(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).sortBy(_._1)

    // each variant canonicalizes to the clean spelling of ITS item id
    rows.foreach { case (id, _, canon, _) =>
      assert(canon === s"https://srca.example.com/item/${id % 8}",
        s"doc $id") }
    // note: host lowercase applies to EVERY variant (source "srcA" has
    // case noise even in the clean shape — canonicalization fixed it)
    assert(rows.forall(!_._4))
    // the raw spellings really were noisy in the expected ways
    val raw = rows.map(r => r._1 -> r._2).toMap
    assert(raw(1L).contains(":443/") && raw(1L).endsWith("/"))
    assert(raw(2L).contains("utm_source="))
    assert(raw(3L).contains("#sec-3"))
    // idempotence: canonicalizing the canonical form changes nothing
    val twice = corpus.select(
      TextOps.canonUrl(TextOps.canonUrl(
        TextOps.canonUrl(lit("https://SRC.EXAMPLE.COM:443/item/5/?utm_source=a&utm_campaign=b#x"))))
        .as("c")).head().getString(0)
    assert(twice === "https://src.example.com/item/5")

    // review-round edge pins — the cases the synthetic fixture never hits:
    def canon(u: String): String =
      corpus.select(TextOps.canonUrl(lit(u)).as("c")).head().getString(0)
    // ':443' inside a PATH segment is content, not a port
    assert(canon("https://h.com:443/a:443/b") === "https://h.com/a:443/b")
    // 'xutm_source' is a real parameter, not tracking noise
    assert(canon("https://h.com/p?xutm_source=1") === "https://h.com/p?xutm_source=1")
    // utm in the middle and at the head of a longer list
    assert(canon("https://h.com/p?utm_a=1&x=2") === "https://h.com/p?x=2")
    assert(canon("https://h.com/p?a=1&utm_b=2&c=3") === "https://h.com/p?a=1&c=3")
    // path-less URL: the QUERY keeps its case; only the authority lowers
    assert(canon("https://HOST.example.com?Token=AbC")
      === "https://host.example.com?Token=AbC")
    // uppercase scheme spellings fold too
    assert(canon("HTTPS://Host.com/x") === "https://host.com/x")
    // port strips at the END of the authority on a path-less URL
    assert(canon("https://h.com:443?q=1") === "https://h.com?q=1")

    // dedup on the canonical key: 0 and 8 fold into one cluster of 2 with
    // 1 raw variant (both clean-shaped); 1,2,3 are singletons
    val clusters = TextOps.dedupUrl(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(clusters.length === 4)
    val c0 = clusters.find(_._1.endsWith("/item/0")).get
    assert(c0._2 === 0L && c0._3 === 2L && c0._4 === 1L)
  }

  test("dedupUrl counts distinct raw spellings folded per cluster") {
    // ids 2, 10, 18: all ≡ 2 (mod 4) AND ≡ 2 (mod 8) — the same utm-noise
    // raw spelling three times → one cluster, three copies, ONE variant
    val corpus = docs((2L, "x", "s"), (10L, "x", "s"), (18L, "x", "s"))
    val c = TextOps.dedupUrl(corpus).collect()
    assert(c.length === 1)
    assert(c.head.getLong(2) === 3L && c.head.getLong(3) === 1L)
  }

  // ------------------------------------------------------- lang_consistency

  test("langConsistency: diagonal on true labels, off-diagonal flags the planted mislabel") {
    // stopword-bearing texts the detector resolves exactly (LangIdSpec's
    // regime); doc 4 is English text DECLARED German — the label defect
    // this monitor exists to surface
    val corpus = Seq(
      (1L, "the house and the tree with a bird", "en", "s"),
      (2L, "der Hund und die Katze mit einem Vogel", "de", "s"),
      (3L, "el perro y la casa con un gato", "es", "s"),
      (4L, "the cat and the dog with a fish", "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextOps.langConsistency(corpus).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(got(("en", "en")) === ((1L, true)))
    assert(got(("de", "de")) === ((1L, true)))
    assert(got(("es", "es")) === ((1L, true)))
    assert(got(("de", "en")) === ((1L, false)), "the mislabel must surface")
    assert(got.size === 4)
  }

  // ---------------------------------------------------------- validate_chat

  test("validateChat rules each fire on a hand-broken row and stay zero on good data") {
    import graft.ops.PostTrainOps
    def row(rendered: String, spans: String, nChars: Long, nMask: Long,
        nTurns: Long) = (rendered, spans, nChars, nMask, nTurns)
    val good = row("<|user|>\nhi\n<|assistant|>\nyo\n", "25:28", 28L, 3L, 2L)
    val rows = Seq(
      good,
      row("<|assistant|>\nunprompted\n", "", 25L, 0L, 1L), // bad open (+1 unmasked? n_turns=1 → no)
      row("<|user|>\nx\n", "", 11L, 0L, 0L),               // no turns
      row("<|user|>\nhi\n<|assistant|>\nyo\n", "25:99", 28L, 74L, 2L), // out of bounds
      row("<|user|>\nhi\n<|assistant|>\nyo\n<|assistant|>\nzz\n",
        "25:28,27:31", 45L, 7L, 3L),                       // overlapping spans
      row("<|user|>\nhi\n<|assistant|>\nyo\n", "25:28", 28L, 99L, 2L), // mask total wrong
      row("<|user|>\nhi\n<|assistant|>\nyo\n", "", 28L, 0L, 2L)) // assistant but no mask
      .toDF("rendered", "mask_spans", "n_chars", "n_mask_chars", "n_turns")
    val got = PostTrainOps.validateChatRules(rows).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "opens_with_user" -> 1L, "has_turns" -> 1L, "spans_in_bounds" -> 1L,
      "spans_ordered" -> 1L, "mask_total_consistent" -> 1L,
      "masked_when_assistant" -> 1L))
    // the good row alone: all six rules zero
    val clean = PostTrainOps.validateChatRules(Seq(good)
        .toDF("rendered", "mask_spans", "n_chars", "n_mask_chars", "n_turns"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.values.forall(_ == 0L) && clean.size === 6)
    // and the REAL rendered corpus ships clean (chatRender emits
    // well-formed data by construction — the gate certifies it)
    val real = PostTrainOps.validateChat(
      spark.read.parquet(s"$sf/events.parquet")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(real.values.forall(_ == 0L) && real.size === 6)
  }

  // ------------------------------------------------- dup_cluster_histogram

  test("dupClusterHistogram: exact sizes plus the honest singleton row") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val b = "one two three four five six seven eight nine ten " * 3
    val corpus = docs(
      (1L, a, "s"), (2L, a, "s"), (3L, a, "s"),        // 3-cluster
      (4L, b, "s"), (5L, b, "s"),                       // 2-cluster
      (6L, "a completely unrelated document body here", "s"),
      (7L, "another text that matches nothing else at all", "s"))
    val got = TextOps.tokenize(corpus).transform(graft.ops.DedupOps.dupClusterHistogram)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((3L, 1L, 3L), (2L, 1L, 2L), (1L, 2L, 2L)))
  }

  // ----------------------------------------------------------- phrase_match

  test("phraseMatch ≡ naive sliding window; self-overlaps and repeated terms exact") {
    val corpus = docs(
      (1L, "big order scan big order scan ends", "s"),   // 2 matches
      (2L, "the big order scan sits here", "s"),          // 1 match, offset
      (3L, "big scan order", "s"),                        // words, wrong order
      (4L, "a a a b", "s"),                               // repeated-term phrase
      (5L, "big order", "s"))                             // shorter than phrase
    val queries = Seq("big order scan", "a a b")
    val got = TextOps.phraseMatch(corpus, queries).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // naive reference over every (phrase, doc)
    val texts = Map(1L -> "big order scan big order scan ends",
      2L -> "the big order scan sits here", 3L -> "big scan order",
      4L -> "a a a b", 5L -> "big order")
    val expect = (for {
      q <- queries; (id, t) <- texts
      ws = q.split(" ").toSeq; toks = t.split(" ").toSeq
      hits = toks.indices.filter(i =>
        i + ws.length <= toks.length && toks.slice(i, i + ws.length) == ws)
      if hits.nonEmpty
    } yield (q, id) -> ((hits.length.toLong, hits.head.toLong))).toMap
    assert(got === expect)
    // the edges the reference proves: doc 1 matches twice (positions 0, 3);
    // "a a b" matches once in "a a a b" (at 1 — the a,a prefix at 0 fails on b)
    assert(got(("big order scan", 1L)) === ((2L, 0L)))
    assert(got(("a a b", 4L)) === ((1L, 1L)))
    assert(!got.contains(("big order scan", 3L)))
    assert(!got.contains(("big order scan", 5L)))
  }

  // -------------------------------------------------------------- pass_at_k

  test("passAtK ≡ exact combinatorics; NULL below k, exactly 1 when fails < k") {
    import graft.ops.PostTrainOps
    // texts engineered to pass/fail the quality gate deterministically:
    // pass = varied prose-like tokens, fail = one token repeated
    val passTxt = "the quick brown fox jumps over the lazy dog again and again"
    val failTxt = Seq.fill(30)("spam").mkString(" ")
    // group g gets doc_ids g, g+32, g+64, … (the PassGroups modulus)
    def grp(g: Long, nPass: Int, nFail: Int) =
      (0 until nPass).map(i => (g + 32L * i, passTxt, "s")) ++
        (nPass until nPass + nFail).map(i => (g + 32L * i, failTxt, "s"))
    // g0: n=6 c=2 | g1: n=3 < 4 | g2: n=5, fails=2 < 4 | g3: n=6 c=0
    val corpus = docs((grp(0, 2, 4) ++ grp(1, 1, 2) ++ grp(2, 3, 2)
      ++ grp(3, 0, 6)): _*)
    val got = PostTrainOps.passAtK(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap

    def exact(n: Int, c: Int, k: Int): Double = {
      def comb(a: Int, b: Int): Double =
        if (b > a) 0.0 else (0 until b).map(i => (a - i).toDouble / (i + 1)).product
      1.0 - comb(n - c, k) / comb(n, k)
    }
    val g0 = got(0L)
    assert(g0.getAs[Long]("n_candidates") === 6L && g0.getAs[Long]("n_passing") === 2L)
    assert(math.abs(g0.getAs[Double]("pass_at_1") - exact(6, 2, 1)) < 1e-12)
    assert(math.abs(g0.getAs[Double]("pass_at_4") - exact(6, 2, 4)) < 1e-12)
    // n < k → NULL, never a silent 0
    assert(got(1L).isNullAt(got(1L).fieldIndex("pass_at_4")))
    assert(math.abs(got(1L).getAs[Double]("pass_at_1") - 1.0 / 3) < 1e-12)
    // fails < k → some k-subset must contain a pass: exactly 1
    assert(got(2L).getAs[Double]("pass_at_4") === 1.0)
    // no passes → exactly 0 at every k
    assert(got(3L).getAs[Double]("pass_at_1") === 0.0)
    assert(got(3L).getAs[Double]("pass_at_4") === 0.0)
  }

  // ----------------------------------------------- semantic_threshold_sweep

  test("semanticThresholdSweep: monotone in τ and consistent with the decision op") {
    import graft.ops.DedupOps
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val rows = DedupOps.semanticThresholdSweep(emb).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1) === graft.ops.DedupOps.SweepThresholds)
    // tightening τ can only shrink both counts
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._2 <= lo._2 && hi._3 <= lo._3, s"not monotone: $lo -> $hi") }
    // the τ = SemanticDupThreshold row must equal the decision op's drops
    val atShipped = rows.find(_._1 == DedupOps.SemanticDupThreshold).get
    val dropped = DedupOps.dedupSemantic(emb)
      .filter(!col("keep")).count()
    assert(atShipped._3 === dropped,
      "the sweep and the decision op disagree at the shipped threshold")
    assert(rows.head._2 > rows.last._2, "the fixture must spread across τ")
  }

  // ---------------------------------------------------- quality_feature_corr

  test("qualityFeatureCorr: ±1 on engineered colinearity, NULL on zero variance") {
    // n_chars is an exact linear function of n_tokens here (every token
    // 4 chars + 1 space, built to keep the relation affine) → corr = 1;
    // n_stop is constant 0 → its pairs are NULL
    val corpus = docs(
      (1L, Seq.fill(2)("abcd").mkString(" "), "s"),
      (2L, Seq.fill(5)("abcd").mkString(" "), "s"),
      (3L, Seq.fill(9)("abcd").mkString(" "), "s"))
    val got = TextOps.qualityFeatureCorr(corpus).collect()
      .map(r => r.getString(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got.size === 6)
    assert(math.abs(got("n_tokens:n_chars").get - 1.0) < 1e-12)
    assert(math.abs(got("n_tokens:n_alpha").get - 1.0) < 1e-12)
    assert(got("n_tokens:n_stop").isEmpty, "zero-variance feature must be NULL")
    assert(got("n_stop:n_chars").isEmpty)
  }

  // --------------------------------------------------------- knn_communities

  test("labelPropagate splits bridged triangles components would fuse") {
    import graft.ops.SimilarityOps
    // two triangles {1,2,3} and {4,5,6} joined by ONE bridge edge 3—4:
    // connected components see one blob; LP's mode rule cuts the bridge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("src", "dst")
    val got = SimilarityOps.labelPropagate(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCommunity = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCommunity.values.toSet === Set(Set(1L, 2L, 3L), Set(4L, 5L, 6L)),
      s"LP must recover the two triangles, got $byCommunity")
    assert(got.forall(_._3 === 3L))
  }

  // -------------------------------------------- community_representatives

  test("communityRepresentatives ≡ composing the two graph ops by hand") {
    import graft.ops.SimilarityOps
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val comm = SimilarityOps.knnCommunities(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq // (vec, community)
    val pr = SimilarityOps.knnPagerank(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // vec -> pr_micro
    val expect = comm.groupBy(_._2).map { case (c, ms) =>
      val best = ms.map(_._1).minBy(v => (-pr(v), v))
      (c, best, pr(best), ms.length.toLong)
    }.toSet
    val got = SimilarityOps.communityRepresentatives(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expect)
    assert(got.nonEmpty && got.size > 1)
  }

  // ----------------------------------------------------------- corpus_to_sft

  test("corpusToSft: the completion-less gate fires and the pack matches a hand-gated recompose") {
    import graft.ops.PostTrainOps
    val events = spark.read.parquet(s"$sf/events.parquet")
    val rendered = PostTrainOps.chatRender(events)
    // the gate must have something real to drop on this fixture
    val dropped = rendered.filter(col("n_turns") < 2 || col("n_mask_chars") < 1)
    assert(dropped.count() > 0, "fixture must contain completion-less sessions")

    val got = PostTrainOps.corpusToSft(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toMap
    val all = PostTrainOps.chatPackSpans(events).collect()
    assert(got.size < all.length,
      "gating must produce fewer sequences than packing everything")
    // spans still tile consistently: mask_chars equals the reparsed span sum
    got.values.foreach { case (_, nSpans, maskChars, spans) =>
      val parsed = spans.split(",").filter(_.nonEmpty)
        .map { s => val Array(a, b) = s.split(":").map(_.toLong); (a, b) }
      assert(parsed.length.toLong === nSpans)
      assert(parsed.map(p => p._2 - p._1).sum === maskChars)
      assert(parsed.forall(p => p._1 >= 0 && p._2 <= graft.ops.PretrainOps.SeqLen))
    }
  }

  // -------------------------------------------------------------- turn_stats

  test("turnStats: counts conserve and mask fraction is the exact micro mean") {
    import graft.ops.PostTrainOps
    val events = spark.read.parquet(s"$sf/events.parquet")
    val rendered = PostTrainOps.chatRender(events).collect()
      .map(r => (r.getAs[Long]("n_turns"), r.getAs[Long]("n_chars"),
        r.getAs[Long]("n_mask_chars")))
    val got = PostTrainOps.turnStats(events).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.values.map(_._1).sum === rendered.length.toLong)
    rendered.groupBy(_._1).foreach { case (nt, rows) =>
      val (n, sc, mf) = got(nt)
      assert(n === rows.length.toLong && sc === rows.map(_._2).sum)
      val micros = rows.map(r =>
        if (r._2 > 0) math.floor(r._3 * 1000000.0 / r._2).toLong else 0L)
      assert(math.abs(mf - micros.sum.toDouble / rows.length / 1e6) < 1e-12)
    }
    // single-turn conversations exist and have mask fraction 0 (no
    // assistant turn) — the row corpus_to_sft's gate is about
    assert(got.contains(1L) && got(1L)._3 === 0.0)
  }

  // ---------------------------------- event_window_counts / norm histogram

  test("eventWindowCounts: exact hour buckets, counts and micro sums conserve") {
    import graft.ops.SessionOps
    val h = 3600L * 1000000 // one window in micros
    val ts = (us: Long) => new java.sql.Timestamp(us / 1000)
    val events = Seq(
      (1L, ts(10L), 7L, "click", 1.25),
      (2L, ts(h - 1), 7L, "click", 2.5),   // same hour as event 1
      (3L, ts(h + 5), 7L, "click", 0.5),   // next hour
      (4L, ts(10L), 8L, "view", 1.0))      // same hour, other type
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = SessionOps.eventWindowCounts(events).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === Map(
      (0L, "click") -> ((2L, 3750000L)),
      (h, "click") -> ((1L, 500000L)),
      (0L, "view") -> ((1L, 1000000L))))
  }

  test("embedNormHistogram: exact bins, zero-spike visible, cap clamps the tail") {
    import graft.ops.PretrainOps
    def vec(xs: Float*) = xs.toArray
    val emb = Seq(
      (1L, vec(0f, 0f), 0),      // norm 0      -> bin 0 (the collapse alarm)
      (2L, vec(0.3f, 0.4f), 0),  // norm 0.5    -> bin 5
      (3L, vec(0.6f, 0.8f), 0),  // norm 1.0    -> bin 10
      (4L, vec(30f, 40f), 0))    // norm 50     -> clamped to cap
      .toDF("vec_id", "embedding", "label")
    val got = PretrainOps.embedNormHistogram(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(
      0L -> ((1L, 0.0)), 5L -> ((1L, 0.5)), 10L -> ((1L, 1.0)),
      PretrainOps.NormHistCap -> ((1L, 2.0))))
  }

  // -------------------------------------------------------- mixture_realized

  test("mixtureRealized: shares sum to 1, unclamped rates encode one feasible budget") {
    import graft.ops.PretrainOps
    val got = PretrainOps.mixtureRealized(
      spark.read.parquet(s"$sf/documents.parquet")).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    assert(math.abs(got.values.map(_._4).sum - 1.0) < 1e-9)
    // the binding source (smallest tokens/target ratio) is clamped at
    // keep_rate 1 by construction of the largest-feasible-budget rule
    assert(got.values.exists(_._2 == 1.0))
    // the DETERMINISTIC invariant (realized counts carry doc-level
    // Bernoulli variance — ~8 kept docs per source here — so they are
    // REPORTED, not asserted): for every unclamped source,
    // keep_rate·src_tokens⁄target_w equals the one feasible budget rmin
    val srcTok = graft.ops.TextOps.tokenize(
      spark.read.parquet(s"$sf/documents.parquet"))
      .groupBy("source")
      .agg(sum(size(col("toks"))).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgets = got.collect { case (s, (tw, kr, _, _)) if kr < 1.0 =>
      kr * srcTok(s) / tw }
    assert(budgets.nonEmpty &&
      budgets.max - budgets.min < 1e-6 * budgets.max,
      s"unclamped keep rates must encode ONE feasible budget: $budgets")
  }

  // ------------------------------------------------------ degenerate inputs

  test("degenerate inputs: empty corpus, null/empty text, single doc") {
    import graft.ops.{DedupOps, PostTrainOps, PretrainOps}
    val empty = docs()
    // every new batch op returns an empty (or constant-shape) frame on an
    // empty corpus, never a throw
    assert(PretrainOps.tokenBudgetFill(empty).count() === 0L)
    assert(DedupOps.dedupPrefix(empty).count() === 0L)
    assert(DedupOps.softDedupWeight(empty).count() === 0L)
    assert(TextOps.htmlExtract(empty).count() === 0L)
    assert(TextOps.urlNormalize(empty).count() === 0L)
    assert(TextOps.dedupUrl(empty).count() === 0L)
    assert(TextOps.langConsistency(
      Seq.empty[(Long, String, String, String)]
        .toDF("doc_id", "text", "lang", "source")).count() === 0L)
    assert(TextOps.phraseMatch(empty).count() === 0L)
    assert(PostTrainOps.passAtK(empty).count() === 0L)
    // the rule table keeps its six rows (all zero) even over nothing —
    // a gate that vanishes on an empty input reads as "no violations"
    val chatRules = PostTrainOps.validateChatRules(
      Seq.empty[(String, String, Long, Long, Long)]
        .toDF("rendered", "mask_spans", "n_chars", "n_mask_chars", "n_turns"))
      .collect()
    assert(chatRules.length === 6 && chatRules.forall(_.getLong(1) === 0L))

    // null and empty text: tokens() folds null ≡ '' (one empty token)
    val nulls = docs((1L, null, "s"), (2L, "", "s"))
    assert(PretrainOps.tokenBudgetFill(nulls).count() === 2L) // n_tok=1 each
    assert(DedupOps.dedupPrefix(nulls).count() === 1L)        // same empty prefix
    // content-hash semantics (dedupExact's): null text hashes NULL — its
    // own cluster, distinct from md5('') — engines agree, so soft dedup
    // emits two singleton clusters here, not one pair
    val soft = DedupOps.softDedupWeight(nulls).collect()
    assert(soft.length === 2 && soft.forall(_.getLong(2) === 1L))
    val h = TextOps.htmlExtract(nulls).collect()
    assert(h.length === 2 && h.forall(_.getAs[String]("title") === ""))
    assert(h.forall(r => !r.isNullAt(r.fieldIndex("link_density"))))
    assert(TextOps.phraseMatch(nulls).count() === 0L)

    // single doc: budget fill admits it with cum_before 0
    val one = PretrainOps.tokenBudgetFill(docs((9L, "just one doc", "s"))).collect()
    assert(one.length === 1 && one.head.getAs[Long]("cum_before") === 0L)
  }

  // ---------------------------------------------------------- html_extract

  test("htmlExtract: title, strip, anchor accounting, chrome gate") {
    val longBody = (1 to 60).map("word" + _).mkString(" ")
    val corpus = docs(
      (3L, "tiny body", "s"),      // doc_id%3=0 → promo div injected
      (4L, longBody, "s"))         // no promo, long body
    val got = TextOps.htmlExtract(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap

    val tiny = got(3L)
    assert(tiny.getAs[String]("title") === "tiny body")
    // anchors: "home"(4) + "about us"(8) + promo(41) = 53
    assert(tiny.getAs[Long]("n_anchor_chars") === 53L)
    val ex = tiny.getAs[String]("extracted")
    assert(ex.contains("tiny body") && ex.contains("home about us")
      && !ex.contains("<"))
    assert(tiny.getAs[Boolean]("is_chrome"),
      "chrome-dominated short page must trip the link-density gate")

    val long = got(4L)
    assert(long.getAs[String]("title") === "word1 word2 word3")
    assert(long.getAs[Long]("n_anchor_chars") === 12L)
    assert(!long.getAs[Boolean]("is_chrome"))
    // density algebra is exactly anchors/extracted
    assert(math.abs(long.getAs[Double]("link_density") -
      12.0 / long.getAs[String]("extracted").length) < 1e-12)
  }
}
