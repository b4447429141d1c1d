package graft

import org.apache.spark.sql.functions._
import graft.ops.{BinaryOps, DedupOps, SimilarityOps, TextOps}

/** Specs for the training-data pipeline operators (dedup / similarity /
  * text / multimodal) on planted fixtures + the documents table.
  */
class TrainingOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private def ccResult(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Boolean)] =
    df.select("component_id", "doc_id", "is_rep")
      .as[(Long, Long, Boolean)].collect().toSet

  test("connectedComponentsStar ≡ min-label propagation on a deep chain (log-d rounds)") {
    // a 60-hop path: min-label needs 60 rounds (diameter), star contraction
    // a handful — the default maxRounds=30 would FAIL if rounds were O(d)
    val chain = (0L until 60L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("doc_a", "doc_b")
    val star = ccResult(DedupOps.connectedComponentsStar(chain))
    val iter = ccResult(DedupOps.connectedComponents(chain, maxIter = 100))
    assert(star == iter)
    assert(star.forall(_._1 == 0L), "one chain ⇒ one component rooted at 0")
  }

  test("connectedComponentsStar ≡ min-label propagation on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 10
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .toDF("doc_a", "doc_b")
      val star = ccResult(DedupOps.connectedComponentsStar(edges))
      val iter = ccResult(DedupOps.connectedComponents(edges, maxIter = 100))
      assert(star == iter, s"trial $trial diverged")
    }
  }

  test("connectedComponentsStar ≡ min-label propagation on the real LSH pair graph") {
    val pairs = DedupOps.dedupMinhashLsh(docs).select("doc_a", "doc_b")
    val star = ccResult(DedupOps.connectedComponentsStar(pairs))
    val iter = ccResult(DedupOps.dedupComponents(docs))
    assert(star == iter)
  }

  test("annRecall: one row per (method, query), recall bounded, exact self-recall is 1") {
    val r = SimilarityOps.annRecall(emb)
      .select("method", "query_id", "recall")
      .as[(String, Long, Double)].collect()
    // four methods: lsh_bucket, ivf_probe, ivfpq_probe, pca_refine
    assert(r.length == 4 * SimilarityOps.NQueries)
    assert(r.map(_._1).toSet ==
      Set("lsh_bucket", "ivf_probe", "ivfpq_probe", "pca_refine"))
    assert(r.forall { case (_, _, rec) => rec >= 0.0 && rec <= 1.0 })
    // sanity: brute force against itself would be 1.0 — the measurement
    // machinery must report perfect recall for a perfect method
    val bf = SimilarityOps.annTopkBruteForce(emb).select("query_id", "neighbor_id")
    val self = bf.join(bf.withColumn("hit", lit(1L)), Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1))).as("recall"))
      .as[(Long, Double)].collect()
    assert(self.forall(_._2 == 1.0))
  }

  test("dedupAgainstIndex: exact hit, near hit, and novel doc classified correctly") {
    // long unique-token text: a one-word edit leaves Jaccard ≈ 0.85, high
    // enough that at least one of the 4 LSH bands collides (deterministic
    // given the fixed md5 hash family — verified, not probabilistic)
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango " +
      "uniform victor whiskey xray yankee zulu one two three four five six " +
      "seven eight nine ten eleven twelve"
    val history = Seq(
      (10L, base),
      (11L, "completely different text about database engines and query planners " * 3)
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (100L, base),                                  // exact duplicate of 10
      (101L, base.replace("oscar", "oskar")),        // near-dup of 10
      (102L, "entirely novel content never seen before in any corpus at all " * 3)
    ).toDF("doc_id", "text")
    val out = DedupOps.dedupAgainstIndex(incoming, history)
      .select("doc_id", "is_exact_dup", "near_dup_of", "keep")
      .as[(Long, Boolean, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(100L)._1, "exact dup not flagged")
    assert(!out(100L)._3, "exact dup kept")
    assert(out(101L)._2.contains(10L), "near dup not linked to history doc")
    assert(!out(101L)._3, "near dup kept")
    assert(out(102L) == ((false, None, true)), "novel doc not kept")
  }

  test("tokenHash: first 8 hex of md5, engine-independent definition") {
    // md5("spark") = 98f11b7a7880169c3bd62a5a3f4b1327 → 0x98f11b7a
    val got = Seq("spark").toDF("t").select(TextOps.tokenHash($"t")).as[Long].head()
    assert(got == java.lang.Long.parseLong("98f11b7a", 16))
  }

  test("quality score stays in [0,1] and ratios are sane") {
    val q = TextOps.qualityScore(docs)
    assert(q.filter($"quality" < 0 || $"quality" > 1).count() == 0)
    assert(q.filter($"alpha_ratio" < 0 || $"alpha_ratio" > 1).count() == 0)
    assert(q.count() == docs.count())
  }

  test("empty text: quality is NULL (not NaN) and the corpus gate drops it") {
    import graft.ops.CorpusOps
    val good = "the of and to " + (1 to 60).map(i => s"token$i").mkString(" ")
    val planted = Seq((1L, good), (2L, "")).toDF("doc_id", "text")
    val q = TextOps.qualityScore(planted)
    assert(q.filter($"doc_id" === 2 && $"quality".isNull).count() == 1,
      "empty doc must score NULL, not NaN (NaN would pass >= gates)")
    val out = CorpusOps.cleanCorpus(planted).select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L), s"empty doc must be gated out, got $out")
  }

  test("quality_linear_score: hand-computed logit, additive over tokens, sign gate") {
    // weight of one token, computed via the published formula from its hash
    def w(tok: String): Long = {
      val h = Seq(tok).toDF("t").select(TextOps.tokenHash($"t")).as[Long].head()
      ((h % TextOps.LinearBuckets + 1L) * 2654435761L) % TextOps.LinearWeightMod - 1000L
    }
    val planted = Seq((1L, "spark"), (2L, "spark catalyst"), (3L, null: String))
      .toDF("doc_id", "text")
    val out = TextOps.qualityLinearScore(planted)
      .select("doc_id", "n_tokens", "logit_micro", "accept")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L)._2 == w("spark"), "single-token logit must equal its bucket weight")
    assert(out(2L)._2 == w("spark") + w("catalyst"), "logit must be additive over tokens")
    // null text folds like empty text: tokens('') = [''] → one empty token
    assert(out(3L)._1 == 1L && out(3L)._2 == w(""),
      "null doc must score as the single-empty-token doc")
    assert(out.values.forall(v => v._3 == (v._2 > 0L)), "accept must be the logit-sign gate")
  }

  test("quality_linear_score plans as a zero-shuffle narrow projection") {
    val plan = TextOps.qualityLinearScore(docs).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("hashpartitioning"),
      s"in-row logit fold must not shuffle:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"weights are arithmetic, not a join:\n$plan")
  }

  test("lang_id emits only profiled languages") {
    val langs = TextOps.langId(docs).select("detected_lang")
      .distinct().as[String].collect().toSet
    assert(langs.subsetOf(TextOps.StopwordProfiles.map(_._1).toSet))
  }

  test("doc_fingerprint is deterministic and content-derived") {
    val a = TextOps.docFingerprint(docs).as[(Long, Long, Long)].collect().toMap2
    val b = TextOps.docFingerprint(docs).as[(Long, Long, Long)].collect().toMap2
    assert(a == b)
  }

  implicit private class Arr(xs: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, Long] = xs.map(t => t._1 -> t._3).toMap
  }

  test("quality_gopher_gates: each published rule trips on its planted violator") {
    val good = "the of and to be that have with " +
      (1 to 50).map(i => s"word$i").mkString(" ") // 58 words, all sane
    val tooShort = "the of and to be small"       // < 50 words
    val symbols = "the of and to " + (1 to 50).map(_ => "x#").mkString(" ") +
      " ..." // 55 words, 50 '#' → hash ratio > 0.1
    val digits = (1 to 60).map(i => s"$i$i$i").mkString(" ") // no letters, no stopwords
    val shortWords = "the of and to " +
      (1 to 60).map(i => ('a' + i % 26).toChar.toString).mkString(" ") // mean len < 3
    // per-symbol semantics: 100 words with 6 '#' AND 6 '…' — each ratio
    // 0.06 ≤ 0.1, so the PUBLISHED per-symbol gate passes (a combined
    // 12/100 > 0.1 gate would wrongly fail it); Unicode ellipsis counts
    val perSym = "the of and to be that have with " +
      (1 to 86).map(i => s"word$i").mkString(" ") +
      " #a #b #c #d #e #f w… x… y… z… u… v…"
    val planted = Seq(
      (1L, good), (2L, tooShort), (3L, symbols), (4L, digits),
      (5L, shortWords), (6L, perSym)
    ).toDF("doc_id", "text")
    val out = TextOps.qualityGopherGates(planted)
      .select("doc_id", "g_count", "g_wordlen", "g_symbol", "g_alpha", "g_stop", "pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out(1L) == ((true, true, true, true, true, true)), s"good doc: ${out(1L)}")
    assert(!out(2L)._1 && !out(2L)._6, "short doc must fail g_count")
    assert(!out(3L)._3 && !out(3L)._6, "hash soup must fail g_symbol")
    assert(!out(4L)._4 && !out(4L)._5 && !out(4L)._6,
      "digit soup must fail g_alpha and g_stop")
    assert(!out(5L)._2 && !out(5L)._6, "one-char words must fail g_wordlen")
    assert(out(6L)._3, "0.06 per-symbol ratios must PASS the per-symbol gate")
    // Unicode ellipsis IS counted: 11 '…' in 104 words fails
    val uniSpam = "the of and to " + (1 to 89).map(i => s"w$i").mkString(" ") +
      " " + (1 to 11).map(_ => "e…").mkString(" ")
    val u = TextOps.qualityGopherGates(Seq((7L, uniSpam)).toDF("doc_id", "text"))
      .select("g_symbol").as[Boolean].head()
    assert(!u, "Unicode … above 0.1 must fail g_symbol")
    // null ≡ empty text: one '' token, fails count, never NULL-passes
    val nulls = Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val n9 = TextOps.qualityGopherGates(nulls)
      .select("pass").as[Boolean].head()
    assert(!n9)
  }

  test("dedup_containment: one-directional for small-in-large, both ways for exact dups") {
    val wA = (1 to 20).map(i => s"c$i").mkString(" ") // 13 8-grams
    val wB = (1 to 40).map(i => s"c$i").mkString(" ") // 33 8-grams ⊇ A's 13
    val planted = Seq(
      (1L, wA), (2L, wB), (4L, wA),
      (3L, "completely different content with nothing shared at all here ok")
    ).toDF("doc_id", "text")
    val out = DedupOps.dedupContainment(planted)
      .select("doc_a", "doc_b", "n_a", "n_eligible", "n_capped", "shared", "containment")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    // A ⊂ B reports A→B only (B→A = 13/33 < 0.5: B's unique df=1 grams
    // are evidence AGAINST containment and stay in the denominator);
    // the exact dup pair (1,4) reports both directions at 1.0
    assert(out.keySet == Set((1L, 2L), (4L, 2L), (1L, 4L), (4L, 1L)), s"got $out")
    assert(out((1L, 2L)) == ((13L, 13L, 0L, 13L, 1.0)))
    assert(out((4L, 2L)) == ((13L, 13L, 0L, 13L, 1.0)))
    assert(out((1L, 4L)) == ((13L, 13L, 0L, 13L, 1.0)))
  }

  test("winnowing: shared-run guarantee, density bound, pair detection") {
    import graft.ops.DedupOps
    // guarantee: a shared run of >= WinnowWindow + ShingleWords - 1 (= 6)
    // tokens produces at least one shared fingerprint, regardless of the
    // differing context around it
    val run = "alpha bravo charlie delta echo foxtrot"
    val docs = Seq(
      (1L, s"one two three $run seven eight nine ten eleven twelve"),
      (2L, s"uno dos tres $run cuatro cinco seis siete ocho nueve"),
      (3L, "completely different words with no overlap at all whatsoever here"))
      .toDF("doc_id", "text")
    val fps = DedupOps.winnowFingerprint(docs).as[(Long, Long)].collect()
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty,
      "shared 6-token run must yield a shared winnow fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)
    // density: distinct fingerprints never exceed gram positions
    for ((d, s) <- fps) {
      val nTokens = docs.filter(col("doc_id") === d)
        .select(size(split(col("text"), "\\s+"))).as[Int].head()
      assert(s.size <= math.max(nTokens - 2, 1), s"doc $d over-dense")
    }
    // pairwise: identical docs reach jaccard 1.0; the unrelated doc pairs
    // with nobody
    val twins = Seq((1L, run + " " + run), (2L, run + " " + run),
      (3L, "nothing in common with the twins at all in any way truly"))
      .toDF("doc_id", "text")
    val pairs = DedupOps.dedupWinnow(twins)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)), s"got ${pairs.toSeq}")
  }

  test("vocab_coverage: top-K membership ratio, empty doc NULL") {
    import graft.ops.PretrainOps
    // 16 common words (2 occurrences each) fill the top-16; 4 rare words
    // (1 each) rank below it
    val common = (1 to 16).map(i => f"w$i%02d")
    val docA = (common ++ common).mkString(" ")
    val docs = Seq((1L, docA), (2L, "r1 r2 r3 r4"), (3L, ""))
      .toDF("doc_id", "text")
    val out = PretrainOps.vocabCoverage(docs)
      .select("doc_id", "n_tokens", "n_in_vocab")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((32L, 32L)), 2L -> ((4L, 0L)), 3L -> ((0L, 0L))),
      s"got $out")
    val cov = PretrainOps.vocabCoverage(docs)
      .select("doc_id", "coverage").as[(Long, Option[Double])].collect().toMap
    assert(cov(1L).contains(1.0) && cov(2L).contains(0.0) && cov(3L).isEmpty)
  }

  test("dedup_exact groups identical normalized content") {
    val planted = Seq(
      (1L, "Hello,   World!"), (2L, "hello world"), (3L, "different text")
    ).toDF("doc_id", "text")
    val groups = DedupOps.dedupExact(planted)
      .select("rep_doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(groups == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH finds a planted near-duplicate, skips unrelated docs") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"token$i").mkString(" ")
    val other = (100 to 140).map(i => s"word$i").mkString(" ")
    val planted = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = DedupOps.dedupMinhashLsh(planted)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical text → identical signature; hamming pairs found") {
    val planted = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val sigs = DedupOps.simhashSignature(planted).as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = DedupOps.dedupSimhash(planted)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("band-bucket cap bounds pair count on an adversarial clustered corpus") {
    // 200 identical docs: every doc shares EVERY band bucket → uncapped
    // candidate space is C(200,2) = 19,900 pairs. The cap must bound it to
    // pairs among the first `cap` doc_ids only: C(cap,2).
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val planted = (1L to 200L).map(i => (i, text)).toDF("doc_id", "text")
    val cap = 8
    val expected = cap * (cap - 1) / 2
    val lsh = DedupOps.dedupMinhashLsh(planted, bucketCap = cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(lsh.length == expected, s"lsh pairs ${lsh.length} != $expected")
    assert(lsh.forall(p => p._1 <= cap && p._2 <= cap),
      "capped bucket must keep the first doc_ids (deterministic order)")
    val sim = DedupOps.dedupSimhash(planted, bucketCap = cap)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(sim.length == expected, s"simhash pairs ${sim.length} != $expected")
    assert(sim.forall(p => p._1 <= cap && p._2 <= cap))
  }

  test("connected components: transitive chains collapse to min-label clusters") {
    // chain 1-2-3 (no 1-3 edge) + isolated pair 7-9: two components
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(pairs)
      .select("component_id", "doc_id", "is_rep")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, true), (1L, 2L, false), (1L, 3L, false),
      (7L, 7L, true), (7L, 9L, false)))
  }

  test("connected components: a long chain converges (diameter rounds)") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val comps = DedupOps.connectedComponents(chain)
      .select("component_id").distinct().as[Long].collect().toSeq
    assert(comps == Seq(1L), "all chain members must join component 1")
  }

  test("connected components: exceeding maxIter throws instead of returning split clusters") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      DedupOps.connectedComponents(chain, maxIter = 3)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedup_survivors: quality beats the id tie-break; singletons keep themselves") {
    // docs 1 and 2 carry the SAME token sequence (identical shingles →
    // jaccard 1.0 → one cluster), but doc 1 is double-spaced: more chars,
    // same letters → lower alpha ratio → lower quality. The survivor must
    // be the HIGHER-quality doc 2 even though the component id (min
    // doc_id) is 1.
    val toks = (1 to 40).map(i => s"token$i")
    val planted = Seq(
      (1L, toks.mkString("  ")),
      (2L, toks.mkString(" ")),
      (3L, (100 to 140).map(i => s"word$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = DedupOps.dedupSurvivors(planted)
      .select("doc_id", "component_id", "survivor_doc_id", "n_members", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 2L, 2L, false)))
    assert(out(2L) == ((2L, 1L, 2L, 2L, true)))
    assert(out(3L) == ((3L, 3L, 3L, 1L, true)))
  }

  test("dedup_survivors covers the corpus with one survivor per cluster") {
    val out = DedupOps.dedupSurvivors(docs).cache()
    try {
      assert(out.count() == docs.count(), "one decision row per corpus doc")
      val comps = DedupOps.dedupComponents(docs)
      val nClusters = comps.select("component_id").distinct().count()
      val clustered = comps.count()
      val kept = out.filter($"keep").count()
      assert(kept == docs.count() - clustered + nClusters,
        "keep = everything minus (cluster members - one survivor each)")
      // the survivor of every cluster is a member of that cluster
      val badSurv = out.filter($"n_members" > 1)
        .select($"component_id", $"survivor_doc_id".as("doc_id"))
        .distinct()
        .join(comps, Seq("component_id", "doc_id"), "left_anti")
      assert(badSurv.count() == 0)
    } finally { out.unpersist(); () }
  }

  test("signature-table checkpoint path: parquet materialization matches the cached path") {
    val base = (1 to 40).map(i => s"token$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"token$i").mkString(" ")
    val planted = Seq((1L, base, "s1"), (2L, nearDup, "s1"),
      (3L, "totally different words", "s1")).toDF("doc_id", "text", "source")
    def run() = (
      DedupOps.dedupMinhashLsh(planted).collect().toSet,
      DedupOps.dedupNgramJaccard(planted).collect().toSet)
    val cached = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(DedupOps.CheckpointDirConf, dir)
    try {
      val ckpt = run()
      assert(ckpt == cached)
      val written = new java.io.File(dir).list()
      assert(written != null && written.exists(_.startsWith("minhash_signatures")),
        s"checkpoint parquet not written: ${Option(written).map(_.toSeq)}")
    } finally spark.conf.unset(DedupOps.CheckpointDirConf)
  }

  test("ngram jaccard: self-similar pair found within source block") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val planted = Seq(
      (1L, t, "s1"), (2L, t + " tail", "s1"), (3L, "completely unrelated words here", "s1"),
      (4L, t, "s2") // same text, different block → never paired with 1
    ).toDF("doc_id", "text", "source")
    val pairs = DedupOps.dedupNgramJaccard(planted)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L))
  }

  test("brute-force ANN: planted nearest vector ranks first") {
    val q = Array.fill(8)(1.0f)
    val near = q.map(x => x * 0.9f + 0.01f)
    val far = Array.fill(8)(-1.0f)
    val mid = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val planted = Seq((0L, q, 0), (10L, near, 0), (11L, far, 0), (12L, mid, 0))
      .toDF("vec_id", "embedding", "label")
    val top = SimilarityOps.annTopkBruteForce(planted)
      .filter($"query_id" === 0 && $"rank" === 1)
      .select("neighbor_id").as[Long].head()
    assert(top == 10L)
  }

  test("PQ encode: one in-range code per (vector, subspace)") {
    val codes = SimilarityOps.pqEncode(emb).cache()
    try {
      assert(codes.count() == emb.count() * SimilarityOps.PqSubspaces)
      assert(codes.filter($"code" < 0 || $"code" >= SimilarityOps.PqCodes)
        .count() == 0)
      assert(codes.groupBy("vec_id", "subspace").count()
        .filter($"count" =!= 1).count() == 0)
    } finally { codes.unpersist(); () }
  }

  test("IVFADC probe: full rank lists ordered by ADC score; score algebra matches by-hand PQ") {
    val res = SimilarityOps.annIvfPqProbe(emb).cache()
    try {
      val perQ = res.groupBy("query_id").agg(
        count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
      assert(perQ.filter($"n" =!= SimilarityOps.TopK || $"lo" =!= 1 ||
        $"hi" =!= SimilarityOps.TopK).count() == 0)
      // rank order consistent with approximate distance (asc)
      for ((_, rows) <- res.select("query_id", "rank", "approx_d2")
          .as[(Long, Long, Double)].collect().groupBy(_._1)) {
        val byRank = rows.sortBy(_._2).map(_._3)
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      }
      // ADC algebra: approx_d2(q, n) must equal the dist from q's subvector
      // to the codebook entry n ENCODED to, summed over subspaces
      val top = res.filter($"rank" === 1).orderBy("query_id").head()
      val qid = top.getAs[Long]("query_id")
      val nid = top.getAs[Long]("neighbor_id")
      val got = top.getAs[Double]("approx_d2")
      val vecs = emb.filter($"vec_id".isin(qid, nid))
        .select($"vec_id", $"embedding".cast("array<double>"))
        .as[(Long, Array[Double])].collect().toMap
      def d2(v: Array[Double], off: Int, c: IndexedSeq[Double]): Double =
        (0 until SimilarityOps.PqSubDim)
          .map(d => { val x = v(off + d) - c(d); x * x }).sum
      val expect = (0 until SimilarityOps.PqSubspaces).map { m =>
        val off = m * SimilarityOps.PqSubDim
        val dists = (0 until SimilarityOps.PqCodes)
          .map(j => d2(vecs(nid), off, SimilarityOps.pqCentroid(m, j)))
        val code = dists.indexOf(dists.min)
        d2(vecs(qid), off, SimilarityOps.pqCentroid(m, code))
      }.sum
      assert(math.abs(expect - got) < 1e-9, s"ADC $got vs by-hand $expect")
    } finally { res.unpersist(); () }
  }

  test("LSH bucket: identical vectors share a bucket; ANN neighbors come from own bucket") {
    val e = SimilarityOps.withNorm(emb)
      .withColumn("bucket", SimilarityOps.lshBucket($"emb_d"))
    val nBuckets = e.select("bucket").distinct().count()
    assert(nBuckets > 1 && nBuckets <= (1L << SimilarityOps.LshPlanes))
    val res = SimilarityOps.annLshBucket(emb)
    val qb = e.filter($"vec_id" < SimilarityOps.NQueries)
      .select($"vec_id", $"bucket".as("qbucket"))
    val joined = res.join(qb, res("query_id") === qb("vec_id"))
    assert(joined.filter($"bucket" =!= $"qbucket").count() == 0)
  }

  test("IVF probe: neighbors come only from the query's probed centroid lists") {
    val res = SimilarityOps.annIvfProbe(emb).cache()
    assert(res.count() > 0)
    assert(res.select("query_id").distinct().count() <= SimilarityOps.NQueries)
    // every returned neighbor's centroid must be one of its query's probes
    val nCentsPerQuery = res.groupBy("query_id")
      .agg(countDistinct("centroid").as("n")).select("n").as[Long].collect()
    assert(nCentsPerQuery.forall(_ <= SimilarityOps.IvfProbes))
    res.unpersist()
  }

  test("dedup_lsh_recall: found ⊆ truth; planted exact dup is always recalled") {
    val t = "one two three four five six seven eight nine ten eleven twelve"
    val planted = Seq(
      (1L, t), (2L, t), // identical → J=1, identical signatures → found
      (3L, "completely different words in this unrelated document body here")
    ).toDF("doc_id", "text")
    val row = DedupOps.dedupLshRecall(planted).collect()(0)
    assert(row.getAs[Long]("n_true") == 1L)
    assert(row.getAs[Long]("n_found") == 1L)
    assert(row.getAs[Double]("recall") == 1.0)
    // on the real corpus: found never exceeds truth, recall ∈ [0,1]
    val real = DedupOps.dedupLshRecall(docs).collect()(0)
    assert(real.getAs[Long]("n_found") <= real.getAs[Long]("n_true"))
    val r = real.getAs[Double]("recall")
    assert(real.getAs[Long]("n_true") == 0 || (r >= 0.0 && r <= 1.0))
    // deterministic sampling: the monitor's scale knob only shrinks truth
    val sampledRow = DedupOps.dedupLshRecall(docs, sampleMod = 2).collect()(0)
    assert(sampledRow.getAs[Long]("n_true") <= real.getAs[Long]("n_true"))
  }

  test("dedup_lsh_recall truthDfCap: hot-gram guard truncates the truth index and reports it") {
    // one boilerplate shingle shared by all 10 docs (the degenerate gram
    // that inflates the uncapped ground-truth self-join by C(10,2) pairs)
    val hot = "shared boilerplate line"
    val docs10 = (1L to 10L).map(i =>
      (i, s"$hot unique$i worda$i wordb$i wordc$i wordd$i")).toDF("doc_id", "text")
    val capped = DedupOps.dedupLshRecall(docs10, truthDfCap = 3).collect()(0)
    assert(capped.getAs[Long]("n_capped_grams") >= 1L,
      "the planted hot gram must be reported as capped")
    // the default ∞ cap is the exact complete-truth path, zero capped
    val un = DedupOps.dedupLshRecall(docs10).collect()(0)
    assert(un.getAs[Long]("n_capped_grams") == 0L)
    // a finite cap at/above every gram's df ≡ the ∞ cap semantically
    val wide = DedupOps.dedupLshRecall(docs10, truthDfCap = 1000).collect()(0)
    assert(wide.getAs[Long]("n_true") == un.getAs[Long]("n_true"))
    assert(wide.getAs[Long]("n_found") == un.getAs[Long]("n_found"))
    assert(wide.getAs[Long]("n_capped_grams") == 0L)
  }

  test("dedup_semantic: identical vectors collapse to the lower id, distinct ones survive") {
    val v = Seq.tabulate(64)(i => (math.sin(i + 1) * 10).toFloat)
    val w = Seq.tabulate(64)(i => (math.cos(i + 1) * 10).toFloat)
    val planted = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val out = DedupOps.dedupSemantic(planted)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "lower id of an identical pair is the survivor")
    assert(!out(2L), "higher id of an identical pair is dropped")
    // cos(v,w) ≈ 0 ≪ threshold — w survives whether or not it shares a cluster
    assert(out(3L))
  }

  test("null text ≡ empty text across token-derived ops (one rule, both engines)") {
    // tokens() coalesces NULL to '' at the single definition point — a
    // null-text doc must behave exactly like an empty-text doc in every
    // token-derived operator (the DuckDB fold idiom would otherwise turn
    // NULL into a real 0-hash while Spark null-propagates: engine drift)
    val both = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    def valuesOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.drop("doc_id").collect().toSeq.map(_.toSeq)
    val tc = valuesOf(TextOps.tokenCount(both))
    assert(tc.head == tc(1), s"token_count drifts on null text: $tc")
    val sh = valuesOf(DedupOps.simhashSignature(both))
    assert(sh.head == sh(1), s"simhash drifts on null text: $sh")
    val fp = valuesOf(TextOps.docFingerprint(both))
    assert(fp.head == fp(1), s"fingerprint drifts on null text: $fp")
    val ck = valuesOf(TextOps.chunkTokens(both))
    assert(ck.head == ck(1) && ck.size == 2, s"chunk_tokens drifts on null text: $ck")
    assert(ck.head.last == "", "a null doc's single chunk is the empty string")
  }

  test("dedup_semantic: a zero-norm vector is kept (null cosine never marks a dup)") {
    val v = Seq.tabulate(64)(i => (math.sin(i + 1) * 10).toFloat)
    val zero = Seq.fill(64)(0.0f)
    val planted = Seq((1L, v), (2L, zero), (3L, zero)).toDF("vec_id", "embedding")
    val out = DedupOps.dedupSemantic(planted)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    // 0/0 cosine is NULL, and NULL >= t is never true — both zero vectors
    // survive (they are degenerate, not duplicates of anything)
    assert(out(2L) && out(3L))
    assert(out.size == 3)
  }

  test("dedup_semantic covers every vector once; clusters are in-range; no label needed") {
    val out = DedupOps.dedupSemantic(emb.drop("label")).cache()
    try {
      assert(out.count() == emb.count())
      assert(out.select("vec_id").distinct().count() == emb.count())
      val bad = out.filter($"cluster_id" < 0 ||
        $"cluster_id" >= SimilarityOps.IvfCentroids).count()
      assert(bad == 0)
    } finally { out.unpersist(); () }
  }

  test("dedup_semantic runs against LEARNED ivfTrain centroids (train→dedup loop closed)") {
    val (cents, _) = SimilarityOps.ivfTrain(emb, maxIter = 3)
    val out = DedupOps.dedupSemantic(emb.drop("label"), cents).cache()
    try {
      assert(out.count() == emb.count())
      val bad = out.filter($"cluster_id" < 0 || $"cluster_id" >= cents.length).count()
      assert(bad == 0)
    } finally { out.unpersist(); () }
  }

  test("chunk_tokens: stride windows tile the doc; short tail window keeps the remainder") {
    val text = (1 to 60).map(i => s"t$i").mkString(" ")
    val out = TextOps.chunkTokens(Seq((7L, text)).toDF("doc_id", "text"))
      .orderBy("chunk_id").collect()
    assert(out.length == 3)
    assert(out.map(r => (r.getAs[Long]("start_tok"), r.getAs[Long]("n_tokens"))).toSeq ==
      Seq((0L, 32L), (24L, 32L), (48L, 12L)))
    assert(out.last.getAs[String]("chunk_text") ==
      (49 to 60).map(i => s"t$i").mkString(" "))
    // interior overlap: window 1 re-covers tokens 24..31 of window 0
    assert(out(1).getAs[String]("chunk_text").startsWith("t25 t26"))
  }

  test("chunk_tokens: doc shorter than one window → a single full-text chunk") {
    val out = TextOps.chunkTokens(Seq((1L, "a b c")).toDF("doc_id", "text")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_tokens") == 3L)
    assert(out(0).getAs[String]("chunk_text") == "a b c")
  }

  test("tfidf: rare planted token outranks ubiquitous stopword") {
    import graft.ops.TextOps
    val planted = (1L to 9L).map(i => (i, "the common words here again"))
      .toDF("doc_id", "text")
      .union(Seq((10L, "the common words here zyzzyva")).toDF("doc_id", "text"))
    val top = TextOps.tfidfTopK(planted)
      .filter($"doc_id" === 10L && $"rank" === 1)
      .select("token").as[String].head()
    assert(top == "zyzzyva") // df=1 beats df=10 terms
  }

  test("ivf_train_step: means stay inside the data envelope, sizes sum to N") {
    import graft.ops.SimilarityOps
    val out = SimilarityOps.ivfTrainStep(emb).cache()
    assert(out.select("centroid").distinct().count() <= SimilarityOps.IvfCentroids)
    val sizes = out.filter($"dim_idx" === 0).select("n_vecs").as[Long].collect()
    assert(sizes.sum == emb.count())
    assert(out.filter($"mean_val" < -1.0 || $"mean_val" > 1.0).count() == 0)
    out.unpersist()
  }

  test("ivf_train: iterative driver ascends the mean-cosine objective monotonically") {
    val (cents, objs) = SimilarityOps.ivfTrain(emb, maxIter = 4)
    assert(objs.size >= 3, s"expected >=3 iterations, got ${objs.size}: $objs")
    // spherical k-means: within-cluster cosine distance (1 - cos) never
    // increases step to step
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-12, s"objective regressed: $objs")
    }
    assert(objs.last > objs.head, s"no improvement at all: $objs")
    assert(cents.size == SimilarityOps.IvfCentroids)
    cents.foreach { c =>
      assert(c.size == SimilarityOps.Dim)
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9,
        "centroids must stay unit-norm")
    }
  }

  test("trained IVF centroids drive the probe search end-to-end") {
    val (cents, objs) = SimilarityOps.ivfTrain(emb, maxIter = 3)
    assert(objs.nonEmpty)
    val res = SimilarityOps.annIvfProbe(emb, cents).cache()
    try {
      assert(res.count() > 0)
      // the probe invariant holds under learned centroids too: each
      // query's neighbors come from at most IvfProbes lists
      val nCents = res.groupBy("query_id")
        .agg(countDistinct("centroid").as("n")).select("n").as[Long].collect()
      assert(nCents.forall(_ <= SimilarityOps.IvfProbes))
      // learned quantizer finds real neighbors: results overlap the exact
      // brute-force top-k for at least one query
      val bf = SimilarityOps.annTopkBruteForce(emb)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val ivf = res.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      assert((bf & ivf).nonEmpty, "no overlap with exact top-k at all")
    } finally { res.unpersist(); () }
  }

  test("IVF index: partitioned inverted lists serve probes with dynamic partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    SimilarityOps.writeIvfIndex(emb, dir)
    // layout: one directory per inverted list
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("centroid=")).toSet
    assert(parts.nonEmpty && parts.size <= SimilarityOps.IvfCentroids)

    val out = SimilarityOps.annIvfProbeIndexed(spark, dir, emb)
    val got = out.select("query_id", "neighbor_id", "centroid", "rank", "cos_sim")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val base = SimilarityOps.annIvfProbe(emb)
      .select("query_id", "neighbor_id", "centroid", "rank", "cos_sim")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == base, "indexed search must equal the in-memory search")

    // the probe join is on the PARTITION column: the scan must carry a
    // dynamic-pruning partition filter (only probed lists are read)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"index scan must prune partitions dynamically:\n$plan")
  }

  test("IVFADC index: PQ-coded partitioned lists serve probes pruned + equal to in-memory") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-idx").toString
    SimilarityOps.writeIvfPqIndex(emb, dir)
    // the stored rows are codes, not vectors: no emb_d/norm in the schema
    val stored = spark.read.parquet(dir)
    assert(stored.columns.toSet == Set("vec_id", "codes", "centroid"))

    val out = SimilarityOps.annIvfPqProbeIndexed(spark, dir, emb)
    val got = out.select("query_id", "neighbor_id", "centroid", "rank", "approx_d2")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val base = SimilarityOps.annIvfPqProbe(emb)
      .select("query_id", "neighbor_id", "centroid", "rank", "approx_d2")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got == base, "indexed ADC search must equal the in-memory search")

    val plan = out.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"IVFADC scan must prune partitions dynamically:\n$plan")
  }

  test("IVFADC refine: same survivor set, reordered by exact cosine") {
    val adc = SimilarityOps.annIvfPqProbe(emb)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ref = SimilarityOps.annIvfPqRefine(emb).cache()
    try {
      assert(ref.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().toSet == adc, "refine must keep exactly the ADC survivors")
      // exact cosine is non-increasing down each refined rank list
      for ((_, rows) <- ref.select("query_id", "rank", "cos_sim")
          .as[(Long, Long, Double)].collect().groupBy(_._1)) {
        val byRank = rows.sortBy(_._2).map(_._3)
        assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
      }
    } finally { ref.unpersist(); () }
  }

  test("pqTrain: mean distortion non-increasing; trained codebook beats the seed") {
    val (cb, hist) = SimilarityOps.pqTrain(emb, maxIter = 4)
    assert(hist.nonEmpty)
    assert(hist.zip(hist.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"distortion must be non-increasing: $hist")
    assert(hist.last < hist.head, s"training never improved: $hist")
    assert(cb.length == SimilarityOps.PqSubspaces * SimilarityOps.PqCodes *
      SimilarityOps.PqSubDim)
    // the trained codebook slots into the serving path unchanged
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-trained").toString
    SimilarityOps.writeIvfPqIndex(emb, dir, codebook = cb)
    val out = SimilarityOps.annIvfPqProbeIndexed(spark, dir, emb, codebook = cb)
    assert(out.groupBy("query_id").count().filter($"count" =!= SimilarityOps.TopK)
      .count() == 0)
  }

  test("lang_mix: planted code-switched doc flags mixed; monolingual doc does not") {
    val mono = "the a of and to in is " * 10
    val mixed = ("the a of and to in is " * 5) + ("el la de y que los " * 5)
    val planted = Seq((1L, mono, "en", "s", 1L), (2L, mixed, "xx", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val byId = TextOps.langMix(planted).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!byId(1L).getAs[Boolean]("mixed"))
    assert(byId(1L).getAs[Long]("majority_share_micro") == 1000000L)
    assert(byId(2L).getAs[Boolean]("mixed"))
    assert(byId(2L).getAs[Long]("n_langs") >= 2)
    // real table: every tokenful doc voted, shares in (0, 1e6]
    val full = TextOps.langMix(docs)
    assert(full.filter($"majority_share_micro" <= 0 ||
      $"majority_share_micro" > 1000000L).count() == 0)
    assert(full.filter($"mixed" =!= ($"n_langs" > 1)).count() == 0)
  }

  test("length_percentiles: hand-checked discrete positions; monotone across qs") {
    // lengths 1..10 tokens: position ceil(q*10/100) → p25=3rd=3, p50=5th=5,
    // p90=9th=9, p99=10th=10
    val planted = (1L to 10L).map(i =>
      (i, ("w " * i.toInt).trim, "en", "s", i)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val row = TextOps.lengthPercentiles(planted).head()
    assert(row.getAs[Long]("n_docs") == 10L)
    assert(row.getAs[Long]("p25") == 3L)
    assert(row.getAs[Long]("p50") == 5L)
    assert(row.getAs[Long]("p90") == 9L)
    assert(row.getAs[Long]("p99") == 10L)
    assert(row.getAs[Long]("max_tokens") == 10L)
    // real table: monotone non-decreasing across the quantile ladder
    val full = TextOps.lengthPercentiles(docs)
    assert(full.filter($"p25" > $"p50" || $"p50" > $"p90" ||
      $"p90" > $"p99" || $"p99" > $"max_tokens").count() == 0)
  }

  test("shard_checksums: dropping one doc flips exactly its shard's manifest row") {
    import graft.ops.PretrainOps
    val all = PretrainOps.shardChecksums(docs).collect()
      .map(r => r.getAs[Long]("shard") -> r).toMap
    val victim = docs.select("doc_id").as[Long].head()
    val without = PretrainOps.shardChecksums(docs.filter($"doc_id" =!= victim))
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    val changed = all.keySet.filter { s =>
      !without.contains(s) ||
        without(s).getAs[Long]("checksum") != all(s).getAs[Long]("checksum") ||
        without(s).getAs[Long]("n_docs") != all(s).getAs[Long]("n_docs")
    }
    assert(changed.size == 1, s"exactly one shard must change, got $changed")
  }

  test("corpus_clean: gates drop low-quality/foreign docs, dedup drops planted near-dup") {
    import graft.ops.CorpusOps
    val base = (1 to 60).map(i => s"the of and to token$i").mkString(" ")
    val nearDup = base.replace("token30", "CHANGED")
    val lowQ = "x" * 50 // one 50-char token → low quality score
    val planted = Seq((1L, base), (2L, nearDup), (3L, lowQ)).toDF("doc_id", "text")
    val out = CorpusOps.cleanCorpus(planted).select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L)) // 2 = near-dup loser, 3 = quality-gated
  }

  test("corpus_to_sequences: gates, dedup, decontam, trim and packing compose") {
    import graft.ops.CorpusOps
    def uniq(tag: String) = (1 to 12).map(i => s"the of and to $tag$i").mkString(" ")
    val base = (1 to 60).map(i => s"the of and to token$i").mkString(" ") // 300 toks
    val span8 = "alpha beta gamma delta epsilon zeta eta theta"
    val bench8 = "zulu yankee xray whiskey victor uniform tango sierra"
    val planted = Seq(
      (1L, base, "src1"),                          // survives whole
      (2L, base.replace("token30", "CHANGED"), "src1"), // near-dup loser
      (3L, s"${uniq("c")} $span8", "src1"),        // shares span8 with 4 → trimmed
      (4L, s"$span8 ${uniq("d")}", "src2"),        // shares span8 with 3 → trimmed
      (5L, s"${uniq("e")} $bench8", "src1"),       // contaminated → removed
      (90L, bench8, "src0")                        // the benchmark split
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.corpusToSequences(planted)
      .select("doc_id", "source", "n_tokens", "tok_start", "seq_start", "seq_end", "seq_offset")
      .as[(Long, String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    // near-dup loser and contaminated doc are gone; bench split fails gates
    assert(out.keySet == Set(1L, 3L, 4L), s"unexpected survivor set: $out")
    // doc 1: 300 surviving tokens (its near-dup was REMOVED first, so its
    // spans are not cross-doc repeats — order of stages matters)
    assert(out(1L) == (("src1", 300L, 0L, 0L, 1L, 0L)))
    // docs 3/4: the shared 8-token span trims from 68 → 60 in BOTH
    assert(out(3L) == (("src1", 60L, 300L, 1L, 1L, 44L)))
    assert(out(4L) == (("src2", 60L, 0L, 0L, 0L, 0L)))
  }

  test("filter_reasons: every input doc flagged with its removal reason; keep ≡ survivor set") {
    import graft.ops.{CorpusOps, PretrainOps}
    def uniq(tag: String) = (1 to 12).map(i => s"the of and to $tag$i").mkString(" ")
    val base = (1 to 60).map(i => s"the of and to token$i").mkString(" ")
    val bench8 = "zulu yankee xray whiskey victor uniform tango sierra"
    val planted = Seq(
      (1L, base, "src1"),                               // keeps
      (2L, base.replace("token30", "CHANGED"), "src1"), // near-dup loser
      (3L, base, "src2"),                               // exact dup of 1
      (4L, "x" * 50, "src1"),                           // quality-gated
      (5L, s"${uniq("e")} $bench8", "src1"),            // contaminated
      (90L, bench8, PretrainOps.BenchmarkSource)        // the benchmark split
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.filterReasons(planted)
      .select("doc_id", "fail_quality", "fail_lang", "dup_exact", "dup_near",
        "contaminated", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 90L), "one row per INPUT doc")
    assert(out(1L) == ((false, false, false, false, false, true)))
    assert(out(2L) == ((false, false, false, true, false, false)), s"got ${out(2L)}")
    assert(out(3L) == ((false, false, true, false, false, false)), s"got ${out(3L)}")
    assert(out(4L)._1 && !out(4L)._6, s"got ${out(4L)}")
    assert(out(5L)._5 && !out(5L)._6, s"got ${out(5L)}")
    // keep column ≡ the clean pipeline's survivor set, by construction
    val kept = out.collect { case (id, f) if f._6 => id }.toSet
    val survivors = CorpusOps.cleanCorpusDecontam(planted)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == survivors)
  }

  test("corpus_to_sequences_bpe: survivors packed by survivor-trained BPE counts, no trim") {
    import graft.ops.{CorpusOps, TokenizerOps}
    def uniq(tag: String) = (1 to 12).map(i => s"the of and to $tag$i").mkString(" ")
    val base = (1 to 60).map(i => s"the of and to token$i").mkString(" ")
    val span8 = "alpha beta gamma delta epsilon zeta eta theta"
    val bench8 = "zulu yankee xray whiskey victor uniform tango sierra"
    val planted = Seq(
      (1L, base, "src1"),                               // survives whole
      (2L, base.replace("token30", "CHANGED"), "src1"), // near-dup loser
      (3L, s"${uniq("c")} $span8", "src1"),             // shares span8 with 4 — NOT trimmed here
      (4L, s"$span8 ${uniq("d")}", "src2"),
      (5L, s"${uniq("e")} $bench8", "src1"),            // contaminated → removed
      (90L, bench8, "src0")                             // the benchmark split
    ).toDF("doc_id", "text", "source")
    val out = CorpusOps.corpusToSequencesBpe(planted)
      .select("doc_id", "n_tokens", "tok_start")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // same survivor set as corpus_to_sequences: gates/dedup/decontam apply...
    assert(out.keySet == Set(1L, 3L, 4L), s"unexpected survivor set: $out")
    // ...but counts are BPE counts over the FULL surviving text — the
    // whitespace-denominated substring trim is deliberately not composed
    // (docs 3/4 would report 60 surviving whitespace tokens after trim)
    val survivors = planted.filter($"doc_id".isin(1L, 3L, 4L))
    val merges = TokenizerOps.bpeTrain(survivors, TokenizerOps.NumMerges)
    val expected = TokenizerOps.tokenizeBpe(survivors, merges)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(out.view.mapValues(_._1).toMap == expected,
      "packed counts must equal survivor-trained BPE counts")
    // 8 merges cannot collapse 68 words to their whitespace count: BPE
    // counts are real (char-denominated), not the trim variant's 60/68
    assert(out(3L)._1 > 68L)
    // packing arithmetic: per-source cumulative offsets in doc_id order
    assert(out(1L)._2 == 0L && out(4L)._2 == 0L)
    assert(out(3L)._2 == out(1L)._1)
  }

  test("pcaTrain recovers a planted dominant direction; components orthonormal, eigenvalues descending") {
    import graft.ops.PretrainOps
    // planted: variance 9 along e0, 1 along e1, ~0 elsewhere (D=4).
    // Deterministic +/- alternation, mean zero.
    val d = 4
    val vecs = (0 until 64).map { i =>
      val s0 = if (i % 2 == 0) 3.0f else -3.0f
      val s1 = if (i % 4 < 2) 1.0f else -1.0f
      (i.toLong, Array(s0, s1, 0.0f, 0.0f), i % 3)
    }
    val embP = vecs.toDF("vec_id", "embedding", "label")
    val comps = PretrainOps.pcaTrain(embP, k = 2)
    assert(comps.map(_.rank) == Seq(0, 1))
    assert(comps(0).eigenvalue > comps(1).eigenvalue)
    assert(math.abs(comps(0).eigenvalue - 9.0) < 1e-6)
    assert(math.abs(comps(1).eigenvalue - 1.0) < 1e-6)
    // top component aligns with e0, second with e1 (sign-free)
    assert(math.abs(math.abs(comps(0).vector(0)) - 1.0) < 1e-6)
    assert(math.abs(math.abs(comps(1).vector(1)) - 1.0) < 1e-6)
    for (c <- comps) {
      val n = math.sqrt(c.vector.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9, "components must be unit norm")
      assert(c.vector.size == d)
    }
    val dot = comps(0).vector.zip(comps(1).vector).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, "components must be orthogonal")
  }

  test("embedPcaProject: literal-component in-row dot products, zero shuffles") {
    import graft.ops.PretrainOps
    val comps = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val embP = Seq(
      (1L, Array(2.0f, -1.5f, 7.0f, 0.0f), 0),
      (2L, Array(-4.0f, 0.5f, 0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = PretrainOps.embedPcaProject(embP, comps)
      .select("vec_id", "scores").as[(Long, Seq[Double])].collect().toMap
    assert(out(1L) == Seq(2.0, -1.5))
    assert(out(2L) == Seq(-4.0, 0.5))
    // scale guard: no KEY-based shuffle — the only exchange allowed is
    // fanout's round-robin parallelism repartition (keyless, skew-free)
    val plan = PretrainOps.embedPcaProject(emb, comps)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("hashpartitioning"),
      s"projection must not shuffle on a key:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"projection must not join:\n$plan")
  }

  test("bm25_topk: quoting doc outranks topical doc; common terms discounted; K bound holds") {
    import graft.ops.PretrainOps
    val rare = "zymurgy quetzal fjord syzygy"
    val planted = Seq(
      (90L, s"$rare benchmark question", PretrainOps.BenchmarkSource),
      (1L, s"$rare appears verbatim in this training doc", "src1"), // quotes the rare terms
      (2L, "benchmark benchmark benchmark question question filler", "src2"), // common-ish terms only
      (3L, "entirely unrelated training content here", "src3")
    ).toDF("doc_id", "text", "source")
    val out = TextOps.bm25TopK(planted)
      .select("query_id", "doc_id", "rank", "score_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.forall(_._1 == 90L))
    assert(out.length <= TextOps.Bm25TopK)
    val byRank = out.sortBy(_._3)
    // doc 1 matches 4 rare terms (df=1 each) → top; doc 3 matches nothing
    assert(byRank.head._2 == 1L, s"got ${byRank.toSeq}")
    assert(!out.exists(_._2 == 3L), "no shared term → not retrieved")
    assert(out.exists(_._2 == 2L), "shared common terms still retrieved, below")
    // scores strictly ordered with ranks
    assert(byRank.map(_._4).toSeq == byRank.map(_._4).sortBy(-_).toSeq)
  }

  test("length_histogram: exact bit-length buckets, power-of-two boundaries land right") {
    val planted = Seq(
      (1L, "", "s1"),                                // tokens('') = [''] → n=1 → bucket 1
      (2L, "a b c", "s1"),                           // n=3 → bin(4)=100 → bucket 2
      (3L, (1 to 7).map("w" + _).mkString(" "), "s1"), // n=7 → bin(8) → bucket 3
      (4L, (1 to 8).map("w" + _).mkString(" "), "s1"), // n=8 → bin(9)=1001 → bucket 3
      (5L, (1 to 15).map("w" + _).mkString(" "), "s2") // n=15 → bucket 4
    ).toDF("doc_id", "text", "source")
    val out = TextOps.lengthHistogram(planted)
      .select("source", "bucket", "n_docs", "sum_tokens", "min_tokens", "max_tokens")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out(("s1", 1L)) == ((1L, 1L, 1L, 1L)))
    assert(out(("s1", 2L)) == ((1L, 3L, 3L, 3L)))
    assert(out(("s1", 3L)) == ((2L, 15L, 7L, 8L)), "7 and 8 share bucket [7,15)")
    assert(out(("s2", 4L)) == ((1L, 15L, 15L, 15L)))
    assert(out.keySet.map(_._2).max == 4L)
  }

  test("embedPcaWhiten: whitened projections have ~unit variance per retained component") {
    import graft.ops.PretrainOps
    val comps = PretrainOps.pcaTrain(emb, k = 2)
    assert(comps.forall(_.eigenvalue > 0))
    val rows = PretrainOps.embedPcaWhiten(emb, comps)
      .select("scores").as[Seq[Double]].collect()
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    for (k <- 0 until 2) {
      val v = variance(rows.map(_(k)).toSeq)
      assert(math.abs(v - 1.0) < 0.05, s"component $k whitened variance $v")
    }
    // dead components are rejected, not divided by ~0
    val dead = comps.head.copy(eigenvalue = 0.0)
    intercept[IllegalArgumentException] {
      PretrainOps.embedPcaWhiten(emb, Seq(dead))
    }
  }

  test("pcaTrain components drive the projection end-to-end on the embeddings table") {
    import graft.ops.PretrainOps
    val comps = PretrainOps.pcaTrain(emb, k = 2)
    val out = PretrainOps.embedPcaProject(emb, comps.map(_.vector))
    val rows = out.select("scores").as[Seq[Double]].collect()
    assert(rows.nonEmpty && rows.forall(_.size == 2))
    // variance along the top component exceeds variance along the second
    // (that is what "principal" means) — computed from the projections
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v0 = variance(rows.map(_.head).toSeq)
    val v1 = variance(rows.map(_.last).toSeq)
    assert(v0 >= v1, s"top component carries less variance: $v0 < $v1")
    // and the realized projection variances match the eigenvalues the
    // trainer reported (same covariance, exact-micro quantization noise)
    assert(math.abs(v0 - comps(0).eigenvalue) / comps(0).eigenvalue < 0.05)
  }

  test("multimodal decode: stub metadata matches payload arithmetic, schema typed") {
    val out = BinaryOps.multimodalDecode(spark, docs)
    assert(out.columns.toSeq ==
      Seq("doc_id", "media_type", "width", "height", "n_frames", "payload_bytes"))
    assert(out.count() == docs.count())
    val img = out.filter($"media_type" === "image")
    assert(img.filter($"n_frames" =!= 1).count() == 0)
    assert(out.filter($"width" < 64 || $"width" > 512).count() == 0)
    // payload_bytes == byte length of utf-8 text
    val lens = docs.select($"doc_id", length($"text").cast("long").as("l"))
    val j = out.join(lens, "doc_id").filter($"payload_bytes" =!= $"l")
    assert(j.count() == 0)
  }
}
