package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, PretrainOps, TextOps}

/** Round-7 operators: bm25 impact cap, the quality-classifier train step,
  * PCA projection + PCA-composed semantic dedup, packed-sequence
  * decontamination, and the normalizeEvents nanos guard.
  */
class Round7OpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  // ------------------------------------------------------- bm25 impact cap

  test("bm25TopK: default cap is above the small corpus — n_capped = 0, caps invisible") {
    val r = TextOps.bm25TopK(docs)
    assert(r.columns.contains("n_capped"))
    assert(r.filter(col("n_capped") =!= 0L).count() == 0L,
      "cap must not bite below Bm25ImpactCap docs per term")
  }

  test("bm25TopK: tiny cap prunes, is observable, and keeps ranks contiguous") {
    val r = TextOps.bm25TopK(docs, impactCap = 1).cache()
    try {
      // n_capped must equal Σ max(df − cap, 0) over each query's selected
      // terms — and with cap=1 on a real corpus some term has df > 1
      assert(r.filter(col("n_capped") > 0L).count() > 0L,
        "cap=1 must prune something on the real corpus")
      // per query: ranks are 1..m contiguous after pruning
      val byQ = r.select("query_id", "rank").as[(Long, Long)].collect()
        .groupBy(_._1).values
      assert(byQ.forall(rs =>
        rs.map(_._2).sorted.sameElements(1L to rs.length.toLong)))
      // observability is per-QUERY constant: one n_capped value per query
      val nc = r.select("query_id", "n_capped").distinct().collect()
      assert(nc.map(_.getLong(0)).distinct.length == nc.length)
    } finally { r.unpersist(); () }
  }

  // -------------------------------------------------- quality_linear_train

  test("qualityLinearTrainStep: ≤ LinearBuckets gradient rows, occurrences conserved") {
    val g = PretrainOps // touch to keep import
    val step = TextOps.qualityLinearTrainStep(docs).cache()
    try {
      assert(step.count() <= TextOps.LinearBuckets)
      // every token occurrence lands in exactly one bucket
      val nTerms = step.agg(sum("n_terms")).as[Long].head()
      val nToks = docs.select(sum(size(TextOps.tokens(col("text")))))
        .as[Long].head()
      assert(nTerms == nToks, s"occurrence conservation: $nTerms vs $nToks")
    } finally { step.unpersist(); () }
  }

  test("qualityLinearScoreWith(seedWeightsMicro) ≡ qualityLinearScore (weights slot in)") {
    val a = TextOps.qualityLinearScore(docs)
      .orderBy("doc_id").collect().toSeq
    val b = TextOps.qualityLinearScoreWith(docs, TextOps.seedWeightsMicro)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "explicit seed weights must reproduce the arithmetic weights")
  }

  test("qualityLinearScoreWith: in-row fold; only the narrow-input insurance may exchange") {
    // round 12: fanoutIfNarrow adds ONE RoundRobin insurance exchange
    // when the input is a serial scan (this fixture); the fold itself
    // must stay in-row — no keyed exchange ever
    val plan = TextOps.qualityLinearScoreWith(docs, TextOps.seedWeightsMicro)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning"),
      s"trained-weight scoring must never shuffle by key:\n$plan")
    // a pre-fanned input takes the zero-added-exchange path (the no-op
    // probe): the only Exchange in the plan is the input's OWN
    // repartition
    val wide = docs.repartition(
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val widePlan = TextOps.qualityLinearScoreWith(wide, TextOps.seedWeightsMicro)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(widePlan).size == 1,
      s"already-parallel input must not re-shuffle:\n$widePlan")
  }

  test("qualityLinearTrain: one step moves predictions toward the gopher labels") {
    def meanAbsResidual(weights: Map[Long, Long]): Double = {
      val scored = TextOps.qualityLinearScoreWith(docs, weights)
        .select(col("doc_id"), col("logit_micro"))
      val labels = TextOps.qualityGopherGates(docs)
        .select(col("doc_id"), when(col("pass"), 1.0).otherwise(0.0).as("y"))
      scored.join(labels, "doc_id")
        .withColumn("z", col("logit_micro").cast("double") / lit(1000000.0))
        .withColumn("p",
          lit(0.5) + col("z") / (lit(2.0) * (lit(1.0) + abs(col("z")))))
        .agg(avg(abs(col("p") - col("y")))).as[Double].head()
    }
    val before = meanAbsResidual(TextOps.seedWeightsMicro)
    val trained = TextOps.qualityLinearTrain(docs)
    val after = meanAbsResidual(trained)
    assert(trained != TextOps.seedWeightsMicro, "training must move weights")
    assert(after < before,
      s"one LR step must reduce mean |p - y|: before=$before after=$after")
  }

  test("qualityLinearTrainLoop: loss history measures the returned weights; net improvement") {
    val (w, hist) = TextOps.qualityLinearTrainLoop(docs, maxIter = 3)
    assert(hist.size >= 2, s"need a start and a final measurement: $hist")
    assert(w != TextOps.seedWeightsMicro)
    assert(hist.last < hist.head,
      s"training must improve the loss gauge overall: $hist")
    // hist.last is the RETURNED weights' loss — the pqTrain discipline
    val returned = TextOps.linearMeanAbsResidual(docs, w).get
    assert(math.abs(returned - hist.last) < 1e-12,
      "hist.last must measure the returned weights")
  }

  // ----------------------------------------------------- embed_pca_project

  test("embedPcaProjectDefault: k rows per vector, micro-quantized from the raw projection") {
    val raw = PretrainOps.embedPcaProject(emb, PretrainOps.defaultPcaComponents)
      .select(col("vec_id"), col("scores")).as[(Long, Seq[Double])]
      .collect().toMap
    val keyed = PretrainOps.embedPcaProjectDefault(emb)
      .select("vec_id", "rank", "score_micro").as[(Long, Long, Long)].collect()
    assert(keyed.length == raw.size * PretrainOps.PcaK)
    assert(keyed.forall { case (v, r, m) =>
      m == math.floor(raw(v)(r.toInt) * 1e6 + 0.5).toLong
    }, "oracle face must be the micro-quantized raw projection")
  }

  // --------------------------------------------------- dedup_semantic_pca

  test("dedupSemanticPca: every vector verdicted once; cluster minimum always kept") {
    val r = DedupOps.dedupSemanticPca(emb).cache()
    try {
      assert(r.count() == emb.count())
      assert(r.select("vec_id").distinct().count() == emb.count())
      // the lowest vec_id in a cluster has no lower-id neighbor → keep
      val minKept = r.groupBy("cluster_id").agg(min("vec_id").as("vec_id"))
        .join(r, Seq("cluster_id", "vec_id"))
        .filter(!col("keep")).count()
      assert(minKept == 0L, "a cluster's min vec_id can never be a dup")
    } finally { r.unpersist(); () }
  }

  test("dedupSemanticPca: reduced-space verdicts match a driver-side recompute") {
    val comps = PretrainOps.defaultPcaComponents
    val cents = DedupOps.defaultPcaCentroids
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    def proj(e: Seq[Double]): IndexedSeq[Double] =
      comps.map(c => c.indices.foldLeft(0.0)((a, d) => a + c(d) * e(d)))
    val p = vecs.map { case (id, e) => id -> proj(e) }
    def clusterOf(v: IndexedSeq[Double]): Int = {
      val dots = cents.map(c => c.indices.foldLeft(0.0)((a, d) => a + c(d) * v(d)))
      dots.indexOf(dots.max)
    }
    val cl = p.map { case (id, v) => id -> clusterOf(v) }
    def cos(a: IndexedSeq[Double], b: IndexedSeq[Double]): Option[Double] = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb > 0) Some(a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i)) / (na * nb))
      else None
    }
    val expectDup = p.keys.map { id =>
      id -> p.keys.exists(o => o < id && cl(o) == cl(id) &&
        cos(p(o), p(id)).exists(_ >= DedupOps.SemanticDupThreshold))
    }.toMap
    val got = DedupOps.dedupSemanticPca(emb)
      .select("vec_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got.size == expectDup.size)
    got.foreach { case (id, keep) =>
      assert(keep == !expectDup(id), s"vec $id verdict diverged")
    }
  }

  // -------------------------------------------------- decontaminate_packed

  test("decontaminatePacked catches a benchmark gram SPANNING a doc boundary") {
    // two individually-clean train docs whose concatenation in pack order
    // recreates the benchmark 5-gram — invisible to doc-level
    // decontaminate, visible in the packed stream
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon", PretrainOps.BenchmarkSource),
      (10L, "filler1 filler2 filler3 alpha beta", "src1"),
      (11L, "gamma delta epsilon filler4 filler5", "src1")
    ).toDF("doc_id", "text", "source")
    assert(PretrainOps.decontaminate(planted).count() == 0L,
      "doc-level check must be blind to the boundary-spanning gram")
    val leaked = PretrainOps.decontaminatePacked(planted)
      .select("source", "seq_id", "n_grams", "leaked_grams")
      .as[(String, Long, Long, Long)].collect()
    assert(leaked.toSeq == Seq(("src1", 0L, 6L, 1L)),
      s"expected exactly the spanning gram: ${leaked.toSeq}")
  }

  test("contaminationReportPacked: boundary-spanning leak attributed to its bench item; zero-leak items kept") {
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon", PretrainOps.BenchmarkSource),
      (2L, "zeta eta theta iota kappa", PretrainOps.BenchmarkSource), // never leaks
      (10L, "filler1 filler2 filler3 alpha beta", "src1"),
      (11L, "gamma delta epsilon filler4 filler5", "src1")
    ).toDF("doc_id", "text", "source")
    val r = PretrainOps.contaminationReportPacked(planted)
      .select("doc_id", "n_grams", "n_leaked_grams", "n_seqs", "n_occurrences")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 1L, 1L, 1L, 1L), (2L, 1L, 0L, 0L, 0L)),
      s"item 1 leaks via the spanning gram, item 2 reports zeros: $r")
  }

  test("decontaminatePacked: a gram inside one doc leaks every time it occurs") {
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon", PretrainOps.BenchmarkSource),
      // the bench 5-gram occurs twice in one doc (positions 1 and 6)
      (10L, "alpha beta gamma delta epsilon alpha beta gamma delta epsilon", "src1")
    ).toDF("doc_id", "text", "source")
    val leaked = PretrainOps.decontaminatePacked(planted)
      .select("seq_id", "leaked_grams").as[(Long, Long)].collect()
    assert(leaked.toSeq == Seq((0L, 2L)),
      "positional grams: every occurrence counts")
  }

  test("packMaterialize agrees with sequenceManifest's exact token accounting") {
    val mat = PretrainOps.packMaterialize(docs)
      .select("source", "seq_id", "seq_len")
      .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val man = PretrainOps.sequenceManifest(docs)
      .select("source", "seq_id", "filled_tokens")
      .as[(String, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(mat.keySet == man.keySet,
      "writer and manifest must cover the same sequences")
    mat.foreach { case (k, len) =>
      assert(len == man(k), s"sequence $k: writer=$len manifest=${man(k)}")
    }
    // every sequence is SeqLen except possibly each shard's last
    val bySource = mat.groupBy(_._1._1)
    bySource.foreach { case (_, seqs) =>
      val maxSeq = seqs.keys.map(_._2).max
      seqs.foreach { case ((_, sid), len) =>
        if (sid != maxSeq) assert(len == PretrainOps.SeqLen)
      }
    }
  }

  test("embedOutlierScore: one row per vector, m2 matches a driver recompute") {
    val ws = PretrainOps.defaultWhitenedComponents
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    val got = PretrainOps.embedOutlierScore(emb)
      .select("vec_id", "m2_micro").as[(Long, Long)].collect().toMap
    assert(got.size == vecs.size)
    got.foreach { case (id, m2) =>
      val e = vecs(id)
      val exp = ws.map(c =>
        c.indices.foldLeft(0.0)((a, d) => a + c(d) * e(d))).map(w => w * w).sum
      assert(m2 == math.floor(exp * 1e6 + 0.5).toLong, s"vec $id m2 diverged")
    }
  }

  // ------------------------------------------------- BPE model round-trip

  test("writeBpeModel/readBpeModel: exact round-trip in training order; tokenization identical") {
    import graft.ops.TokenizerOps
    val merges = TokenizerOps.bpeTrain(docs, TokenizerOps.NumMerges)
    assert(merges.nonEmpty)
    val path = java.nio.file.Files.createTempDirectory("bpe-model").toString
    TokenizerOps.writeBpeModel(spark, merges, s"$path/m")
    val loaded = TokenizerOps.readBpeModel(spark, s"$path/m")
    assert(loaded == merges, "model round-trip must preserve order and counts")
    val a = TokenizerOps.tokenizeBpe(docs, merges)
      .orderBy("doc_id").collect().toSeq
    val b = TokenizerOps.tokenizeBpe(docs, loaded)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "tokenizing with the loaded model must be identical")
  }

  // ----------------------------------------------- normalizeEvents guard

  test("normalizeEvents: long micros (1000x off) fail loudly, long nanos pass") {
    val micros = Seq((1L, 1700000000000000L, "signup", 7L, 1.0))
      .toDF("event_id", "ts", "event_type", "user_id", "value")
    val ex = intercept[Exception] {
      graft.ops.CdcOps.typedMessages(micros).collect()
    }
    assert(ex.getMessage.contains("nanosecond epoch") ||
      Option(ex.getCause).exists(_.getMessage.contains("nanosecond epoch")))
    val nanos = Seq((1L, 1700000000000000000L, "signup", 7L, 1.0))
      .toDF("event_id", "ts", "event_type", "user_id", "value")
    assert(graft.ops.CdcOps.typedMessages(nanos).count() == 1L)
  }

  // --------------------------------------------------------- cluster_sample

  test("clusterSample: ≤ N per cluster, contiguous ranks, cosines in [-1,1]") {
    import graft.ops.SimilarityOps
    val r = SimilarityOps.clusterSample(emb).cache()
    try {
      val byC = r.select("centroid", "proto_rank").as[(Long, Long)].collect()
        .groupBy(_._1).values
      assert(byC.forall(_.length <= SimilarityOps.ClusterSampleN))
      assert(byC.forall(rs =>
        rs.map(_._2).sorted.sameElements(1L to rs.length.toLong)),
        "proto_rank must be 1..m contiguous per cluster")
      assert(r.filter(col("centroid_cos") > 1.0000001 ||
        col("centroid_cos") < -1.0000001).count() == 0L)
      // prototypicality must actually order: rank 1 has the max cosine
      val top = r.filter(col("proto_rank") === 1L)
        .select("centroid", "centroid_cos").as[(Long, Double)].collect().toMap
      val all = r.select("centroid", "centroid_cos").as[(Long, Double)].collect()
      assert(all.forall { case (c, cos) => cos <= top(c) + 1e-12 })
    } finally { r.unpersist(); () }
  }

  // ----------------------------------------------------------- split family

  test("splitAssign: both splits populated, val fraction near SplitValPct") {
    val rows = PretrainOps.splitAssign(docs)
      .select("split", "n_docs").as[(String, Long)].collect().toMap
    assert(rows.keySet == Set("train", "val"))
    val total = rows.values.sum.toDouble
    val valFrac = rows("val") / total
    // 10% target; the md5 split at 500 docs lands well inside (2%, 25%)
    assert(valFrac > 0.02 && valFrac < 0.25, s"val fraction $valFrac")
  }

  test("splitLeakage: only val docs, hits bounded by gram counts") {
    val leak = PretrainOps.splitLeakage(docs).cache()
    try {
      assert(leak.count() > 0, "synthetic dup structure must leak across the split")
      assert(leak.filter(col("n_hits") > col("n_grams")).count() == 0L)
      assert(leak.filter(col("leakage") <= 0.0 || col("leakage") > 1.0).count() == 0L)
      // every reported doc must BE a val doc under the same split rule
      val valIds = docs.select(col("doc_id"))
        .filter(pmod(TextOps.tokenHash(
          concat(lit("split:"), col("doc_id").cast("string"))), lit(100L)) >= 90L)
        .as[Long].collect().toSet
      val got = leak.select("doc_id").as[Long].collect()
      assert(got.forall(valIds.contains))
    } finally { leak.unpersist(); () }
  }

  // ------------------------------------------------------------- ngram_topk

  test("ngramTopk: K rows, text matches its hash, counts honest") {
    val r = PretrainOps.ngramTopk(docs).cache()
    try {
      assert(r.count() == PretrainOps.NgramTopkK.toLong)
      // recovered text re-hashes to its gram_hash (the broadcast text
      // recovery join can't mispair)
      assert(r.filter(TextOps.tokenHash(col("gram")) =!= col("gram_hash"))
        .count() == 0L)
      // spot-check the top count against a direct recount of that gram
      val (topGram, topN) = r.orderBy(col("n_occurrences").desc, col("gram_hash"))
        .select("gram", "n_occurrences").as[(String, Long)].head()
      val w = PretrainOps.NgramTopkWidth
      val recount = docs.select(explode(
          org.apache.spark.sql.functions.transform(
            sequence(lit(1), greatest(size(TextOps.tokens(col("text"))) - (w - 1), lit(1))),
            i => array_join(slice(TextOps.tokens(col("text")), i, lit(w)), " ")))
          .as("g"))
        .filter(col("g") === topGram).count()
      assert(recount == topN, s"top gram '$topGram': $recount vs $topN")
    } finally { r.unpersist(); () }
  }

  // -------------------------------------------------- mixture_reweight_step

  test("mixtureReweightStep: weights normalize, monotone in quality, uniform fixed point") {
    val r = PretrainOps.mixtureReweightStep(docs).cache()
    try {
      val rows = r.select("mean_quality_micro", "weight")
        .as[(Long, Double)].collect().sortBy(_._1)
      assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9, "weights must sum to 1")
      // the linear update is monotone: better-scoring sources never get
      // LESS weight
      assert(rows.sliding(2).forall { p =>
        p.length < 2 || p(1)._2 >= p(0)._2 - 1e-12
      })
      // a uniform-quality corpus is a fixed point: equal weights
      val uni = Seq((1L, "same text here", "en", "s0", 14L),
        (2L, "same text here", "en", "s1", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val w = PretrainOps.mixtureReweightStep(uni)
        .select("weight").as[Double].collect()
      assert(w.forall(x => math.abs(x - 0.5) < 1e-12))
    } finally { r.unpersist(); () }
  }

  // ------------------------------------------- curation ops: degenerate input

  test("curation ops survive null/empty text and zero vectors") {
    val weird = Seq(
      (1L, null.asInstanceOf[String], "en", "s0", 0L),
      (2L, "", "en", "s0", 0L),
      (3L, "   ", "en", "s1", 3L),
      (4L, "one real document with several words here", "en", "s1", 41L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // split family: every doc gets a split; leakage empty (nothing shared)
    val sa = PretrainOps.splitAssign(weird)
      .agg(sum("n_docs")).as[Long].head()
    assert(sa == 4L)
    PretrainOps.splitLeakage(weird).count() // must not throw (ANSI div etc.)
    // ngram_topk: degenerate docs contribute their single (possibly empty)
    // truncated gram — no crash, counts stay honest
    val nt = PretrainOps.ngramTopk(weird, k = 100).cache()
    try {
      assert(nt.filter(col("gram") === "").count() <= 1L)
      assert(nt.agg(sum("n_occurrences")).as[Long].head() >= 4L)
    } finally { nt.unpersist(); () }
    // mixture step: null-quality docs (empty text) drop out of n_scored;
    // weights still normalize over the scored mass
    val mw = PretrainOps.mixtureReweightStep(weird)
      .agg(sum("weight")).as[Double].head()
    assert(math.abs(mw - 1.0) < 1e-9)
    // cluster_sample: an all-zeros vector is degenerate — it must be
    // EXCLUDED, never ranked as a prototype (a NULL cosine would sort
    // last yet still claim a top-N slot in an under-full cluster)
    val weirdEmb = Seq(
      (1L, Array.fill(64)(0.0f), 0),
      (2L, Array.tabulate(64)(i => (i + 1) / 64.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cs = graft.ops.SimilarityOps.clusterSample(weirdEmb).collect()
    assert(!cs.exists(_.getLong(1) == 1L),
      "zero vector must not appear among prototypes")
    assert(cs.exists(_.getLong(1) == 2L))
  }

  // ---------------------------------------------------------- bpe_fertility

  test("bpeFertility: every source ≥ 1.0, conservation vs corpus word count") {
    import graft.ops.TokenizerOps
    val merges = TokenizerOps.bpeTrain(docs, TokenizerOps.NumMerges)
    val r = TokenizerOps.bpeFertility(docs, merges).cache()
    try {
      // a word is ≥ 1 BPE token, so fertility_micro ≥ 1e6 wherever words exist
      assert(r.filter(col("n_words") > 0 && col("fertility_micro") < 1000000L)
        .count() == 0L)
      val totalWords = r.agg(sum("n_words")).as[Long].head()
      val corpusWords = docs.select(sum(size(org.apache.spark.sql.functions
        .filter(TextOps.tokens(col("text")), w => w =!= "")))).as[Long].head()
      assert(totalWords == corpusWords, s"$totalWords vs $corpusWords")
    } finally { r.unpersist(); () }
  }

  // --------------------------------------------- quality_perplexity_bucket

  test("qualityPerplexityBuckets: one verdict per scored doc, buckets value-ordered per source") {
    val flu = PretrainOps.qualityTrigramFluency(docs)
    val r = PretrainOps.qualityPerplexityBuckets(docs).cache()
    try {
      assert(r.count() == flu.count(),
        "every fluency-scored doc gets exactly one bucket")
      assert(r.select("doc_id").distinct().count() == r.count())
      assert(r.filter(!col("bucket").isin("head", "middle", "tail")).count() == 0L)
      // the cuts are VALUES: within a source every tail score < every
      // middle score < every head score (strict — bucket predicates are
      // strict > against the cut, so threshold ties sink)
      val bySrc = r.select("source", "bucket", "p_mean_micro")
        .as[(String, String, Long)].collect().groupBy(_._1)
      for ((src, rows) <- bySrc) {
        val b = rows.groupBy(_._2).view.mapValues(_.map(_._3)).toMap
        for (t <- b.get("tail"); m <- b.get("middle"))
          assert(t.max < m.min, s"$src: tail must sit strictly below middle")
        for (m <- b.get("middle"); h <- b.get("head"))
          assert(m.max < h.min, s"$src: middle must sit strictly below head")
        for (t <- b.get("tail"); h <- b.get("head"); if !b.contains("middle"))
          assert(t.max < h.min, s"$src: tail must sit strictly below head")
      }
    } finally { r.unpersist(); () }
  }

  test("qualityPerplexityBuckets: a single-doc source is tail; short docs absent") {
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon", "solo"), // one doc, one source
      (2L, "hi there", "shorty") // < 3 tokens: no trigram score
    ).toDF("doc_id", "text", "source")
    val r = PretrainOps.qualityPerplexityBuckets(planted)
      .select("doc_id", "bucket").as[(Long, String)].collect().toSeq
    assert(r == Seq((1L, "tail")),
      s"solo doc has no relative evidence (both cuts equal its score): $r")
  }

  // ------------------------------------------------------------ knn_graph

  test("knnGraph: min(k, |cluster|-1) contiguous-rank edges per vector, all within-cluster") {
    import graft.ops.SimilarityOps
    val g = SimilarityOps.knnGraph(emb).cache()
    try {
      // recompute each vector's cluster via the same public assignment path
      val clusters = graft.ops.DedupOps.dedupSemantic(emb)
        .select("vec_id", "cluster_id").as[(Long, Long)].collect().toMap
      val sizes = clusters.values.groupBy(identity).view.mapValues(_.size).toMap
      val edges = g.select("vec_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect()
      // every edge stays inside its source's cluster
      assert(edges.forall { case (v, n, _) => clusters(v) == clusters(n) })
      // per vector: exactly min(k, clusterSize-1) edges, ranks 1..m
      val byV = edges.groupBy(_._1)
      for ((v, es) <- byV) {
        val expect = math.min(SimilarityOps.KnnGraphK, sizes(clusters(v)) - 1)
        assert(es.length == expect, s"vec $v: ${es.length} vs $expect")
        assert(es.map(_._3).sorted.sameElements(1L to expect.toLong))
      }
      // vectors alone in their cluster (and only those) are absent
      val lonely = clusters.filter { case (_, c) => sizes(c) == 1 }.keySet
      assert(clusters.keySet -- byV.keySet == lonely)
      // the rank<=k filter must pre-limit map-side: WindowGroupLimit planned
      assert(g.queryExecution.optimizedPlan.toString.contains("WindowGroupLimit"),
        "rank filter should plan as WindowGroupLimit")
    } finally { g.unpersist(); () }
  }
}
