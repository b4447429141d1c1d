package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, SimilarityOps}

/** Round-8 operator specs: granularity-∝-N as the production default for
  * the cluster-blocked pair ops, the 2-probe boundary fix, and the
  * measured recall monitor.
  */
class Round8OpsSpec extends SparkSuite {

  private def emb: DataFrame = spark.read.parquet(s"$sf/embeddings.parquet")

  private def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  test("auto centroid count: ∝ N with the oracle floor") {
    // below the floor: tiny corpora keep the pinned-8 shape
    assert(SimilarityOps.knnAutoCentroidCount(100) == SimilarityOps.IvfCentroids)
    assert(SimilarityOps.knnAutoCentroidCount(8 * 256) == 8)
    // above: ⌈N/256⌉ — constant expected cluster size
    assert(SimilarityOps.knnAutoCentroidCount(10 * 256) == 10)
    assert(SimilarityOps.knnAutoCentroidCount(10 * 256 + 1) == 11)
    assert(SimilarityOps.knnAutoCentroidCount(1_000_000) == 3907)
    // the generator extends the SAME ladder the oracle pins at 8
    assert(SimilarityOps.autoCentroidSet(SimilarityOps.IvfCentroids) ==
      SimilarityOps.defaultCentroids)
  }

  test("knnGraphAuto ≡ knnGraph at fixture scale (auto resolves to the floor)") {
    // sf0.001 has < 8·256 vectors, so the auto rule lands exactly on the
    // pinned oracle shape — the default path and the oracle key agree
    assert(emb.count() < 8L * 256)
    assert(rows(SimilarityOps.knnGraphAuto(emb)) ==
      rows(SimilarityOps.knnGraph(emb)))
  }

  test("knnGraphAuto derives more clusters on a bigger corpus") {
    // synthesize 4× the fixture by shifting vec_ids: the auto rule must
    // pick K > 8 once N crosses the floor, and the graph still builds
    val big = (0 until 12).map(i =>
        emb.select((col("vec_id") + lit(i * 100000L)).as("vec_id"),
          col("embedding"), col("label")))
      .reduce(_.unionByName(_))
    val n = big.count()
    val k = SimilarityOps.knnAutoCentroidCount(n)
    assert(k > SimilarityOps.IvfCentroids, s"expected >8 clusters for n=$n")
    val g = SimilarityOps.knnGraphAuto(big)
    assert(g.columns.toSeq == Seq("vec_id", "neighbor_id", "rank", "cos_sim"))
    assert(g.count() > 0)
  }

  test("dedupSemanticAuto ≡ dedupSemantic at fixture scale") {
    assert(rows(DedupOps.dedupSemanticAuto(emb)) ==
      rows(DedupOps.dedupSemantic(emb)))
  }

  test("annGraphSearchIndexed ≡ annGraphSearch over a persisted graph") {
    val dir = java.nio.file.Files.createTempDirectory("knn_graph_idx").toString
    SimilarityOps.writeKnnGraphIndex(emb, dir)
    assert(rows(SimilarityOps.annGraphSearchIndexed(spark, dir, emb)) ==
      rows(SimilarityOps.annGraphSearch(emb)))
  }

  test("farthestPointInit: deterministic, unit-norm, k distinct, trains monotonically") {
    val a = SimilarityOps.farthestPointInit(emb)
    val b = SimilarityOps.farthestPointInit(emb)
    assert(a == b, "greedy k-center must be reproducible — no RNG anywhere")
    assert(a.size == SimilarityOps.IvfCentroids)
    assert(a.distinct.size == a.size, "seeds must be distinct vectors")
    a.foreach(v => assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9))
    // Lloyd from these seeds keeps its monotone-objective contract
    val (_, objs) = SimilarityOps.ivfTrain(emb, init = a)
    assert(objs.zip(objs.drop(1)).forall { case (p, n) => n >= p - 1e-12 },
      s"objective regressed: $objs")
  }

  test("knnPagerank ≡ naive integer power iteration on the same edges") {
    import org.apache.spark.sql.functions._
    val edges = SimilarityOps.knnGraph(emb)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var pr = nodes.map(_ -> 1000000L).toMap
    (1 to SimilarityOps.PrIters).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => pr(s) / outDeg(s) }.sum
      }
      pr = nodes.map(v => v -> (150000L +
        (SimilarityOps.PrDampNum * in.getOrElse(v, 0L)) / 100L)).toMap
    }
    val got = SimilarityOps.knnPagerank(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == pr)
    // the teleport term is every node's floor
    assert(got.values.forall(_ >= 150000L))
    // centrality actually varies (a flat graph would make the op vacuous)
    assert(got.values.toSet.size > 1)
  }

  test("annGraphSearchHier: prototype entry points never lose to arbitrary seeds") {
    import org.apache.spark.sql.functions._
    val exact = SimilarityOps.annTopkBruteForce(emb)
      .filter(col("rank") <= SimilarityOps.KnnGraphK)
      .select("query_id", "neighbor_id").cache()
    try {
      val n = exact.count()
      def recallOf(g: org.apache.spark.sql.DataFrame): Double =
        exact.join(g.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count().toDouble / n
      // all-deterministic, so this is an exact regression pin, not a
      // statistical claim: at the tight hop budget the cluster-prototype
      // entry layer must do at least as well as the arbitrary fixed seeds
      val hier = recallOf(SimilarityOps.annGraphSearchHier(emb, hops = 2))
      val fixed = recallOf(SimilarityOps.annGraphSearch(emb, hops = 2))
      assert(hier >= fixed, s"hier $hier < fixed $fixed")
      // contract: dense ranks ≤ k per query
      val g = SimilarityOps.annGraphSearchHier(emb)
      val per = g.groupBy("query_id")
        .agg(count(lit(1)).as("c"), max("rank").as("mx")).collect()
      assert(per.forall(r => r.getLong(1) <= SimilarityOps.KnnGraphK &&
        r.getLong(1) == r.getLong(2)))
    } finally { exact.unpersist() }
  }

  test("annGraphSearch: valid beams, recall>0 and MONOTONE in hop count") {
    import org.apache.spark.sql.functions._
    val exact = SimilarityOps.annTopkBruteForce(emb)
      .filter(col("rank") <= SimilarityOps.KnnGraphK)
      .select("query_id", "neighbor_id").cache()
    try {
      val nExact = exact.count()
      def recall(h: Int): Double = {
        val g = SimilarityOps.annGraphSearch(emb, hops = h)
        // contract: ranks dense 1..k per query, neighbor ≠ query
        val per = g.groupBy("query_id")
          .agg(count(lit(1)).as("n"), max("rank").as("mx")).collect()
        assert(per.forall(r => r.getLong(1) <= SimilarityOps.KnnGraphK &&
          r.getLong(1) == r.getLong(2)))
        assert(g.filter(col("neighbor_id") === col("query_id")).isEmpty)
        exact.join(g.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count().toDouble / nExact
      }
      // pointwise-better beams ⇒ recall can only grow with hops: each
      // beam is the top-B of a superset of the previous beam, and a
      // kept-over-exact swap would need a non-member with HIGHER cosine
      // than a member — impossible against the global top-k
      val (r1, r2, r3) = (recall(1), recall(2), recall(3))
      assert(r2 >= r1 && r3 >= r2, s"recall not monotone: $r1 $r2 $r3")
      assert(r3 > 0.0, "3-hop walk found nothing from the fixed seeds")
    } finally { exact.unpersist() }
  }

  test("broadcast-join arg-max assignment ≡ literal dot-array (K past the codegen cliff)") {
    // K=40 > LiteralCentroidMax → the join path runs; forcing the
    // literal path on the SAME centroids via conf must give identical
    // graphs (incl. the tie rule: highest dot, then lowest centroid id)
    val cents = SimilarityOps.autoCentroidSet(40)
    val viaJoin = rows(SimilarityOps.knnGraph(emb, SimilarityOps.KnnGraphK, cents))
    val viaJoinDedup = rows(DedupOps.dedupSemantic(emb, cents))
    spark.conf.set(SimilarityOps.LiteralCentroidMaxConf, "1000")
    try {
      assert(rows(SimilarityOps.knnGraph(emb, SimilarityOps.KnnGraphK, cents))
        == viaJoin, "knnGraph assignment paths disagree")
      assert(rows(DedupOps.dedupSemantic(emb, cents)) == viaJoinDedup,
        "dedupSemantic assignment paths disagree")
    } finally spark.conf.unset(SimilarityOps.LiteralCentroidMaxConf)
  }

  test("2-probe recall dominates 1-probe recall per query") {
    // the 2-probe candidate set is a superset per query, and a candidate
    // that displaces a true neighbor from the window is itself globally
    // closer (hence also in the exact top-k) — so recall can only rise
    val r = SimilarityOps.knnRecall(emb)
      .groupBy("query_id")
      .pivot("method", Seq("cluster_1probe", "cluster_2probe"))
      .agg(first("recall"))
      .collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val r1 = row.getAs[Double]("cluster_1probe")
      val r2 = row.getAs[Double]("cluster_2probe")
      assert(r2 >= r1, s"query ${row.get(0)}: 2-probe $r2 < 1-probe $r1")
    }
  }

  test("knnRecallWith runs the monitor against a LEARNED quantizer") {
    // the production loop: ivfTrain learns the coarse set, the recall
    // monitor decides whether nProbe=1 blocking is safe with it. The
    // sf0.01 measurement (SCALING round 8): fixed 0.10/0.40 vs learned
    // k=8 0.40/0.625 — here we assert the harness contract (both
    // methods present, recall is a valid fraction, 2-probe dominates),
    // not the data-dependent lift.
    val (learned, _) = SimilarityOps.ivfTrain(emb, k = SimilarityOps.IvfCentroids)
    val r = SimilarityOps.knnRecallWith(emb, learned)
      .groupBy("query_id")
      .pivot("method", Seq("cluster_1probe", "cluster_2probe"))
      .agg(first("recall")).collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val r1 = row.getAs[Double]("cluster_1probe")
      val r2 = row.getAs[Double]("cluster_2probe")
      assert(r1 >= 0.0 && r1 <= 1.0 && r2 >= 0.0 && r2 <= 1.0)
      assert(r2 >= r1, s"2-probe must dominate under any quantizer")
    }
  }

  test("bpe_token_count kernel ≡ the aggregate-HOF merge fold, real corpus + trained merges") {
    import graft.ops.TokenizerOps
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = TokenizerOps.bpeTrain(docs, TokenizerOps.NumMerges)
    assert(rows(TokenizerOps.tokenizeBpe(docs, merges)) ==
      rows(TokenizerOps.tokenizeBpeFold(docs, merges)),
      "kernel and fold disagree on trained merges")
    // adversarial merge shapes: chained merges (a+b then ab+c), merges
    // over multi-char symbols, a merge that never fires, unicode incl.
    // an astral code point (code-point decomposition, not UTF-16 units)
    val tricky = Seq(
      (1L, "abc abcabc cab"), (2L, "aaaa aaa aa a"),
      (3L, "ab ab ababab"), (4L, "xéz 😀ab 你好"),
      (5L, ""), (6L, "zzz")
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val chained = Seq(TokenizerOps.BpeMerge("a", "b", 9),
      TokenizerOps.BpeMerge("ab", "c", 5), TokenizerOps.BpeMerge("a", "a", 4),
      TokenizerOps.BpeMerge("aa", "aa", 2), TokenizerOps.BpeMerge("q", "q", 1))
    assert(rows(TokenizerOps.tokenizeBpe(tricky, chained)) ==
      rows(TokenizerOps.tokenizeBpeFold(tricky, chained)),
      "kernel and fold disagree on adversarial merges")
  }

  test("2-probe graph edges are a superset-rank refinement: k per vector, no dup pairs") {
    val g2 = SimilarityOps.knnGraph2Probe(emb)
    val dups = g2.groupBy("vec_id", "neighbor_id").count()
      .filter(col("count") > 1).count()
    assert(dups == 0, "a (vec, neighbor) pair scored twice — probe lists overlap")
    val over = g2.groupBy("vec_id").count()
      .filter(col("count") > SimilarityOps.KnnGraphK).count()
    assert(over == 0)
  }
}
