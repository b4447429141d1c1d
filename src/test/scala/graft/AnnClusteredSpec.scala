package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** The ANN family on a CLUSTERED embedding fixture — the regime the
  * operators exist for. The driver's near-uniform synthetic embeddings
  * are the documented ANN worst case: no cluster structure, so the
  * lifts the monitors measure (learned centroids over the fixed ladder,
  * greedy k-center seeding, prototype entry points) are invisible or
  * inverted there. On a deterministic mixture of spherical blobs
  * ([[graft.ScaleData.clusteredEmbeddings]], md5-derived — no RNG),
  * every documented ordering must hold, and since everything is
  * deterministic these are exact regression pins, not statistical
  * claims.
  */
class AnnClusteredSpec extends SparkSuite {

  private lazy val emb = graft.ScaleData.clusteredEmbeddings(spark).cache()

  private def meanRecall(df: DataFrame): Map[String, Double] =
    df.groupBy("method").agg(avg("recall").as("r")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("clustered corpus: trained centroids beat the untrained ladder; fp init ≥ ladder init") {
    assert(emb.count() == 512)
    val untrained = meanRecall(
      SimilarityOps.knnRecallWith(emb, SimilarityOps.defaultCentroids))
    val (ladderTrained, _) = SimilarityOps.ivfTrain(emb)
    val trained = meanRecall(SimilarityOps.knnRecallWith(emb, ladderTrained))
    val fp = SimilarityOps.farthestPointInit(emb)
    val (fpTrained, _) = SimilarityOps.ivfTrain(emb, init = fp)
    val fpRecall = meanRecall(SimilarityOps.knnRecallWith(emb, fpTrained))
    Seq("cluster_1probe", "cluster_2probe").foreach { m =>
      // training on the actual distribution must beat the fixed ladder —
      // THE lift the recall monitor exists to show (strict: the measured
      // gap is ~0.4 of recall, far beyond any tie)
      assert(trained(m) > untrained(m),
        s"$m: trained ${trained(m)} ≤ untrained ${untrained(m)}")
      // greedy k-center seeding ≥ the ladder init — the ordering that is
      // INVERTED on the near-uniform fixture (pinned there as the honest
      // option-not-default grade) and flips back here, on the regime the
      // init is for
      assert(fpRecall(m) >= trained(m),
        s"$m: fp-init ${fpRecall(m)} < ladder-init ${trained(m)}")
      // blobs this tight are essentially solvable: the trained coarse
      // quantizer should place nearly every true neighbor in-probe
      assert(fpRecall(m) >= 0.9, s"$m: fp-init recall ${fpRecall(m)} < 0.9")
    }
    // 2-probe ≥ 1-probe stays structural on any corpus
    assert(trained("cluster_2probe") >= trained("cluster_1probe"))
  }

  test("clustered corpus: prototype entry points beat fixed seeds under TRAINED centroids") {
    val fp = SimilarityOps.farthestPointInit(emb)
    val (cents, _) = SimilarityOps.ivfTrain(emb, init = fp)
    val exact = SimilarityOps.annTopkBruteForce(emb)
      .filter(col("rank") <= SimilarityOps.KnnGraphK)
      .select("query_id", "neighbor_id").cache()
    try {
      val n = exact.count()
      def recallOf(g: DataFrame): Double =
        exact.join(g.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count().toDouble / n
      val hier = recallOf(
        SimilarityOps.annGraphSearchHier(emb, hops = 2, centroids = cents))
      val fixed = recallOf(
        SimilarityOps.annGraphSearch(emb, hops = 2, centroids = cents))
      // entering at each LEARNED cell's prototype spans the blobs from
      // hop 0; arbitrary fixed seeds must first walk out of whichever
      // blob they landed in (measured ~0.52 vs ~0.28 — strict)
      assert(hier > fixed, s"hier $hier ≤ fixed $fixed")
      // caveat pinned: prototypes of BAD cells are bad entries — under
      // the untrained ladder the hier lift is not guaranteed, which is
      // why the production loop trains first (the ivfTrain → search
      // composition this spec exercises)
    } finally { exact.unpersist(); () }
  }

  test("two-level entry hierarchy: recall ≥ one-level at equal beam; both beat fixed seeds") {
    val fp = SimilarityOps.farthestPointInit(emb)
    val (cents, _) = SimilarityOps.ivfTrain(emb, init = fp)
    val exact = SimilarityOps.annTopkBruteForce(emb)
      .filter(col("rank") <= SimilarityOps.KnnGraphK)
      .select("query_id", "neighbor_id").cache()
    try {
      val n = exact.count()
      def recallOf(g: DataFrame): Double =
        exact.join(g.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id")).count().toDouble / n
      val hier2 = recallOf(
        SimilarityOps.annGraphSearchHier2(emb, hops = 2, centroids = cents))
      val hier1 = recallOf(
        SimilarityOps.annGraphSearchHier(emb, hops = 2, centroids = cents))
      val fixed = recallOf(
        SimilarityOps.annGraphSearch(emb, hops = 2, centroids = cents))
      // the prototype layer is fully covered (one entry per super-cell,
      // every prototype one proto-hop away), so descending through two
      // levels must not LOSE entry coverage vs scoring all K prototypes
      // at hop 0 — while the hop-0 candidate count drops from K to
      // superK, the scale story the layer exists for
      assert(hier2 >= hier1, s"two-level $hier2 < one-level $hier1")
      assert(hier2 > fixed, s"two-level $hier2 ≤ fixed seeds $fixed")
    } finally { exact.unpersist(); () }
  }

  test("matryoshka truncation: recall rises with prefix dims; clustered structure survives 16 of 64 dims") {
    val byDims = SimilarityOps.matryoshkaRecall(emb)
      .groupBy("mrl_dims").agg(avg("recall").as("r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // monotone in dims — the MRL premise; strict on the clustered blobs
    assert(byDims(32L) > byDims(16L),
      s"recall must rise with prefix dims, got $byDims")
    // blob geometry concentrates in the leading dims' offsets enough
    // that HALF the dims keep most of the exact top-K
    assert(byDims(32L) > 0.5, s"32-dim recall collapsed: $byDims")
  }
}
