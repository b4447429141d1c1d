package graft

import org.apache.spark.sql.functions._
import graft.ops.{CdcOps, DedupOps}

/** Adversarial-input robustness (round 13): the degenerate corpora that
  * break naive blocking — every embedding in ONE cluster, 90% of actions
  * on ONE key — must stay bounded. Companion measurements in SCALING.md
  * ("Adversarial skew cells").
  */
class AdversarialSkewSpec extends SparkSuite {
  private val oneCentroid = Seq(IndexedSeq(1.0, 0.0))

  private def identicalVecs(n: Int) = spark.range(n.toLong)
    .select(col("id").as("vec_id"),
      array(lit(1.0f), lit(0.0f)).as("embedding"))

  test("semantic candidate cap is a no-op for clusters within the cap") {
    // 50 identical vectors, one cluster: every C(50,2) pair must still be
    // produced — the cap removes no lower-id candidate when |c| <= cap
    val rows = DedupOps.semanticThresholdSweep(identicalVecs(50), oneCentroid)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._2 == 50L * 49 / 2), s"pairs lost under cap: ${rows.toSeq}")
    assert(rows.forall(_._3 == 49), "every non-minimum vector is a dup")
    val kept = DedupOps.dedupSemantic(identicalVecs(50), oneCentroid)
      .filter(col("keep")).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(0L), "only the min id survives")
  }

  test("semantic candidate cap bounds a collapsed mega-cluster linearly") {
    val n = DedupOps.SemanticCandidateCap + 104 // past the cap
    val cap = DedupOps.SemanticCandidateCap
    // capped pair count: sum over rank r of min(r-1, cap) — LINEAR tail,
    // vs C(n,2) uncapped (the adversarial quadratic this cap exists for)
    val expected = cap.toLong * (cap + 1) / 2 + (n - cap - 1).toLong * cap
    val uncapped = n.toLong * (n - 1) / 2
    assert(expected < uncapped, "fixture must actually exercise the cap")
    val rows = DedupOps.semanticThresholdSweep(identicalVecs(n), oneCentroid)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._1 == expected),
      s"pair count ${rows.head._1} != capped-geometry $expected")
    // decision semantics unchanged on collapse: the earliest members are
    // tau-neighbors of everything, so all but the minimum are dropped
    assert(rows.forall(_._2 == n - 1))
    val kept = DedupOps.dedupSemantic(identicalVecs(n), oneCentroid)
      .filter(col("keep")).count()
    assert(kept == 1)
  }

  test("files-admitted change streams fan out at the source; byte-admitted do not") {
    // the round-13 lesson: a maxFilesPerTrigger=1 micro-batch is narrow
    // BY CONSTRUCTION (and a one-row-group file lies about its width
    // through empty byte-range splits), so the source itself must carry
    // the fanout shuffle; byte admission spans many files and must NOT
    // pay an extra exchange
    import graft.stream.Pipeline
    val dir = java.nio.file.Files.createTempDirectory("graft-fanout").toString
    def hasRepartition(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.logical.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => r
      }.nonEmpty
    assert(hasRepartition(Pipeline.changeStream(spark, dir)),
      "files-admitted stream must fan out pre-chain")
    assert(!hasRepartition(Pipeline.changeStream(spark, dir,
        maxBytesPerTrigger = Some(1L << 30))),
      "byte-admitted stream must not pay an extra exchange")
    // round 14: the operator-declared events-per-file hint gates the
    // exchange STATICALLY — small declared batches (the reference's
    // 10k-event ticker regime) skip it, big ones keep it, unset keeps it
    spark.conf.set(Pipeline.FanoutEventsPerFileHintConf, "10000")
    try {
      assert(!hasRepartition(Pipeline.changeStream(spark, dir)),
        "a declared-small batch must skip the pre-chain exchange")
      spark.conf.set(Pipeline.FanoutEventsPerFileHintConf, "2000000")
      assert(hasRepartition(Pipeline.changeStream(spark, dir)),
        "a declared-big batch must keep the exchange")
    } finally spark.conf.unset(Pipeline.FanoutEventsPerFileHintConf)
  }

  test("patch pair amplification: dense churn buckets fall back to the distributed anti-join") {
    // The r13 hole: the InSet patch's maxChurnKeys guard bounds churn
    // KEYS, but candidate PAIRS amplify by bands × BandBucketCap — a
    // churn of near-duplicate docs concentrates into shared band
    // buckets and can legally produce a driver-killing pair collect.
    // With the pair bound forced tiny the patch must take the
    // DISTRIBUTED fresh-pair anti-join and still be ≡ from-scratch.
    import graft.ops.CorpusOps
    import spark.implicits._
    val en = "the quick brown fox jumps over the lazy dog and then " +
      "the small cat sits on the warm mat near the open door "
    val shared = (1 to 30).map(i => s"body$i").mkString(" ")
    val base = (1L to 20L).map(i => (i, en + s"distinct document $i " +
      (1 to 12).map(j => s"u$i$j").mkString(" "), "s"))
    // 90 ADDED near-dups: long shared shingle run + one unique tail
    // word → most bands collide into the same buckets
    val added = (100L to 189L).map(i => (i, en + shared + s" tail$i", "s"))
    val v1 = base.toDF("doc_id", "text", "source")
    val v2 = (base ++ added).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("cleanstate-pa").toString
    CorpusOps.writeCleanState(CorpusOps.cleanState(v1), "ics_pa", dir)
    val diff = CorpusOps.corpusDiff(v1, v2)
    val scratch = CorpusOps.cleanCorpus(v2).collect().map(_.toSeq).toSet

    // collected regime (default bound): the reference behavior
    val (incC, nextC) = CorpusOps.cleanCorpusIncrementalPruned(
      spark, v2, "ics_pa", diff)
    assert(incC.collect().map(_.toSeq).toSet === scratch,
      "collected-regime patch diverged from the rebuild")
    // the fixture genuinely amplifies: far more candidate pairs than
    // churn keys (90), so a tiny pair bound will actually gate
    assert(nextC.cands.select("doc_a", "doc_b").distinct().count() > 500,
      "fixture must produce an amplified pair space")

    spark.conf.set(CorpusOps.PatchMaxPairCollectConf, "10")
    try {
      val (incD, nextD) = CorpusOps.cleanCorpusIncrementalPruned(
        spark, v2, "ics_pa", diff)
      assert(incD.collect().map(_.toSeq).toSet === scratch,
        "distributed-fallback patch diverged from the rebuild")
      assert(nextD.verdicts.collect().map(_.toSeq).toSet ===
        nextC.verdicts.collect().map(_.toSeq).toSet,
        "verdict face drifted between collected and distributed regimes")
    } finally spark.conf.unset(CorpusOps.PatchMaxPairCollectConf)
  }

  test("LWW dedup pushes a map-side WindowGroupLimit (hot keys cannot straggle)") {
    val hot = spark.range(100000).select(
      when(pmod(col("id"), lit(10)) < 9, lit("HOT"))
        .otherwise(concat(lit("k"), col("id"))).as("doc_id"),
      lit("idx1").as("index_name"),
      col("id").as("event_id"))
    val out = CdcOps.dedupLastWriteWins(hot)
    // rn = 1 filter over the keyed window must compile to WindowGroupLimit
    // (partial mode runs BEFORE the exchange — the hot key arrives at the
    // reducer as one row per upstream partition, not 90k rows)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    val winners = out.collect()
    assert(winners.length == 10000 + 1) // 10k cold keys + HOT
    val hotRow = winners.find(_.getString(0) == "HOT").get
    assert(hotRow.getLong(2) == 99998L, "latest event must win the hot key")
  }
}
