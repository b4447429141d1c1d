package graft

import org.apache.spark.sql.functions._
import graft.ops.PostTrainOps

/** Bradley–Terry fit contracts: the driver-side MM loop equals a naive
  * from-the-formula reimplementation; the likelihood is monotone over
  * the rounds (Hunter 2004's MM guarantee, surviving the micro
  * quantization); planted match matrices order strengths the way the
  * outcomes say; and the distributed reduction feeds the loop the
  * matrix a hand count produces.
  */
class BtStrengthSpec extends SparkSuite {
  import spark.implicits._

  // naive reimplementation, straight from the documented arithmetic —
  // deliberately NOT sharing code with btIterate
  private def naive(matrix: Seq[(Long, Long, Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val ordered = matrix.flatMap { case (lo, hi, n, wl) =>
      Seq((lo, hi, n, wl), (hi, lo, n, n - wl)) }
    val ps = ordered.map(_._1).distinct.sorted
    var s = ps.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val next = ps.map { i =>
        val w = ordered.filter(_._1 == i).map(_._4).sum
        var d = 0L
        for ((_, j, n, _) <- ordered.filter(_._1 == i))
          d += n * 1000000000000L / (s(i) + s(j))
        i -> math.max(math.floor(w.toDouble * 1e12 / d.toDouble).toLong, 1L)
      }.toMap
      val tot = ps.map(next).sum
      s = ps.map(i => i -> math.max(
        math.floor(next(i).toDouble * (ps.size * 1000000L).toDouble /
          tot.toDouble).toLong, 1L)).toMap
    }
    s
  }

  private def logLik(matrix: Seq[(Long, Long, Long, Long)],
      s: Map[Long, Long]): Double =
    matrix.map { case (lo, hi, n, wl) =>
      val (si, sj) = (s(lo).toDouble, s(hi).toDouble)
      wl * math.log(si) + (n - wl) * math.log(sj) - n * math.log(si + sj)
    }.sum

  private val planted: Seq[(Long, Long, Long, Long)] = Seq(
    (0L, 1L, 100L, 90L), // 0 dominates 1
    (1L, 2L, 100L, 80L), // 1 dominates 2
    (0L, 2L, 50L, 48L))  // 0 dominates 2 (transitively consistent)

  test("MM loop ≡ naive integer reimplementation, strengths ordered by dominance") {
    val got = PostTrainOps.btIterate(planted)
      .map(r => r._1 -> r._4).toMap
    assert(got === naive(planted, PostTrainOps.BtRounds))
    assert(got(0L) > got(1L) && got(1L) > got(2L),
      s"dominance order must be reflected in strengths: $got")
    // wins/matches bookkeeping
    val rows = PostTrainOps.btIterate(planted).map(r => r._1 -> r).toMap
    assert(rows(0L)._2 === 138L && rows(0L)._3 === 150L) // 90 + 48 of 150
    assert(rows(2L)._2 === 22L && rows(2L)._3 === 150L)  // 20 + 2 of 150
  }

  test("likelihood is monotone over the MM rounds (quantization-tolerant)") {
    var prev = Double.NegativeInfinity
    for (r <- 1 to PostTrainOps.BtRounds) {
      val s = naive(planted, r)
      val ll = logLik(planted, s)
      assert(ll >= prev - 1e-6,
        s"round $r decreased the likelihood: $prev -> $ll")
      prev = ll
    }
  }

  test("distributed reduction produces the hand-counted match matrix") {
    // two prompt groups; policies are md5-derived, so read them off the
    // operator's own assignment and hand-count the outcomes
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val out = PostTrainOps.btStrength(docs).collect()
    assert(out.nonEmpty, "fixture must produce estimable policies")
    // totals: every match contributes one win and appears in both
    // policies' match counts
    val wins = out.map(_.getLong(1)).sum
    val matches = out.map(_.getLong(2)).sum
    assert(matches === 2 * wins, s"Σmatches=2·Σwins violated: $matches vs $wins")
    // strengths normalized to mean ~1 (floor+clamp keeps it within 1‰)
    val meanStrength = out.map(_.getDouble(4)).sum / out.length
    assert(math.abs(meanStrength - 1.0) < 0.001, s"mean strength $meanStrength")
    // degenerate: no candidates → empty, schema intact
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val e = PostTrainOps.btStrength(empty)
    assert(e.count() === 0L && e.columns.toSeq ===
      Seq("policy_id", "n_wins", "n_matches", "strength_micros", "strength"))
  }

  test("match matrix merges across shards: sum-fold ≡ union's matrix, strengths identical") {
    // the sufficient statistic is an associative (n, wins) sum per
    // policy pair — shard matrices merge into exactly the union's
    // matrix, so the MM fit over merged shards IS the global fit (the
    // prefState split-invariance discipline). Prompt GROUPS must stay
    // intact within a shard (a group's pairs are within-group), which
    // the prompt_id partitioning provides by construction.
    val shardA = Seq((0L, 1L, 60L, 50L), (1L, 2L, 40L, 30L))
    val shardB = Seq((0L, 1L, 40L, 40L), (0L, 2L, 50L, 48L), (1L, 2L, 60L, 50L))
    val merged = (shardA ++ shardB)
      .groupBy { case (lo, hi, _, _) => (lo, hi) }
      .map { case ((lo, hi), xs) =>
        (lo, hi, xs.map(_._3).sum, xs.map(_._4).sum) }
      .toSeq.sortBy(x => (x._1, x._2))
    val direct = Seq((0L, 1L, 100L, 90L), (0L, 2L, 50L, 48L), (1L, 2L, 100L, 80L))
    assert(merged === direct.sortBy(x => (x._1, x._2)))
    assert(PostTrainOps.btIterate(merged) === PostTrainOps.btIterate(direct))
  }

  test("one-sided matrix: the never-winning policy pins at the 1-micro clamp") {
    val oneSided = Seq((0L, 1L, 50L, 50L)) // policy 1 never wins
    val got = PostTrainOps.btIterate(oneSided).map(r => r._1 -> r._4).toMap
    assert(got(1L) === 1L, s"loser must clamp at 1 micro: $got")
    assert(got(0L) > 1000000L, s"winner must absorb the mass: $got")
  }
}
