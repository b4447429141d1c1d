package graft.ops

/** MinHash-LSH parameter selection from the banding S-curve — the pure
  * tuning half of the measured monitors ([[DedupOps.dedupLshRecall]]
  * reports realized banding recall, [[SimilarityOps.annRecall]] the ANN
  * analog): the monitors tell you what the current (Bands, RowsPerBand)
  * achieves; this picks the parameters for a TARGET.
  *
  * Theory (standard LSH banding, Leskovec/Rajaraman/Ullman ch. 3): two
  * docs with Jaccard similarity j share a given band of r hashes with
  * probability j^r, hence share ≥ 1 of b bands with probability
  * 1 − (1 − j^r)^b — the S-curve. Recall at threshold t is that curve
  * evaluated at j = t (pairs AT the threshold are the hardest to catch;
  * anything more similar collides with higher probability).
  *
  * The repo default K=16 = 4×4 ([[DedupOps.K]]) has S-curve
  * 1 − (1 − t⁴)⁴: recall ≈ 0.667 at t=0.7, ≈ 0.878 at t=0.8,
  * ≈ 0.986 at t=0.9 — tuned for near-dup thresholds (t ≥ 0.8) at a
  * 16-hash signature cost.
  */
object LshTuning {

  final case class LshParams(bands: Int, rowsPerBand: Int) {
    require(bands >= 1 && rowsPerBand >= 1, "bands and rowsPerBand must be ≥ 1")
    /** Signature length this choice costs (hashes per doc). */
    def k: Int = bands * rowsPerBand
    /** S-curve: P(two docs with Jaccard j share ≥ 1 band). */
    def collisionProb(j: Double): Double =
      1.0 - math.pow(1.0 - math.pow(j, rowsPerBand.toDouble), bands.toDouble)
  }

  /** The repo default ([[DedupOps.Bands]] × [[DedupOps.RowsPerBand]]). */
  val Default: LshParams = LshParams(DedupOps.Bands, DedupOps.RowsPerBand)

  /** Pick the CHEAPEST (bands, rowsPerBand) whose S-curve reaches
    * `recallGoal` at Jaccard threshold `t`: minimal signature length
    * K = b×r, tie broken toward more rows per band (a sharper curve —
    * same recall at t, fewer sub-threshold false-positive collisions,
    * which at 100 TB is candidate-pair volume, the thing that costs).
    * For each r the minimal b is closed-form:
    * b = ⌈ln(1−goal) / ln(1−t^r)⌉. Throws if no choice within `maxK`
    * reaches the goal (raise maxK — recall costs signature width).
    */
  def pick(t: Double, recallGoal: Double, maxK: Int = 256): LshParams = {
    require(t > 0.0 && t < 1.0, s"threshold t must be in (0,1), got $t")
    require(recallGoal > 0.0 && recallGoal < 1.0,
      s"recallGoal must be in (0,1), got $recallGoal")
    val candidates = for {
      r <- 1 to maxK
      tr = math.pow(t, r.toDouble)
      if tr > 0.0 // underflow: no b within any budget helps
      b = math.max(1, math.ceil(math.log1p(-recallGoal) / math.log1p(-tr)).toInt)
      if b.toLong * r <= maxK
    } yield LshParams(b, r)
    require(candidates.nonEmpty,
      s"no (bands, rowsPerBand) with K ≤ $maxK reaches recall $recallGoal " +
        s"at t=$t — raise maxK")
    candidates.minBy(p => (p.k, -p.rowsPerBand))
  }
}
