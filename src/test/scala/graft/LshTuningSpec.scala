package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.LshTuning
import graft.ops.LshTuning.LshParams

/** Pure S-curve parameter selection (no Spark): picked parameters must
  * actually reach the recall goal, be minimal in signature cost, and the
  * documented default-curve numbers must be the curve's numbers.
  */
class LshTuningSpec extends AnyFunSuite {

  test("the documented K=16 default curve numbers are correct") {
    val d = LshTuning.Default
    assert(d == LshParams(4, 4) && d.k == 16)
    assert(math.abs(d.collisionProb(0.7) - 0.667) < 0.001)
    assert(math.abs(d.collisionProb(0.8) - 0.8785) < 0.001)
    assert(math.abs(d.collisionProb(0.9) - 0.9860) < 0.001)
  }

  test("picked parameters reach the recall goal at the threshold") {
    for {
      t <- Seq(0.5, 0.7, 0.8, 0.9)
      goal <- Seq(0.8, 0.9, 0.95, 0.99)
    } {
      val p = LshTuning.pick(t, goal)
      assert(p.collisionProb(t) >= goal,
        s"t=$t goal=$goal picked $p with recall ${p.collisionProb(t)}")
      assert(p.k <= 256)
    }
  }

  test("minimality: no cheaper (b,r) within the budget also reaches the goal") {
    val t = 0.8; val goal = 0.9
    val p = LshTuning.pick(t, goal)
    val cheaper = for {
      r <- 1 to 256; b <- 1 to 256
      if b * r < p.k
      if LshParams(b, r).collisionProb(t) >= goal
    } yield (b, r)
    assert(cheaper.isEmpty, s"picked K=${p.k} but cheaper work: $cheaper")
  }

  test("sharper-curve tie-break: equal K prefers more rows per band") {
    val p = LshTuning.pick(0.8, 0.9)
    val sameK = (1 to p.k).filter(r => p.k % r == 0)
      .map(r => LshParams(p.k / r, r))
      .filter(q => q.collisionProb(0.8) >= 0.9)
    assert(sameK.forall(_.rowsPerBand <= p.rowsPerBand),
      s"picked $p but same-cost sharper choices exist: $sameK")
  }

  test("S-curve monotonicity: more similar pairs collide more") {
    val p = LshTuning.Default
    val probs = (1 to 9).map(i => p.collisionProb(i / 10.0))
    assert(probs == probs.sorted)
  }

  test("unreachable goals fail loudly, bad inputs rejected") {
    intercept[IllegalArgumentException] { LshTuning.pick(0.05, 0.999, maxK = 8) }
    intercept[IllegalArgumentException] { LshTuning.pick(0.0, 0.9) }
    intercept[IllegalArgumentException] { LshTuning.pick(0.8, 1.0) }
  }
}
