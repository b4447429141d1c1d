package graft

import org.scalatest.funsuite.AnyFunSuite

/** Seq/LSN layout of the [[PgStreamLoad]] generator: adjacent segments
  * must never overlap — the begin/relation carry windows in the decode
  * chain order by seq, so a duplicated range would mis-order them the
  * moment more than one file is admitted per micro-batch (round-14
  * ADVICE: the old fixed-1M spacing overlapped at 16M/8seg = 2M events
  * per segment).
  */
class PgStreamLoadSpec extends AnyFunSuite {

  test("segment seq ranges are disjoint and monotone for any sizing") {
    for {
      nEvents <- Seq(8, 1000, 1000000, 16000000)
      nSegments <- Seq(1, 3, 8, 32)
    } {
      val per = math.max(1, nEvents / nSegments)
      for (s <- 0 until nSegments - 1) {
        val maxSeq = PgStreamLoad.segmentMaxSeq(s, per)
        val nextBase = PgStreamLoad.segmentBase(s + 1, per)
        assert(maxSeq < nextBase,
          s"events=$nEvents segs=$nSegments: segment $s reaches seq " +
          s"$maxSeq but segment ${s + 1} starts at $nextBase")
        // the commit payload's embedded end-LSN (base + per + 1) must
        // also stay below the next base
        assert(PgStreamLoad.segmentBase(s, per) + per + 1 < nextBase)
      }
    }
  }

  test("the old fixed-1M spacing is the overlap this spec guards against") {
    // 16M events / 8 segments = 2M per segment: frame seqs reached
    // 2M+2 while the next segment's fixed base was 1M — overlapped
    val per = 16000000 / 8
    assert(1000000L * 1 < 0L + 2 + per,
      "regression fixture: the removed constant really did overlap")
  }
}
