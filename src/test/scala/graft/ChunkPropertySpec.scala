package graft

import graft.ops.CdcOps

/** Property-style tests for the reference's algebraic invariants
  * (internal/slices/slices.go), swept over a deterministic parameter grid
  * (the offline cache has no scalatest/scalacheck bridge artifact, so the
  * sweep replaces Gen-driven cases).
  */
class ChunkPropertySpec extends SparkSuite {
  import spark.implicits._

  private def actionsOf(n: Int) =
    (1 to n).map(i => (i.toLong, "index", s"d$i", "idx", s"s$i"))
      .toDF("event_id", "action_type", "doc_id", "index_name", "source")

  test("T8 chunk_split: chunks ≤ size, all full except last, all rows kept (slices.go:3-16)") {
    for ((n, size) <- Seq((1, 1), (7, 3), (100, 100), (101, 100), (200, 7))) {
      val chunks = CdcOps.chunkSplit(actionsOf(n), size)
        .select("chunk_id", "n_actions").as[(Long, Long)].collect().sortBy(_._1)
      assert(chunks.map(_._2).sum == n, s"n=$n size=$size")
      assert(chunks.forall(_._2 <= size), s"n=$n size=$size")
      assert(chunks.dropRight(1).forall(_._2 == size), s"n=$n size=$size")
    }
  }

  test("B5 concurrent_partition: exactly n chunks, sizes differ ≤ 1 (slices.go:18-39)") {
    for ((n, parts) <- Seq((4, 4), (10, 3), (100, 8), (97, 4), (5, 2))) {
      val sizes = CdcOps.concurrentPartition(actionsOf(n), parts)
        .select("n_actions").as[Long].collect()
      assert(sizes.length == parts, s"n=$n parts=$parts")
      assert(sizes.sum == n, s"n=$n parts=$parts")
      assert(sizes.max - sizes.min <= 1, s"n=$n parts=$parts")
    }
  }

  test("chunk_tokens tiling: windows cover every token exactly, count matches the formula") {
    import graft.ops.TextOps
    val W = TextOps.ChunkWindow.toLong
    val S = TextOps.ChunkStride.toLong
    val lens = Seq(1L, 3L, 24L, 25L, 31L, 32L, 33L, 48L, 56L, 57L, 60L, 100L, 200L)
    val docs = lens.map(n => (n, (1L to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextOps.chunkTokens(docs)
      .select("doc_id", "chunk_id", "start_tok", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    for (n <- lens) {
      val ws = rows.filter(_._1 == n).sortBy(_._2)
      val expect = (math.max(n - W, 0L) + S - 1) / S + 1
      assert(ws.length == expect, s"n=$n: ${ws.length} windows, expected $expect")
      assert(ws.forall { case (_, id, st, w) => st == id * S && w == math.min(W, n - st) },
        s"n=$n window geometry")
      val covered = ws.flatMap { case (_, _, st, w) => (st + 1) to (st + w) }.toSet
      assert(covered == (1L to n).toSet, s"n=$n: windows must tile the doc")
    }
  }

  test("B1 dedup property: output keys unique, each survivor is max event_id of its key") {
    val seeds = Seq(1, 7, 42)
    for (seed <- seeds) {
      val rnd = new scala.util.Random(seed)
      val keys = List.fill(60)(rnd.nextInt(12) + 1)
      val df = keys.zipWithIndex
        .map { case (k, i) => ((i + 1).toLong, "index", s"k$k", "idx", s"v$i") }
        .toDF("event_id", "action_type", "doc_id", "index_name", "source")
      val got = CdcOps.dedupLastWriteWins(df)
        .select("doc_id", "event_id").as[(String, Long)].collect()
      val expect = keys.zipWithIndex
        .groupBy { case (k, _) => k }
        .map { case (k, xs) => (s"k$k", xs.map(_._2 + 1L).max) }
        .toSet
      assert(got.toSet == expect, s"seed=$seed")
      assert(got.map(_._1).distinct.length == got.length, s"seed=$seed")
    }
  }

  test("microRatio: staged x1e6 division exact vs BigInt up to 9e15, no ANSI overflow") {
    import org.apache.spark.sql.functions.{col, expr}
    // deterministic LCG sweep over magnitudes that would overflow the
    // naive n*1000000 multiply (anything past ~9.2e12)
    var x = 42L
    def next(bound: Long): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      math.floorMod(x, bound - 1) + 1
    }
    val cases = (Seq.tabulate(60) { i =>
      val mag = Seq(1000L, 1000000L, 9000000000L, 9000000000000L,
        9000000000000000L)(i % 5)
      (next(mag), next(mag))
    } ++ Seq((1L, 9000000000000000L),
      (9000000000000000L, 9000000000000000L), (7L, 3L)))
      // exactness is only claimable where the RESULT fits an int64 —
      // no long-returning engine can represent n·1e6/d past 2^63
      .filter { case (n, d) => BigInt(n) * 1000000 / BigInt(d) <= Long.MaxValue }
    assert(cases.size >= 50)
    val got = cases.toDF("n", "d")
      .select(col("n"), col("d"),
        expr(graft.ops.TokenizerOps.microRatio("n", "d")).as("r"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (n, d, r) =>
      val want = (BigInt(n) * 1000000 / BigInt(d)).toLong
      assert(r == want, s"n=$n d=$d: $r != $want")
    }
    // an UNREPRESENTABLE result must die loudly (ANSI overflow), never
    // wrap silently into a plausible-looking fertility
    val ex = intercept[Exception] {
      Seq((9000000000000000L, 1L)).toDF("n", "d")
        .select(expr(graft.ops.TokenizerOps.microRatio("n", "d")))
        .collect()
    }
    assert(ex.getMessage.contains("ARITHMETIC_OVERFLOW") ||
      Option(ex.getCause).exists(_.getMessage.contains("ARITHMETIC_OVERFLOW")))
  }
}
