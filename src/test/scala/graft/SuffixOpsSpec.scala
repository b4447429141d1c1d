package graft

import org.apache.spark.sql.functions._
import graft.ops.SuffixOps
import org.apache.spark.sql.graftext.ArrayFunctions.common_prefix_len

/** Distributed suffix array (prefix doubling) vs naive suffix sort, the
  * identical-document tie rule, and the capped-LCP longest-repeat
  * consumer.
  */
class SuffixOpsSpec extends SparkSuite {
  import spark.implicits._

  /** Naive reference: sort all (suffix, doc_id, pos) lexicographically. */
  private def naiveSa(corpus: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    corpus.flatMap { case (id, t) =>
      (0 until t.length).map(p => (t.substring(p), id, p.toLong))
    }.sortBy(identity).zipWithIndex
      .map { case ((_, d, p), i) => (i.toLong, d, p) }

  test("suffixArray ≡ naive suffix sort (banana + friends)") {
    val corpus = Seq[(Long, String)](
      1L -> "banana",
      2L -> "abracadabra",
      3L -> "aa",
      4L -> "")                      // empty doc: zero suffixes
    val got = SuffixOps.suffixArray(corpus.toDF("doc_id", "text"))
      .orderBy("sa_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == naiveSa(corpus))
    // and the banana classic holds inside the merged order
    val bananaOrder = got.filter(_._2 == 1L).map(_._3)
    assert(bananaOrder.indexOf(5L) < bananaOrder.indexOf(3L) &&
      bananaOrder.indexOf(3L) < bananaOrder.indexOf(1L) &&
      bananaOrder.indexOf(1L) < bananaOrder.indexOf(0L) &&
      bananaOrder.indexOf(0L) < bananaOrder.indexOf(4L) &&
      bananaOrder.indexOf(4L) < bananaOrder.indexOf(2L))
  }

  test("identical documents: content can never separate them — (doc_id, pos) must") {
    val corpus = Seq[(Long, String)](
      7L -> "same text here", 9L -> "same text here")
    val got = SuffixOps.suffixArray(corpus.toDF("doc_id", "text"))
      .orderBy("sa_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == naiveSa(corpus))
    // every adjacent identical-suffix pair orders doc 7 before doc 9
    val byRank = got.map { case (_, d, p) => (d, p) }
    (0 until byRank.length - 1).foreach { i =>
      val (d1, p1) = byRank(i); val (d2, p2) = byRank(i + 1)
      if (p1 == p2) assert(d1 < d2, s"tie at pos $p1 ordered $d1 after $d2")
    }
  }

  test("saLongestRepeat finds a planted cross-doc repeat; caps at SaLcpCap") {
    val repeat = "the quick brown fox jumps over the lazy dog"
    val corpus = Seq[(Long, String)](
      1L -> s"prefix one $repeat suffix alpha",
      2L -> s"other beginning $repeat different end",
      3L -> "completely unrelated content with nothing shared")
    val row = SuffixOps.saLongestRepeat(corpus.toDF("doc_id", "text")).head()
    // the planted repeat plus the trailing " " both docs share after it
    assert(row.getAs[Long]("lcp") >= repeat.length.toLong)
    assert(!row.getAs[Boolean]("capped"))
    val ds = Set(row.getAs[Long]("doc_a"), row.getAs[Long]("doc_b"))
    assert(ds == Set(1L, 2L))
    // a repeat longer than the probe width reports the cap, flagged
    val long = "x" * (SuffixOps.SaLcpCap + 20)
    val capped = SuffixOps.saLongestRepeat(
      Seq((1L, s"a $long b"), (2L, s"c $long d")).toDF("doc_id", "text"))
      .head()
    assert(capped.getAs[Long]("lcp") == SuffixOps.SaLcpCap.toLong)
    assert(capped.getAs[Boolean]("capped"))
  }

  test("saRepeatCoverage: planted repeat covered on both sides, clean docs at 0") {
    val repeat = "shared repeated segment of text"   // 31 chars ≥ SaRepeatMin
    val corpus = Seq[(Long, String)](
      1L -> s"aaa $repeat bbb",
      2L -> s"ccc $repeat ddd",
      3L -> "entirely unique content qqq")
    val df = corpus.toDF("doc_id", "text")
    val got = SuffixOps.saRepeatCoverage(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 3)
    // both occurrences covered for ≥ the planted length; the unique doc 0
    assert(got(1L)._2 >= repeat.length.toLong, s"doc1: $got")
    assert(got(2L)._2 >= repeat.length.toLong, s"doc2: $got")
    assert(got(3L)._2 == 0L)
    // coverage never exceeds the doc
    got.foreach { case (_, (n, c)) => assert(c <= n) }
  }

  test("degenerate corpora: empty corpus, all-empty docs, single doc") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixOps.suffixArray(empty).count() == 0)
    assert(SuffixOps.suffixArray(empty).columns.toSeq ==
      Seq("sa_rank", "doc_id", "pos"))
    val blank = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(SuffixOps.suffixArray(blank).count() == 0)
    // a single doc still builds a full array; with no ≥min repeat the
    // coverage table is all-zero but PRESENT for the doc
    val one = Seq((5L, "abcdefg")).toDF("doc_id", "text")
    assert(SuffixOps.suffixArray(one).count() == 7)
    val cov = SuffixOps.saRepeatCoverage(one).collect()
    assert(cov.length == 1 && cov(0).getLong(2) == 0L)
  }

  test("mergeShardArrays: merged per-shard arrays ≡ direct suffixArray of the union, row-exact") {
    // shard by doc_id % 2; identical docs ACROSS shards force the
    // byte-identical (doc_id, pos) tiebreak, and a repeat > 2·SaLcpCap
    // spanning shards forces > 2 probe-deepening rounds
    val long = "z" * (SuffixOps.SaLcpCap * 2 + 10)
    val corpus = Seq[(Long, String)](
      1L -> s"alpha $long omega",
      2L -> s"beta $long gamma",
      3L -> "same text here",
      4L -> "same text here",
      5L -> "banana",
      6L -> "abracadabra",
      7L -> "")
    val df = corpus.toDF("doc_id", "text")
    val s0 = df.filter(col("doc_id") % 2 === 0)
    val s1 = df.filter(col("doc_id") % 2 === 1)
    val merged = SuffixOps.mergeShardArrays(
        Seq(SuffixOps.suffixArray(s0), SuffixOps.suffixArray(s1)), df)
      .orderBy("sa_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged == naiveSa(corpus))
  }

  test("mergeShardArrays degenerate: one shard passes through exactly; empty corpus") {
    val corpus = Seq[(Long, String)](1L -> "banana", 2L -> "abracadabra")
    val df = corpus.toDF("doc_id", "text")
    val one = SuffixOps.mergeShardArrays(
        Seq(SuffixOps.suffixArray(df)), df)
      .orderBy("sa_rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(one == naiveSa(corpus))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val mergedEmpty = SuffixOps.mergeShardArrays(
      Seq(SuffixOps.suffixArray(empty)), empty)
    assert(mergedEmpty.count() == 0)
    assert(mergedEmpty.columns.toSeq == Seq("sa_rank", "doc_id", "pos"))
  }

  test("cross-shard repeat: invisible to every per-shard trim, found by the merged one") {
    val repeat = "cross shard repeated boilerplate segment"  // 40 ≥ SaRepeatMin
    val corpus = Seq[(Long, String)](
      10L -> s"first document body $repeat trailing words",   // shard 0
      5L -> s"second document opens $repeat and then ends",   // shard 1
      20L -> "totally distinct filler for the zero bucket",   // shard 0
      15L -> "another unrelated sentence about tides")        // shard 1
    val df = corpus.toDF("doc_id", "text")
    val s0 = df.filter(col("doc_id") % 10 === 0)
    val s1 = df.filter(col("doc_id") % 10 === 5)
    val sa0 = SuffixOps.suffixArray(s0)
    val sa1 = SuffixOps.suffixArray(s1)
    // per shard: the repeat's occurrences live in different shards, so
    // NO shard-local trim can see it — every doc survives whole
    Seq((sa0, s0), (sa1, s1)).foreach { case (sa, docs) =>
      val trims = SuffixOps.dedupSubstringSaOn(sa, docs).collect()
      trims.foreach { r =>
        assert(r.getAs[Long]("n_ranges") == 0L,
          s"per-shard trim must miss the cross-shard repeat: $r")
        assert(r.getAs[String]("ranges") == "")
      }
    }
    // merged: BOTH occurrences get a drop range covering ≥ the repeat
    val merged = SuffixOps.mergeShardArrays(Seq(sa0, sa1), df)
    val got = SuffixOps.dedupSubstringSaOn(merged, df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ranges"), r.getAs[Long]("trimmed_chars"),
          r.getAs[Long]("surviving_chars"), r.getAs[String]("ranges")))).toMap
    assert(got.size == 4)
    Seq(10L, 5L).foreach { d =>
      val (nr, trimmed, surviving, ranges) = got(d)
      assert(nr >= 1L, s"doc $d must carry a trim range: $got")
      assert(trimmed >= repeat.length.toLong, s"doc $d trim too small: $got")
      assert(ranges.nonEmpty)
      assert(surviving == corpus.toMap.apply(d).length - trimmed)
    }
    Seq(20L, 15L).foreach { d =>
      assert(got(d)._1 == 0L, s"clean doc $d must survive whole: $got")
    }
  }

  test("char_windows: per-position windows, codepoint-correct, tail-shortened") {
    import org.apache.spark.sql.graftext.ArrayFunctions.char_windows
    val got = Seq("abcd", "", "日本語X")
      .toDF("t").select(char_windows($"t", 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("abc", "bcd", "cd", "d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("日本語", "本語X", "語X", "X"))
  }

  test("common_prefix_len: codepoints, null-safe, empty-safe") {
    val got = Seq(
      ("abcdef", "abcxyz"),   // 3
      ("", "anything"),       // 0
      ("same", "same"),       // 4
      ("日本語abc", "日本語xyz"), // 3 codepoints
      (null.asInstanceOf[String], "x")
    ).toDF("a", "b").select(common_prefix_len($"a", $"b")).collect()
    assert(got(0).getInt(0) == 3)
    assert(got(1).getInt(0) == 0)
    assert(got(2).getInt(0) == 4)
    assert(got(3).getInt(0) == 3)
    assert(got(4).isNullAt(0))
  }
}
