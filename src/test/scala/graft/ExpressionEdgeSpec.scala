package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ArrayFunctions._

/** Edge-case contracts of the custom expressions (null propagation,
  * empty inputs, unequal lengths) — pinned so refactors keep them.
  */
class ExpressionEdgeSpec extends SparkSuite {
  import spark.implicits._

  test("sorted_intersect_size: empty and disjoint inputs, null propagation") {
    val df = Seq(
      (1L, Seq(1L, 2L), Seq(2L, 3L)),
      (2L, Seq.empty[Long], Seq(1L)),
      (3L, Seq(1L), Seq(9L))
    ).toDF("id", "a", "b")
    val got = df.select($"id", sorted_intersect_size($"a", $"b")).as[(Long, Int)]
      .collect().toMap
    assert(got == Map(1L -> 1, 2L -> 0, 3L -> 0))
    val withNull = df.select(sorted_intersect_size(lit(null).cast("array<long>"), $"b"))
    assert(withNull.collect().forall(_.isNullAt(0)))
  }

  test("nfc_normalize: composes combining marks, identity on NFC, null-safe") {
    // e + COMBINING ACUTE (2 codepoints) must become precomposed U+00E9;
    // Hangul jamo compose to the syllable; NFC text passes unchanged.
    // All non-ASCII spelled as escapes so no editor can re-normalize them.
    val df = Seq(
      (1L, "cafe\u0301"),
      (2L, "caf\u00e9"),
      (3L, "\u1100\u1161"),
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("id", "t")
    val got = df.select($"id", nfc_normalize($"t")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(got(1L) == "caf\u00e9" && got(1L).asInstanceOf[String].length == 4)
    assert(got(2L) == "caf\u00e9")
    assert(got(3L) == "\uac00")
    assert(got(4L) == "")
    assert(got(5L) == null)
    // the per-doc operator flags exactly the denormalized rows
    val op = graft.ops.TextOps.textNormalize(
      df.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) null else r.getBoolean(2)))
      .toMap
    assert(op == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      5L -> null))
  }

  test("dot_product: dimension mismatch fails LOUD; empty·empty → 0.0") {
    // silently truncating to the common prefix would emit
    // plausible-looking cosine scores for corrupted embeddings
    val ex = intercept[Exception] {
      Seq((Seq(1.0, 2.0, 99.0), Seq(3.0, 4.0)))
        .toDF("a", "b").select(dot_product($"a", $"b")).as[Double].head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("dimension mismatch")), s"got: $ex")
    val empty = Seq((Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b").select(dot_product($"a", $"b")).as[Double].head()
    assert(empty == 0.0)
  }

  test("md5_prefix_hashes: empty array → empty array; stable values") {
    val got = Seq((Seq.empty[String], Seq("a", "a")))
      .toDF("e", "x")
      .select(md5_prefix_hashes($"e"), md5_prefix_hashes($"x"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(got._1.isEmpty)
    assert(got._2(0) == got._2(1)) // same input, same hash
  }

  test("rolling_fingerprint: empty → 0 (the greatest(n-w+1,1) twin idiom); single element → element mod P") {
    // the SQL twins fold ONE window from seed 0 on empty input — a null
    // here would diverge from every oracle built on that idiom
    val got = Seq((Seq.empty[Long], Seq(42L)))
      .toDF("e", "x")
      .select(
        rolling_fingerprint($"e", 8, 131L, 1000000007L),
        rolling_fingerprint($"x", 8, 131L, 1000000007L))
      .collect()(0)
    assert(got.getLong(0) == 0L)
    assert(got.getLong(1) == 42L)
    // and the array form: empty → [0], same idiom
    val win = Seq(Seq.empty[Long]).toDF("e")
      .select(rolling_window_hashes($"e", 8, 131L, 1000000007L))
      .as[Seq[Long]].head()
    assert(win == Seq(0L))
  }

  test("sorted_distinct ≡ array_sort(array_distinct(_)) as a set, sorted; null propagates") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(Seq.fill(rnd.nextInt(20))(rnd.nextInt(10).toLong)) :+
      Seq.empty[Long]
    val df = rows.toDF("xs")
    val got = df.select(sorted_distinct(col("xs"))).as[Seq[Long]].collect()
    val want = df.select(array_sort(array_distinct(col("xs")))).as[Seq[Long]].collect()
    assert(got.toSeq == want.toSeq)
    val n = Seq(Option.empty[Seq[Long]]).toDF("xs")
      .select(sorted_distinct(col("xs"))).collect()
    assert(n.head.isNullAt(0))
    // null ELEMENTS: deduped and sorted last like array_sort(array_distinct),
    // never silently coerced to 0 (the SQL registry exposes this to users)
    val withNulls = Seq(Seq(Option(5L), Option.empty[Long], Option(2L),
        Option.empty[Long], Option(5L))).toDF("xs")
    val gotN = withNulls.select(sorted_distinct(col("xs"))).collect()
      .head.getSeq[Any](0)
    val wantN = withNulls.select(array_sort(array_distinct(col("xs")))).collect()
      .head.getSeq[Any](0)
    assert(gotN == Seq(2L, 5L, null))
    assert(gotN == wantN)
  }

  test("word_shingle_hashes: short input yields one whole-input shingle") {
    val got = Seq((Seq("a", "b"), Seq("a", "b", "c", "d")))
      .toDF("short", "long")
      .select(word_shingle_hashes($"short", 3), word_shingle_hashes($"long", 3))
      .as[(Seq[Long], Seq[Long])].head()
    assert(got._1.length == 1)
    assert(got._2.length == 2) // "a b c", "b c d"
    // shingle of ["a","b"] == hash of "a b"
    val abHash = Seq("a b").toDF("t")
      .select(graft.ops.TextOps.tokenHash($"t")).as[Long].head()
    assert(got._1.head == abHash)
  }
}
