package org.apache.spark.sql.graftext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the graft sketch expressions, so `spark.sql` users
  * get the same primitives as the Column DSL:
  *
  *   - session builder: `.withExtensions(new GraftExtensions)`
  *   - or post-hoc on a live session: `GraftExtensions.register(spark)`
  *
  * Int/long parameters arrive as SQL literals and are extracted at
  * resolution time (non-literal ⇒ analysis error, like Spark's own
  * parameterized expressions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}

object GraftExtensions {

  /** Arity check at resolution time: without it a missing argument dies
    * as a raw IndexOutOfBoundsException and an EXTRA argument is silently
    * discarded — a user passing a threshold they assume exists gets
    * silently wrong results.
    */
  private def arity(args: Seq[Expression], n: Int, fn: String,
      sig: String): Seq[Expression] = {
    if (args.length != n)
      throw new IllegalArgumentException(
        s"$fn expects $n arguments ($fn($sig)), got ${args.length}")
    args
  }

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
    case Literal(v: Long, _) => throw new IllegalArgumentException(
      s"$fn: literal $v does not fit in an int")
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  private def longArg(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal long argument, got $other")
  }

  private[graftext] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    // NOTE: sorted_intersect_size requires both inputs SORTED + distinct
    // (build with sorted_distinct) — the merge scan silently undercounts
    // on unsorted input
    "sorted_intersect_size" -> (args => {
      val a = arity(args, 2, "sorted_intersect_size", "sortedArr, sortedArr")
      SortedIntersectSize(a(0), a(1))
    }),
    "dot_product" -> (args => {
      val a = arity(args, 2, "dot_product", "arr, arr")
      DotProduct(a(0), a(1))
    }),
    "md5_prefix_hashes" -> (args =>
      Md5PrefixHashes(arity(args, 1, "md5_prefix_hashes", "strArr")(0))),
    "simhash_bits" -> (args => {
      val a = arity(args, 2, "simhash_bits", "longArr, nbits")
      SimHashBits(a(0), intArg(a(1), "simhash_bits"))
    }),
    "word_shingle_hashes" -> (args => {
      val a = arity(args, 2, "word_shingle_hashes", "strArr, width")
      WordShingleHashes(a(0), intArg(a(1), "word_shingle_hashes"))
    }),
    "char_gram_hashes" -> (args => {
      val a = arity(args, 2, "char_gram_hashes", "text, width")
      CharGramHashes(a(0), intArg(a(1), "char_gram_hashes"))
    }),
    "nfc_normalize" -> (args =>
      NfcNormalize(arity(args, 1, "nfc_normalize", "text").head)),
    "common_prefix_len" -> (args => {
      val a = arity(args, 2, "common_prefix_len", "a, b")
      CommonPrefixLen(a(0), a(1))
    }),
    "char_windows" -> (args => {
      val a = arity(args, 2, "char_windows", "text, width")
      CharWindows(a(0), intArg(a(1), "char_windows"))
    }),
    "rolling_fingerprint" -> (args => {
      val a = arity(args, 4, "rolling_fingerprint", "longArr, width, mult, mod")
      RollingFingerprint(a(0),
        intArg(a(1), "rolling_fingerprint"),
        longArg(a(2), "rolling_fingerprint"),
        longArg(a(3), "rolling_fingerprint"))
    }),
    "rolling_window_hashes" -> (args => {
      val a = arity(args, 4, "rolling_window_hashes", "longArr, width, mult, mod")
      RollingWindowHashes(a(0),
        intArg(a(1), "rolling_window_hashes"),
        longArg(a(2), "rolling_window_hashes"),
        longArg(a(3), "rolling_window_hashes"))
    }),
    "sorted_distinct" -> (args =>
      SortedDistinct(arity(args, 1, "sorted_distinct", "longArr")(0))),
    "sliding_min" -> (args => {
      val a = arity(args, 2, "sliding_min", "longArr, width")
      SlidingMin(a(0), intArg(a(1), "sliding_min"))
    }),
    // the default (oracle-shared) codebook: an arbitrary codebook is a
    // kilobyte of doubles — not a SQL-literal shape; spark.sql users who
    // train their own go through the Column DSL
    "pq_dist_tables" -> (args =>
      PqDistTables(arity(args, 1, "pq_dist_tables", "doubleArr")(0),
        graft.ops.SimilarityOps.PqSubspaces,
        graft.ops.SimilarityOps.PqCodes,
        graft.ops.SimilarityOps.PqSubDim,
        graft.ops.SimilarityOps.defaultPqCodebook))
  )

  /** Post-hoc registration on a live session (guide-style temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
