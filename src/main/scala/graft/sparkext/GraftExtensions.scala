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

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
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
    "sorted_intersect_size" -> (args => SortedIntersectSize(args(0), args(1))),
    "dot_product" -> (args => DotProduct(args(0), args(1))),
    "md5_prefix_hashes" -> (args => Md5PrefixHashes(args(0))),
    "simhash_bits" -> (args =>
      SimHashBits(args(0), intArg(args(1), "simhash_bits"))),
    "word_shingle_hashes" -> (args =>
      WordShingleHashes(args(0), intArg(args(1), "word_shingle_hashes"))),
    "char_gram_hashes" -> (args =>
      CharGramHashes(args(0), intArg(args(1), "char_gram_hashes"))),
    "rolling_fingerprint" -> (args => RollingFingerprint(args(0),
      intArg(args(1), "rolling_fingerprint"),
      longArg(args(2), "rolling_fingerprint"),
      longArg(args(3), "rolling_fingerprint"))),
    "rolling_window_hashes" -> (args => RollingWindowHashes(args(0),
      intArg(args(1), "rolling_window_hashes"),
      longArg(args(2), "rolling_window_hashes"),
      longArg(args(3), "rolling_window_hashes"))),
    "sorted_distinct" -> (args => SortedDistinct(args(0)))
  )

  /** Post-hoc registration on a live session (guide-style temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
