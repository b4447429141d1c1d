package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Physical-plan regression guards: the performance claims in SCALE.md /
  * PLANS.md as assertions, so a refactor that silently adds a shuffle to
  * a narrow operator (or degrades a broadcast join to a cartesian
  * product) fails the build, not the benchmark.
  */
class PlanSpec extends SparkSuite {

  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    def all(p: SparkPlan): Seq[SparkPlan] =
      (p +: p.children.flatMap(all)) ++ (p match {
        case a: AdaptiveSparkPlanExec => all(a.executedPlan)
        case _ => Seq.empty
      })
    all(df.queryExecution.executedPlan)
  }

  private def exchanges(df: DataFrame): Int =
    nodes(df).count(_.isInstanceOf[ShuffleExchangeExec])
  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf)

  test("narrow projection ops: zero shuffles") {
    for (name <- Seq("message_typing", "routing_map", "routing_partition",
        "key_extract", "op_annotate", "json_serialize", "ndjson_encode",
        "id_escape", "type_version_gate", "token_count", "lang_id",
        "quality_score", "multimodal_resize", "multimodal_features")) {
      assert(exchanges(q(name)) == 0, s"$name grew a shuffle")
    }
  }

  test("single-key agg/window ops: exactly one shuffle") {
    for (name <- Seq("dedup_exact", "dedup_lww", "script_update",
        "snapshot_scan", "chunk_split", "batch_accumulate",
        "doc_fingerprint")) {
      assert(exchanges(q(name)) == 1, s"$name should shuffle exactly once")
    }
    // fanout insurance repartition + the (centroid, dim) agg
    assert(exchanges(q("ivf_train_step")) == 2)
  }

  test("ANN ops broadcast the query side, never cartesian") {
    for (name <- Seq("ann_topk_bruteforce", "ann_lsh_bucket", "ann_ivf_probe")) {
      val ns = nodes(q(name))
      assert(ns.exists(_.isInstanceOf[BroadcastExchangeExec]), s"$name lost its broadcast")
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]), s"$name degraded to cartesian")
    }
  }

  test("pairwise dedup ops never plan a cartesian product") {
    for (name <- Seq("dedup_minhash_lsh", "dedup_simhash",
        "dedup_ngram_jaccard", "dedup_embedding_cosine", "corpus_clean")) {
      assert(!nodes(q(name)).exists(_.isInstanceOf[CartesianProductExec]),
        s"$name planned a cartesian product")
    }
  }
}
