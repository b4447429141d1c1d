package graft

import org.apache.spark.sql.functions._
import graft.ops.PretrainOps

/** Round-14 kernel ≡ HOF equivalence for the covariance family's in-row
  * upper-triangle pair expansion: `cov_pairs_micro` replaces the nested
  * transform/slice HOF pair (CodegenFallback — interpreted per element).
  * Pins bit-identity of the struct stream on varied dimensions and edge
  * values, and end-to-end agreement of `embedCovariance` with a planted
  * frame computed both ways.
  */
class CovKernelSpec extends SparkSuite {
  import spark.implicits._

  private def hofForm(embD: org.apache.spark.sql.Column) =
    flatten(transform(embD, (x, i) =>
      transform(slice(embD, i + 1, size(embD) - i), (y, j) =>
        struct(i.cast("long").as("di"), (i + j).cast("long").as("dj"),
          floor(x * y * lit(PretrainOps.QualityMicro) + lit(0.5)).cast("long")
            .as("xy_micro")))))

  test("cov_pairs_micro ≡ nested transform/slice HOF form") {
    val vecs = Seq(
      Seq(1.0),                                  // D = 1
      Seq(0.0, 0.0),                             // zeros
      Seq(1.5, -2.25, 3.125),                    // small D, signs
      Seq(-0.4999999, 0.4999999, 1e-9, -1e-9),   // rounding edges
      (1 to 64).map(i => math.sin(i.toDouble)),  // production D
      (1 to 17).map(i => (i * 0.37) - 3.0)       // odd D
    )
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb_d")
    val rows = df.select(col("id"),
        hofForm(col("emb_d")).as("hof"),
        org.apache.spark.sql.graftext.ArrayFunctions.cov_pairs_micro(
          col("emb_d"), PretrainOps.QualityMicro).as("kernel"))
      .selectExpr("id",
        "transform(hof, p -> concat(p.di, ':', p.dj, ':', p.xy_micro)) AS h",
        "transform(kernel, p -> concat(p.di, ':', p.dj, ':', p.xy_micro)) AS k")
      .collect()
    for (r <- rows)
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"id ${r.getLong(0)}: HOF ${r.getSeq[String](1)} != kernel ${r.getSeq[String](2)}")
  }

  test("embedCovariance end-to-end unchanged on a planted frame") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(-1.0f, 0.5f, 2.5f)),
      (3L, Seq(0.0f, 0.0f, 0.0f)),
      (4L, Seq(4.0f, -4.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = PretrainOps.embedCovariance(emb)
      .orderBy("dim_i", "dim_j").collect()
    // expected via the HOF form inline (the pre-kernel shape)
    val base = emb.select(transform(col("embedding"), x => x.cast("double")).as("emb_d"))
    val pairs = base.select(explode(hofForm(col("emb_d"))).as("p"))
      .select(col("p.di").as("dim_i"), col("p.dj").as("dim_j"), col("p.xy_micro"))
      .groupBy("dim_i", "dim_j")
      .agg(count(col("xy_micro")).as("n"), sum(col("xy_micro")).as("s"))
      .orderBy("dim_i", "dim_j").collect()
    assert(got.length == pairs.length)
    for ((g, p) <- got.zip(pairs)) {
      assert(g.getLong(0) == p.getLong(0) && g.getLong(1) == p.getLong(1))
      assert(g.getLong(2) == p.getLong(2), s"n mismatch at $g vs $p")
      assert(g.getLong(3) == p.getLong(3), s"sum_xy mismatch at $g vs $p")
    }
  }
}
