package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.stream.SketchStream

/** The deterministic rank sketch's three contracts: split-invariance
  * (compacting shard sketches ≡ sketching the union — the lossless
  * merge the 1000-executor shape rests on), a measured error bound
  * against the exact percentile operator, and the streaming face's
  * bit-equality with the batch sketch across a restart.
  */
class SketchSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private lazy val fixture =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")

  test("split-invariance: shard-compacted sketch ≡ from-scratch sketch") {
    val a = fixture.filter(col("doc_id") % 3 === 0)
    val b = fixture.filter(col("doc_id") % 3 =!= 0)
    val whole = TextOps.sketchCompact(TextOps.sketchLevels(fixture), None)
    val merged = TextOps.sketchCompact(TextOps.sketchLevels(b),
      Some(TextOps.sketchCompact(TextOps.sketchLevels(a), None)))
    assert(rows(whole) === rows(merged),
      "merge must be lossless: sketch(A∪B) ≡ compact(sketch(A), B)")
    // and the query faces agree bit-for-bit
    assert(rows(TextOps.sketchPercentiles(whole)) ===
      rows(TextOps.sketchPercentiles(merged)))
  }

  test("error bound: estimated percentiles land within rank tolerance of exact") {
    val exact = TextOps.lengthPercentiles(fixture).collect()
      .map(r => r.getString(0) -> r).toMap
    val est = TextOps.lengthPercentilesSketch(fixture).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet === est.keySet)
    // verify in RANK space (value space can jump at ties): the exact
    // rank of the estimated value must be within eps·n of the target
    // rank. eps = 4/sqrt(cap) is ~4 std of the Bernoulli estimator —
    // deterministic fixture, so this is a pinned regression bound, not
    // a flaky probabilistic one.
    val eps = 4.0 / math.sqrt(TextOps.SketchCap)
    val lengths = fixture
      .select(col("source"), size(TextOps.toksOf(fixture)).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1).toLong)
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted }
    for ((src, ns) <- lengths; (q, i) <- TextOps.PercentileQs.zipWithIndex) {
      val n = ns.length.toLong
      val target = math.ceil(q * n / 100.0).toLong
      val v = est(src).getLong(4 + i) // p-cols start after n_docs/t/retained
      val exactRankOfV = ns.count(_ <= v).toLong
      assert(math.abs(exactRankOfV - target) <= math.max(1L, (eps * n).toLong),
        s"$src p$q: est value $v has exact rank $exactRankOfV, target $target")
    }
    // exact n_docs rides the sketch for free
    for ((src, r) <- est)
      assert(r.getLong(1) === lengths(src).length.toLong)
  }

  test("streamed sketch ≡ batch sketch over all ingested docs, across restart") {
    val docsDir = tmp("sk-docs")
    val outDir = tmp("sk-out")
    val ckpt = tmp("sk-ckpt")
    val f1 = fixture.filter(col("doc_id") < 150)
    val f2 = fixture.filter(col("doc_id") >= 150 && col("doc_id") < 300)
    val f3 = fixture.filter(col("doc_id") >= 300)

    f1.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    f2.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(SketchStream.run(spark, docsDir, outDir, ckpt))
    assert(rows(SketchStream.percentiles(spark, outDir)) ===
      rows(TextOps.lengthPercentilesSketch(f1.unionByName(f2))),
      "streamed percentiles must equal the batch sketch bit-for-bit")

    f3.coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(SketchStream.run(spark, docsDir, outDir, ckpt))
    assert(rows(SketchStream.percentiles(spark, outDir)) ===
      rows(TextOps.lengthPercentilesSketch(fixture)),
      "post-restart sketch must cover everything ever ingested")
  }

  test("CCNet bucket cuts via the sketch: high agreement with the exact cuts") {
    import graft.ops.PretrainOps
    val exact = PretrainOps.qualityPerplexityBuckets(fixture).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val est = PretrainOps.qualityPerplexityBucketsSketch(fixture).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(exact.keySet === est.keySet,
      "both bucket ops must cover the same scored docs")
    // sub-cap sources retain EVERYTHING (t = 0, weights 1) so the
    // estimated cuts are the exact order statistics — bit-equal
    // buckets. On the sf0.001 fixture every source is sub-cap, making
    // this the exactness-degenerates-gracefully pin; the rank-error
    // bound for super-cap sources is covered by the length test above.
    val agree = exact.count { case (id, b) => est(id) == b }
    assert(agree === exact.size,
      s"sub-cap sources must bucket identically: $agree/${exact.size}")
  }

  test("degenerate inputs: empty corpus, single doc, sub-cap source") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextOps.lengthPercentilesSketch(empty).count() === 0L)
    val one = Seq((7L, "just one doc here", "s")).toDF("doc_id", "text", "source")
    val r = TextOps.lengthPercentilesSketch(one).collect()
    // sub-cap: t = 0, every doc retained, estimates are EXACT
    assert(r.length === 1 && r.head.getLong(2) === 0L &&
      r.head.getLong(3) === 1L)
    assert(TextOps.PercentileQs.indices.forall(i => r.head.getLong(4 + i) === 4L))
  }
}
