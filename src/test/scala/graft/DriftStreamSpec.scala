package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.ops.PretrainOps
import graft.stream.DriftStream

/** The drift monitor's two faces are one monitor: the frozen-reference
  * apply reproduces the batch split op exactly, and the streaming face
  * checks each arriving batch statelessly.
  */
class DriftStreamSpec extends SparkSuite {

  private def tmp(p: String) = Files.createTempDirectory(p).toString
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("embedDriftWith(even-half ref) on the odd half ≡ embedDrift's deltas") {
    val ref = PretrainOps.embedDriftRef(emb.filter(col("vec_id") % 2 === 0))
    assert(ref.size == 64)
    val got = PretrainOps.embedDriftWith(
        emb.filter(col("vec_id") % 2 === 1), ref)
      .select("dim_idx", "mean_ref_micro", "mean_new_micro", "delta_micro",
        "drifted")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val exp = PretrainOps.embedDrift(emb)
      .select("dim_idx", "mean_ref_micro", "mean_new_micro", "delta_micro",
        "drifted")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got == exp, "the two faces diverged")
  }

  test("width changes flag in BOTH directions: widened batch dim and narrowed ref dim") {
    // widening: batch has dim 5, reference doesn't
    val ref = PretrainOps.embedDriftRef(emb) - 5L
    val out = PretrainOps.embedDriftWith(emb, ref)
    val dim5 = out.filter(col("dim_idx") === 5).head()
    assert(dim5.isNullAt(out.columns.indexOf("mean_ref_micro")))
    assert(dim5.getAs[Boolean]("drifted"))
    // narrowing: reference has dim 99, no batch row does — the row must
    // still APPEAR, drifted, with n_new = 0 (a silently-vanished dim is
    // the monitor's own blind spot)
    val wide = PretrainOps.embedDriftRef(emb) + (99L -> 123L)
    val out2 = PretrainOps.embedDriftWith(emb, wide)
    val dim99 = out2.filter(col("dim_idx") === 99).head()
    assert(dim99.getAs[Long]("n_new") == 0L)
    assert(dim99.isNullAt(out2.columns.indexOf("mean_new_micro")))
    assert(dim99.getAs[Boolean]("drifted"))
    assert(out2.count() == 65)
  }

  test("streamed per-batch monitors ≡ batch apply per file, across a restart") {
    val embDir = tmp("dr-emb")
    val outDir = tmp("dr-out")
    val ckpt = tmp("dr-ckpt")
    val ref = PretrainOps.embedDriftRef(emb)

    // file 1: unshifted; file 2: dim 3 shifted by +0.5 → must flag
    val f1 = emb.filter(col("vec_id") < 100)
    val f2 = emb.filter(col("vec_id") >= 100 && col("vec_id") < 200)
      .select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 3, x + lit(0.5f)).otherwise(x)).as("embedding"),
        col("label"))
    f1.coalesce(1).write.mode(SaveMode.Append).parquet(embDir)
    awaitDone(DriftStream.run(spark, embDir, outDir, ckpt, ref))
    // restart with the drifted file — only it is processed
    f2.coalesce(1).write.mode(SaveMode.Append).parquet(embDir)
    awaitDone(DriftStream.run(spark, embDir, outDir, ckpt, ref))

    val all = spark.read.parquet(s"$outDir/b_*")
    assert(all.select("batch_id").distinct().count() == 2)
    // batch parity: each batch's rows equal the direct apply on its file
    val perBatch = all.groupBy("batch_id")
      .agg(count(when(col("drifted"), 1)).as("n_drift")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clean = perBatch.minBy(_._1)._2
    val shifted = perBatch.maxBy(_._1)._2
    assert(clean == 0L, s"unshifted batch flagged $clean dims")
    assert(shifted == 1L, s"shifted batch flagged $shifted dims (want dim 3 only)")
    // the published pointer resolves to the newest fully-written version
    val cur = DriftStream.current(spark, outDir)
    assert(cur.select("batch_id").distinct().head().getLong(0) ==
      perBatch.keys.max)
    assert(cur.filter(col("drifted")).select("dim_idx")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
