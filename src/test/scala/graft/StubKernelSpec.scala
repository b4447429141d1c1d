package graft

import org.apache.spark.sql.functions._
import graft.ops.{AudioOps, BinaryOps, VideoOps}

/** Round-14 kernel ≡ expression equivalence for the multimodal stub
  * hashers: the image dHash stub, the per-frame video dHash stub and the
  * audio fingerprint stub were re-expressed as one-pass codegen kernels
  * ([[org.apache.spark.sql.graftext.HashKernels.dhashStub]] /
  * `audioFpStub`) replacing 85–128-substr expression trees. The pre-kernel
  * expression forms stay in the ops as `*Expr` spec references; these
  * tests pin bit-identity on adversarial inputs (empty, single char,
  * shorter than the sample span, multi-byte UTF-8 — where Spark `ascii`
  * returns the CODE POINT, which the kernel must reproduce).
  */
class StubKernelSpec extends SparkSuite {
  import spark.implicits._

  private val texts = Seq(
    "",                                   // empty → hash 0
    "a",                                  // single char, all samples equal
    "ab",                                 // tiny wrap-around
    "abcdefgh",                           // shorter than the 73-sample span
    "The quick brown fox jumps over the lazy dog 0123456789",
    ("x" * 37) + ("q" * 41) + ("m" * 29), // runs with internal structure
    "héllo wörld ünïcode β∂ƒ©",           // multi-byte: code-point ascii
    "日本語テキストのサンプル",            // all multi-byte
    // 4-byte UTF-8 (supplementary plane: emoji as surrogate pairs) — pins
    // HashKernels.codePointAt's 4-byte branch against Spark's ascii
    "😀 test 🌀 mixed 🚀🚀 tail",
    "💩💩💩", // all supplementary
    (1 to 300).map(i => ('a' + i % 26).toChar).mkString  // longer than span
  )

  private def docsOf(ts: Seq[String]) =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("image dhash stub kernel ≡ 128-substr expression form") {
    val df = docsOf(texts :+ null.asInstanceOf[String])
    val rows = df.select(col("doc_id"),
        BinaryOps.dhashStubColExpr(col("text")).as("expr_form"),
        org.apache.spark.sql.graftext.ArrayFunctions.dhash_stub(
          coalesce(col("text"), lit("")), lit(0L),
          BinaryOps.DhashRows, BinaryOps.DhashCols).as("kernel"))
      .collect()
    for (r <- rows)
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: expr ${r.getLong(1)} != kernel ${r.getLong(2)}")
  }

  test("video frame dhash stub kernel ≡ expression form across frame offsets") {
    val df = docsOf(texts)
      .withColumn("n", length(coalesce(col("text"), lit(""))))
      .withColumn("n_safe", greatest(col("n"), lit(1)))
      .withColumn("frame_idx", explode(sequence(lit(0L), lit(7L))))
    val t = coalesce(col("text"), lit(""))
    val rows = df.select(col("doc_id"), col("frame_idx"),
        VideoOps.frameDhashStubExpr(t, col("n"), col("n_safe"),
          col("frame_idx")).as("expr_form"),
        org.apache.spark.sql.graftext.ArrayFunctions.dhash_stub(
          t, (col("frame_idx") * 11).cast("long"),
          BinaryOps.DhashRows, BinaryOps.DhashCols).as("kernel"))
      .collect()
    for (r <- rows)
      assert(r.getLong(2) == r.getLong(3),
        s"doc ${r.getLong(0)} frame ${r.getLong(1)}: " +
          s"expr ${r.getLong(2)} != kernel ${r.getLong(3)}")
  }

  test("audio fingerprint stub kernel ≡ energies expression form") {
    val df = docsOf(texts :+ null.asInstanceOf[String])
    val viaExpr = AudioOps.audioFpStubExpr(df)
      .withColumnRenamed("afp", "expr_form")
    val viaKernel = AudioOps.audioFpStub(df)
      .withColumnRenamed("afp", "kernel")
    val rows = viaExpr.join(viaKernel, "doc_id").collect()
    assert(rows.length == texts.length + 1)
    for (r <- rows)
      assert(r.getAs[Long]("expr_form") == r.getAs[Long]("kernel"),
        s"doc ${r.getAs[Long]("doc_id")}: expr ${r.getAs[Long]("expr_form")} " +
          s"!= kernel ${r.getAs[Long]("kernel")}")
  }
}
