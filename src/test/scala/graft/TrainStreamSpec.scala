package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.ops.TextOps
import graft.stream.TrainStream

/** Streaming SGD for the quality classifier: two micro-batches must
  * equal two sequential driver-side steps (the same applyGradient fold),
  * including across a restart; replayed batches fold idempotently.
  */
class TrainStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // mixed labels: some docs pass the gopher gates (need >= 50 words, 2+
  // stopwords, etc.), some fail — a one-sided label set would make the
  // gradient direction trivial
  private def passDoc(i: Long) = (i,
    (1 to 60).map(j => s"word$j").mkString(" ") + " the be to of and that have with",
    s"src${i % 2}")
  private def failDoc(i: Long) = (i, s"short text $i", s"src${i % 2}")

  test("two streamed batches == two sequential driver SGD steps; restart continues") {
    val docsDir = tmp("ts-docs")
    val outDir = tmp("ts-out")
    val ckpt = tmp("ts-ckpt")
    val file1 = (1L to 20L).map(passDoc) ++ (21L to 30L).map(failDoc)
    val file2 = (31L to 45L).map(passDoc) ++ (46L to 60L).map(failDoc)

    // batch 1 before the restart
    file1.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(TrainStream.run(spark, docsDir, outDir, ckpt))

    val w1Stream = spark.read.parquet(s"$outDir/current")
      .as[(Long, Long)].collect().toMap
    val d1 = file1.toDF("doc_id", "text", "source")
    val w1 = TextOps.qualityLinearTrain(d1) // seed + one step over file1
    assert(w1Stream == w1, "batch 1 weights must equal one driver step")
    assert(w1 != TextOps.seedWeightsMicro, "the step must move weights")

    // restart with batch 2: gradients must be taken AT w1, not the seed
    file2.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(TrainStream.run(spark, docsDir, outDir, ckpt))

    val w2Stream = spark.read.parquet(s"$outDir/current")
      .as[(Long, Long)].collect().toMap
    val d2 = file2.toDF("doc_id", "text", "source")
    val g2 = TextOps.qualityLinearTrainStepWith(d2, Some(w1)).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("grad_micro")).toSeq
    val w2 = TextOps.applyGradient(w1, g2, d2.count())
    assert(w2Stream == w2,
      "batch 2 weights must equal the sequential composition at w1")
    assert(w2 != w1, "the second step must move weights again")
  }

  test("replayed batch recomputes identically (state versioning, not double-stepping)") {
    val docsDir = tmp("ts2-docs")
    val outDir = tmp("ts2-out")
    val file1 = (1L to 15L).map(passDoc) ++ (16L to 25L).map(failDoc)
    file1.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    awaitDone(TrainStream.run(spark, docsDir, outDir, tmp("ts2-ckpt")))
    val once = spark.read.parquet(s"$outDir/current")
      .as[(Long, Long)].collect().toMap
    // fresh checkpoint, same files, same state dir — replay of batch 0
    awaitDone(TrainStream.run(spark, docsDir, outDir, tmp("ts2-ckpt-replay")))
    val twice = spark.read.parquet(s"$outDir/current")
      .as[(Long, Long)].collect().toMap
    assert(twice == once, "a replayed batch must not take a second step")
  }
}
