package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.stream.DedupStream

/** Cross-batch streaming dedup: duplicates are suppressed across
  * micro-batches AND across restarts (state survives the checkpoint).
  */
class DedupStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("streaming exact dedup: later duplicate content dropped across batches and restarts") {
    val docsDir = tmp("ds-docs")
    val outDir = tmp("ds-out")
    val ckpt = tmp("ds-ckpt")

    Seq((1L, "Hello, World!"), (2L, "unique one")).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q1 = DedupStream.run(spark, docsDir, outDir, ckpt)
    q1.awaitTermination(60000)
    assert(spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      == Set(1L, 2L))

    // batch 2 after restart: doc 3 duplicates doc 1's normalized content
    Seq((3L, "hello   world"), (4L, "another unique")).toDF("doc_id", "text")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q2 = DedupStream.run(spark, docsDir, outDir, ckpt)
    q2.awaitTermination(60000)
    val after = spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    assert(after == Set(1L, 2L, 4L), s"got $after") // 3 deduped against state
  }
}
