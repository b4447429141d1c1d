package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.ops.PretrainOps
import graft.stream.ManifestStream

/** Streaming integrity manifest: the incrementally-folded per-shard
  * (n_docs, n_tokens, bit_xor checksum) table must equal the batch
  * [[PretrainOps.shardChecksums]] over everything ingested — including
  * across a mid-stream restart, where the versioned state table (not the
  * stream's memory) carries the running fold.
  */
class ManifestStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def doc(i: Long) = (i, s"token$i word${i % 7} tail${i % 3}", s"src${i % 4}")

  test("streamed manifest equals batch shardChecksums across a mid-stream restart") {
    val docsDir = tmp("mf-docs")
    val outDir = tmp("mf-out")
    val ckpt = tmp("mf-ckpt")

    val file1 = (1L to 60L).map(doc)
    val file2 = (61L to 90L).map(doc)
    val file3 = (91L to 130L).map(doc)

    // two files before the restart (two micro-batches at maxFilesPerTrigger=1)
    file1.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    file2.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q1 = ManifestStream.run(spark, docsDir, outDir, ckpt)
    awaitDone(q1)

    // mid-stream consistency: `current` already equals the batch operator
    // over the ingested prefix
    val mid = spark.read.parquet(s"$outDir/current")
      .as[(Long, Long, Long, Long)].collect().toSet
    val midExpect = PretrainOps.shardChecksums(
        (file1 ++ file2).toDF("doc_id", "text", "source"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(mid == midExpect, "prefix manifest must match the batch operator")

    // restart with a new file: the fold resumes from the versioned state
    file3.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q2 = ManifestStream.run(spark, docsDir, outDir, ckpt)
    awaitDone(q2)

    val fin = spark.read.parquet(s"$outDir/current")
      .as[(Long, Long, Long, Long)].collect().toSet
    val finExpect = PretrainOps.shardChecksums(
        (file1 ++ file2 ++ file3).toDF("doc_id", "text", "source"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fin == finExpect,
      "post-restart manifest must equal the batch operator over ALL docs")
    // substitution sensitivity sanity: a different corpus flips checksums
    assert(fin != mid)
  }

  test("clean-pipeline binding: streamed manifest over CleanStream survivors equals batch shard_checksums of corpus_clean's survivors, across a restart") {
    import org.apache.spark.sql.functions.col
    // corpus_clean (the full batch composition: gates → exact dedup →
    // LSH near-dup removal) defines the survivor set; CleanStream is a
    // fixed point on already-clean docs (they pass the gates and carry
    // no exact dups by construction), so streaming those survivors
    // through CleanStream → ManifestStream binds the batch face and both
    // streaming faces to ONE per-shard checksum table.
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val survivors = docs
      .join(graft.ops.CorpusOps.cleanCorpus(docs).select("doc_id"), "doc_id")
      .select(col("doc_id"), col("text"))
      .orderBy("doc_id").cache()
    val ids = survivors.select("doc_id").as[Long].collect().toSeq
    assert(ids.size > 10, "fixture must yield a real survivor set")
    val (half1, half2) = ids.splitAt(ids.size / 2)

    val streamDir = tmp("bind-docs")
    val cleanOut = tmp("bind-clean")
    val cleanCkpt = tmp("bind-clean-ckpt")
    val mfOut = tmp("bind-mf")
    val mfCkpt = tmp("bind-mf-ckpt")

    def arrive(part: Seq[Long], order: Int): Unit = {
      survivors.filter(col("doc_id").isin(part: _*))
        .coalesce(1).write.mode(SaveMode.Append).parquet(streamDir)
      // pin mtimes: FileStreamSource orders arrivals by modification time
      new java.io.File(streamDir).listFiles()
        .filter(f => f.getName.endsWith(".parquet") &&
          f.lastModified() > 1700000000000L)
        .foreach(f => assert(f.setLastModified(1690000000000L + order * 60000L)))
    }

    def runBoth(): Unit = {
      awaitDone(graft.stream.CleanStream.run(spark, streamDir, cleanOut, cleanCkpt))
      // the manifest stream CONSUMES the clean stream's survivor shards
      awaitDone(ManifestStream.run(spark, s"$cleanOut/batch_*", mfOut, mfCkpt))
    }

    arrive(half1, 0)
    runBoth()
    val mid = spark.read.parquet(s"$mfOut/current")
      .as[(Long, Long, Long, Long)].collect().toSet
    val midExpect = PretrainOps.shardChecksums(
        survivors.filter(col("doc_id").isin(half1: _*)))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(mid == midExpect,
      "prefix manifest must equal batch shard_checksums of the ingested survivors")

    // restart BOTH streams with the second survivor wave
    arrive(half2, 1)
    runBoth()
    val fin = spark.read.parquet(s"$mfOut/current")
      .as[(Long, Long, Long, Long)].collect().toSet
    val finExpect = PretrainOps.shardChecksums(survivors)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fin == finExpect,
      "post-restart manifest must equal batch shard_checksums of corpus_clean's survivors")
    // CleanStream really was a fixed point (nothing re-filtered)
    val streamedIds = spark.read.parquet(s"$cleanOut/batch_*")
      .select("doc_id").as[Long].collect().toSet
    assert(streamedIds == ids.toSet,
      "already-clean survivors must pass the streaming gates untouched")
    survivors.unpersist()
    ()
  }

  test("replayed batch folds idempotently (versioned state ignores its own partial write)") {
    val docsDir = tmp("mf2-docs")
    val outDir = tmp("mf2-out")
    val ckpt = tmp("mf2-ckpt")
    val file1 = (1L to 40L).map(doc)
    file1.toDF("doc_id", "text", "source")
      .coalesce(1).write.mode(SaveMode.Append).parquet(docsDir)
    val q1 = ManifestStream.run(spark, docsDir, outDir, ckpt)
    awaitDone(q1)
    val once = spark.read.parquet(s"$outDir/current")
      .as[(Long, Long, Long, Long)].collect().toSet

    // simulate the crash-replay of batch 0: a fresh checkpoint re-runs the
    // same file against the EXISTING state dir — b_0 must be recomputed
    // from "no prior" (id < 0), not folded on top of itself
    val q2 = ManifestStream.run(spark, docsDir, outDir, tmp("mf2-ckpt-replay"))
    awaitDone(q2)
    val twice = spark.read.parquet(s"$outDir/current")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(twice == once, "replaying batch 0 must not double-count")
  }
}
