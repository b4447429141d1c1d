package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps
import graft.stream.GraphStream

/** Streamed k-NN graph maintenance: after any ingested prefix —
  * including across a restart — the edge store must be IDENTICAL to the
  * batch graph over all vectors so far (per-cluster recompute is exact:
  * the batch candidate set is itself within-cluster), and the graph-ANN
  * search must serve from the streamed store unchanged.
  */
class GraphStreamSpec extends SparkSuite {

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private val edgeCols = Seq("vec_id", "neighbor_id", "rank", "cos_sim")

  test("streamed graph ≡ batch knnGraphAuto per prefix, across a restart") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val embDir = tmp("gstream-emb")
    val outDir = tmp("gstream-out")
    val ckpt = tmp("gstream-ckpt")

    // two files up front -> two micro-batches (maxFilesPerTrigger=1)
    emb.filter(col("vec_id") % 3 === 0).coalesce(1)
      .write.mode(SaveMode.Append).parquet(embDir)
    emb.filter(col("vec_id") % 3 === 1).coalesce(1)
      .write.mode(SaveMode.Append).parquet(embDir)
    awaitDone(GraphStream.run(spark, embDir, outDir, ckpt))
    val prefix = emb.filter(col("vec_id") % 3 =!= 2)
    assert(rows(spark.read.parquet(GraphStream.edgesDir(outDir))
        .select(edgeCols.map(col): _*)) ===
      rows(SimilarityOps.knnGraphAuto(prefix)),
      "after two batches the streamed graph must equal the batch build")

    // third file after a RESTART (fresh query, same checkpoint)
    emb.filter(col("vec_id") % 3 === 2).coalesce(1)
      .write.mode(SaveMode.Append).parquet(embDir)
    awaitDone(GraphStream.run(spark, embDir, outDir, ckpt))
    val streamed = spark.read.parquet(GraphStream.edgesDir(outDir))
    assert(rows(streamed.select(edgeCols.map(col): _*)) ===
      rows(SimilarityOps.knnGraphAuto(emb)),
      "post-restart the streamed graph must equal the full batch build")

    // the serving path reads the streamed store UNCHANGED
    assert(rows(SimilarityOps.annGraphSearchIndexed(
        spark, GraphStream.edgesDir(outDir), emb)) ===
      rows(SimilarityOps.annGraphSearchAuto(emb)),
      "graph-ANN search over the streamed index diverged from batch")
  }

  test("vector-store compaction: O(clusters) files, stream continues identically") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val outDir = tmp("gstream-compact")
    val k = SimilarityOps.KnnGraphK
    for (b <- 0 until 4)
      GraphStream.processBatch(spark, emb.filter(col("vec_id") % 5 === b),
        b.toLong, outDir, SimilarityOps.defaultCentroids, k)
    val vecRoot = s"$outDir/vectors"
    def vecRows = spark.read.parquet(vecRoot)
      .select("cluster_id", "vec_id", "emb_d", "norm")
      .collect().map(_.toSeq).toSet
    def parquetFiles = {
      val root = new java.io.File(vecRoot)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(root).filter(_.getName.endsWith(".parquet"))
    }
    val before = vecRows
    val filesBefore = parquetFiles.size
    val edgesBefore = rows(spark.read.parquet(GraphStream.edgesDir(outDir))
      .select(edgeCols.map(col): _*))
    // fold batches 0..2 into one consolidated dir; batch 3 (the only
    // one a replay may overwrite) stays
    assert(GraphStream.compactVectors(spark, outDir) === 3)
    assert(vecRows === before, "compaction must not change store content")
    assert(parquetFiles.size < filesBefore,
      s"compaction must shrink file count ($filesBefore -> ${parquetFiles.size})")
    // one file per cluster in the folded dir
    val foldedDir = new java.io.File(s"$vecRoot/batch_id=2")
    val clusterDirs = foldedDir.listFiles().filter(_.isDirectory)
    assert(clusterDirs.nonEmpty &&
      clusterDirs.forall(
        _.listFiles().count(_.getName.endsWith(".parquet")) === 1),
      "folded dir must hold one file per cluster")
    assert(rows(spark.read.parquet(GraphStream.edgesDir(outDir))
        .select(edgeCols.map(col): _*)) === edgesBefore,
      "edges store must be untouched by vector compaction")
    // compacting again is a no-op (only the newest dir + the fold left)
    assert(GraphStream.compactVectors(spark, outDir) === 0)
    // the stream continues over the compacted store: next batch's
    // prior-read (batch_id < 4) sees the folded base, edges end ≡ batch
    GraphStream.processBatch(spark, emb.filter(col("vec_id") % 5 === 4),
      4L, outDir, SimilarityOps.defaultCentroids, k)
    assert(rows(spark.read.parquet(GraphStream.edgesDir(outDir))
        .select(edgeCols.map(col): _*)) ===
      rows(SimilarityOps.knnGraphAuto(emb)),
      "post-compaction continuation diverged from the batch build")
  }

  test("fresh checkpoint over an existing outDir is refused, not corrupted") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val outDir = tmp("gstream-freshckpt")
    GraphStream.processBatch(spark, emb.filter(col("vec_id") % 2 === 0),
      0L, outDir, SimilarityOps.defaultCentroids, SimilarityOps.KnnGraphK)
    GraphStream.processBatch(spark, emb.filter(col("vec_id") % 2 === 1),
      1L, outDir, SimilarityOps.defaultCentroids, SimilarityOps.KnnGraphK)
    val before = rows(spark.read.parquet(GraphStream.edgesDir(outDir))
      .select(edgeCols.map(col): _*))
    // a NEW checkpoint restarts batch ids at 0: without the guard, the
    // batch_id < 0 prior-read excludes every ingested vector, touched
    // edges get rewritten from the new batch alone, and the batch_id=0
    // vectors dir is clobbered — refuse instead
    val ex = intercept[IllegalStateException] {
      GraphStream.processBatch(spark, emb.limit(5), 0L, outDir,
        SimilarityOps.defaultCentroids, SimilarityOps.KnnGraphK)
    }
    assert(ex.getMessage.contains("checkpoint"), ex.getMessage)
    assert(rows(spark.read.parquet(GraphStream.edgesDir(outDir))
        .select(edgeCols.map(col): _*)) === before,
      "both stores must be untouched after the refusal")
  }

  test("a replayed batch leaves the stores byte-stable (no duplication)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val outDir = tmp("gstream-replay")
    val b0 = emb.filter(col("vec_id") % 2 === 0)
    val b1 = emb.filter(col("vec_id") % 2 === 1)
    GraphStream.processBatch(spark, b0, 0L, outDir,
      SimilarityOps.defaultCentroids, SimilarityOps.KnnGraphK)
    GraphStream.processBatch(spark, b1, 1L, outDir,
      SimilarityOps.defaultCentroids, SimilarityOps.KnnGraphK)
    val before = rows(spark.read.parquet(GraphStream.edgesDir(outDir))
      .select(edgeCols.map(col): _*))
    // crash-between-write-and-commit: batch 1 replays
    GraphStream.processBatch(spark, b1, 1L, outDir,
      SimilarityOps.defaultCentroids, SimilarityOps.KnnGraphK)
    val after = spark.read.parquet(GraphStream.edgesDir(outDir))
    assert(rows(after.select(edgeCols.map(col): _*)) === before,
      "replay must replace its own partitions, not append")
    assert(after.count() ===
      SimilarityOps.knnGraph(emb).count(),
      "edge count matches the batch graph after replay")
  }
}
