package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the pre-partitioning that makes repeated
  * joins/aggregations on a stable key (doc_id, vec_id, span_hash) plan
  * WITHOUT an exchange: both sides of an equi-join on the bucket key are
  * already hash-partitioned identically on disk, so Catalyst drops the
  * shuffle; a groupBy on the key aggregates partition-local.
  *
  * This is the storage-level answer to "minimize shuffles" for a corpus
  * that is read many times: pay one bucketed write when the corpus lands,
  * then every downstream dedup/join/agg keyed by the bucket column skips
  * its exchange. At 100 TB with ~10¹⁰ docs, a bucket count in the low
  * thousands keeps buckets at a few GB — one task each, no shuffle, no
  * skew sensitivity beyond the key's own distribution.
  *
  * Spark requires bucketed data to live in a catalog table (the bucket
  * spec travels in table metadata, not the files), hence `saveAsTable`
  * with an explicit external path rather than a bare parquet write.
  */
object BucketedLayout {

  /** Write `df` as an external bucketed+sorted parquet table — exactly
    * ONE sorted file per bucket. Spark's bucketed writer emits one file
    * per bucket per WRITING TASK, so a 32-partition frame written into
    * 8 buckets lands up to 256 files; every later bucket-pruned probe
    * then pays listing + a footer open per file (the guide's §6
    * small-files tax — the round-15 x-scale cells measured it as the
    * dominant remaining patch term). The pre-write `repartition(buckets,
    * key)` uses the same murmur3-pmod hash as the bucket-id computation,
    * so each task holds exactly one bucket's rows and writes exactly one
    * file; `sortBy` additionally lets sort-merge consumers skip their
    * per-partition sort. The one-exchange cost lands on the untimed
    * daily write — the write-once/probe-many trade `hash`
    * write-distribution modes make in table formats.
    */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
      buckets: Int, path: String): Unit = {
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
    // Persist the spec BESIDE the data: the bucket layout lives in
    // catalog metadata, which a later session re-registering the table
    // does not have — without this sidecar, register() has to trust
    // the caller and a mismatched (key, buckets) silently mis-buckets
    // every downstream join.
    writeSpec(df.sparkSession, path, key, buckets)
  }

  /** Read a bucketed table back (bucket metadata intact). */
  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** ATTACH an existing bucketed artifact in a NEW session: the bucket
    * spec lives in table metadata, not the files, so a session that did
    * not run the write (a serving job, the next day's patch driver)
    * must re-register the external table before bucket pruning and
    * exchange elision apply. Schema is inferred from the parquet
    * footers; the (key, buckets) pair MUST match the writing
    * [[writeBucketed]] call — registering a different spec than the
    * files were laid out with silently mis-buckets every downstream
    * join.
    */
  def register(spark: SparkSession, tableName: String, key: String,
      buckets: Int, path: String): Unit = {
    // Cross-check against the spec the writer persisted: registering a
    // different (key, buckets) than the files' physical layout is the
    // silent-corruption case the docstring warns about — fail loudly
    // instead. Artifacts written before the sidecar existed register
    // as before (no file → trust the caller, as documented).
    readSpec(spark, path).foreach { case (specKey, specBuckets) =>
      require(specKey == key && specBuckets == buckets,
        s"BucketedLayout.register($tableName): caller spec (key=$key, " +
        s"buckets=$buckets) does not match the _bucket_spec.json the " +
        s"writer persisted at $path (key=$specKey, buckets=$specBuckets)" +
        " - registering a mismatched spec silently mis-buckets every " +
        "downstream join")
    }
    val schema = spark.read.parquet(path).schema
    val cols = schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    spark.sql(s"CREATE TABLE `$tableName` ($cols) USING parquet " +
      s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS " +
      s"LOCATION '$path'")
    ()
  }

  /** Sidecar file name — the leading underscore keeps it out of Spark's
    * data-file listing (the `_SUCCESS` convention), so the parquet read
    * in [[register]] never sees it.
    */
  private val SpecFile = "_bucket_spec.json"

  private def writeSpec(spark: SparkSession, path: String, key: String,
      buckets: Int): Unit = {
    val p = new Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"key":"$key","buckets":$buckets}"""
        .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The persisted (key, buckets) spec, if the writer left one. */
  private[graft] def readSpec(spark: SparkSession,
      path: String): Option[(String, Int)] = {
    val p = new Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt =
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8)
        finally in.close()
      val keyRe = """"key"\s*:\s*"([^"]*)"""".r
      val bktRe = """"buckets"\s*:\s*(\d+)""".r
      for {
        k <- keyRe.findFirstMatchIn(txt).map(_.group(1))
        b <- bktRe.findFirstMatchIn(txt).map(_.group(1).toInt)
      } yield (k, b)
    }
  }
}
