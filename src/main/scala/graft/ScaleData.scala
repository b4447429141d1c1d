package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: derive an N×-scaled benchmark corpus from an existing SF dir
  * by unioning id-shifted copies — used for the scaling-curve evidence in
  * SCALING.md (correctness stays pinned to the driver's own SFs; this data
  * is for THROUGHPUT measurement only).
  *
  * Copy construction keeps per-operator work "in matched pairs":
  *   - ids (event/user/doc/vec/custkey) shift by copy × (max+1) — no key
  *     collisions, per-key group sizes unchanged;
  *   - document text goes through a per-copy rotation of the letter set
  *     `aeiounrst` (a bijection, identity for copy 0): within-copy
  *     duplicate/near-dup structure is preserved exactly, while cross-copy
  *     texts differ in most tokens, so pairwise dedup output scales
  *     linearly with copies instead of quadratically;
  *   - `source` blocks and embedding `label` blocks get per-copy suffixes/
  *     offsets — block COUNT scales, block SIZE doesn't, keeping the
  *     blocked self-joins in matched pairs.
  *
  * Usage: runMain graft.ScaleData <srcSfDir> <outDir> <copies>
  */
object ScaleData {

  private val Letters = "aeiounrst"

  private def rotation(i: Int): String = {
    val k = i % Letters.length
    Letters.drop(k) + Letters.take(k)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args
    val copies = copiesS.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def shift(df: DataFrame, idCol: String): Long =
      df.agg(max(col(idCol))).head().getLong(0) + 1

    def unioned(df: DataFrame, build: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => build(df, i)).reduce(_ union _)

    val ev = tbl("events")
    val evShift = shift(ev, "event_id")
    val userShift = shift(ev, "user_id")
    unioned(ev, (d, i) => d.select(
      (col("event_id") + i * evShift).as("event_id"), col("ts"),
      (col("user_id") + i * userShift).as("user_id"),
      col("event_type"), col("value"), col("props")))
      .repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = tbl("documents")
    val docShift = shift(docs, "doc_id")
    // copy 0 is the IDENTITY copy (unsuffixed sources, unrotated text):
    // source-literal-keyed queries (BenchmarkSource for bm25/decontam/
    // contamination) keep their fixed benchmark side while the train
    // corpus scales — the production scaling shape for those ops. A
    // suffix on copy 0 made them measure empty inputs at x2/x8.
    unioned(docs, (d, i) => d.select(
      (col("doc_id") + i * docShift).as("doc_id"),
      translate(col("text"), Letters, rotation(i)).as("text"),
      col("lang"),
      (if (i == 0) col("source")
       else concat(col("source"), lit(s"_c$i"))).as("source"),
      col("n_chars")))
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = tbl("embeddings")
    val vecShift = shift(emb, "vec_id")
    unioned(emb, (d, i) => d.select(
      (col("vec_id") + i * vecShift).as("vec_id"),
      col("embedding"),
      (col("label") + i * 1000).cast("int").as("label")))
      .repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val cust = tbl("customer")
    val custShift = shift(cust, "c_custkey")
    unioned(cust, (d, i) => d.select(
      (col("c_custkey") + i * custShift).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))
      .repartition(8).write.mode("overwrite").parquet(s"$out/customer.parquet")

    // remaining TPC-H-ish tables: pass through unchanged (no scaled query
    // reads them; present so the dir is a complete SF layout)
    for (t <- Seq("region", "nation", "supplier", "part", "orders", "lineitem"))
      tbl(t).write.mode("overwrite").parquet(s"$out/$t.parquet")

    println(s"SCALED x$copies -> $out")
    spark.stop()
  }

  /** Deterministic CLUSTERED embedding fixture — a mixture of `k`
    * spherical blobs, generated from md5-derived values only (no RNG —
    * the id-rotation discipline above): the ANN/recall monitors'
    * documented worst case is the driver's near-uniform synthetic
    * embeddings, where cluster structure is absent and the lifts the
    * monitors exist to measure (learned centroids over the fixed
    * ladder, prototype entry points over arbitrary seeds) are invisible
    * or inverted. This fixture is the REGIME THE OPERATORS ARE FOR:
    * real embedding spaces are clustered, and the ordering specs pin
    * the expected rankings here.
    *
    * Construction: center `c` is the normalized vector of md5-derived
    * values in [−1, 1]; point `i` (cluster `i % k`, so the fixed query
    * set vec_id < NQueries spans clusters) is `center + spread · noise`
    * with its own md5-derived noise. `label` carries the true cluster
    * for block-structured consumers. Schema matches the driver's
    * embeddings table (vec_id, embedding float[], label int).
    */
  def clusteredEmbeddings(spark: SparkSession, n: Int = 512, k: Int = 8,
      d: Int = 64, spread: Double = 0.15): DataFrame = {
    import spark.implicits._
    def vals(seed: String): IndexedSeq[Double] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until d).map { j =>
        val h = md.digest(s"$seed:$j".getBytes("UTF-8"))
        val v = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
        v.toDouble / ((1 << 23).toDouble) - 1.0 // [-1, 1)
      }
    }
    def unit(v: IndexedSeq[Double]): IndexedSeq[Double] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nrm)
    }
    val centers = (0 until k).map(c => unit(vals(s"cent:$c")))
    val rows = (0 until n).map { i =>
      val c = i % k
      val noise = vals(s"pt:$i")
      val e = centers(c).zip(noise)
        .map { case (cv, nv) => (cv + spread * nv).toFloat }.toArray
      (i.toLong, e, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }
}
