package graft

import org.apache.spark.sql.graftext.GraftExtensions

/** The sketch expressions are usable from SQL after registration, and
  * agree with the Column DSL results.
  */
class SqlFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("SQL registration: sketch functions callable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  sorted_intersect_size(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS inter,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  simhash_bits(array(7L), 4) AS sim,
        |  rolling_fingerprint(array(1L, 2L, 3L), 2, 131L, 1000000007L) AS fp,
        |  rolling_window_hashes(array(1L, 2L, 3L), 2, 131L, 1000000007L) AS rwh,
        |  sorted_distinct(array(5L, 1L, 5L, 2L)) AS sd
        |""".stripMargin).head()
    assert(row.getInt(0) == 2)
    assert(row.getDouble(1) == 11.0)
    assert(row.getLong(2) == 7L) // single element: its low 4 bits win the vote
    // windows: [1,2] -> 1*131+2=133; [2,3] -> 2*131+3=265; min = 133
    assert(row.getLong(3) == 133L)
    assert(row.getSeq[Long](4) == Seq(133L, 265L))
    assert(row.getSeq[Long](5) == Seq(1L, 2L, 5L))
    // NFC: SQL face composes e+COMBINING ACUTE to U+00E9
    // (inputs spelled as escapes so no editor can pre-normalize them)
    val nfc = spark.sql("SELECT nfc_normalize('cafe\u0301') AS t")
      .head().getString(0)
    assert(nfc == "caf\u00e9")
  }

  test("sliding_min ≡ the HOF transform/slice form, incl. short inputs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftext.ArrayFunctions.sliding_min
    import spark.implicits._
    val w = 4
    val rows = Seq(
      Seq(9L, 3L, 7L, 5L, 1L, 8L, 2L), // normal: 4 windows
      Seq(5L, 6L, 7L, 8L),             // exactly one full window
      Seq(4L, 2L),                     // shorter than width → one window
      Seq(42L))                        // singleton
      .toDF("hs")
    val both = rows.select(
      sliding_min(col("hs"), w).as("kernel"),
      transform(
        sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
        j => array_min(slice(col("hs"), j, lit(w)))).as("hof"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    // and via SQL registration
    val sql = spark.sql(
      "SELECT sliding_min(array(9L,3L,7L,5L,1L,8L,2L), 4) AS m")
      .head().getSeq[Long](0)
    assert(sql === Seq(3L, 1L, 1L, 1L))
  }

  test("SQL pq_dist_tables: default codebook, agrees with the kernel directly") {
    GraftExtensions.register(spark)
    val emb = (1 to graft.ops.SimilarityOps.Dim).map(i => i / 64.0)
    val sqlArr = emb.map(d => s"${d}D").mkString("array(", ", ", ")")
    val got = spark.sql(s"SELECT pq_dist_tables($sqlArr) AS t").head()
      .getSeq[scala.collection.Seq[Double]](0)
    assert(got.length == graft.ops.SimilarityOps.PqSubspaces)
    assert(got.forall(_.length == graft.ops.SimilarityOps.PqCodes))
    // spot-check subspace 0 against the codebook arithmetic
    val expect0 = (0 until graft.ops.SimilarityOps.PqCodes).map { j =>
      val c = graft.ops.SimilarityOps.pqCentroid(0, j)
      (0 until graft.ops.SimilarityOps.PqSubDim)
        .map(d => { val x = emb(d) - c(d); x * x }).sum
    }
    got.head.zip(expect0).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("SQL md5_prefix_hashes agrees with the DSL tokenHash") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT md5_prefix_hashes(array('spark'))")
      .as[Seq[Long]].head().head
    val viaDsl = Seq("spark").toDF("t")
      .select(graft.ops.TextOps.tokenHash($"t")).as[Long].head()
    assert(viaSql == viaDsl)
  }
}
