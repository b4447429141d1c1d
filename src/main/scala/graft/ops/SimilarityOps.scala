package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftext.ArrayFunctions.dot_product

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Two paths:
  *   - [[annTopkBruteForce]]: broadcast the (small) query set, score every
  *     candidate — the exact baseline. On a cluster this is a broadcast
  *     nested-loop whose cost is one full scan regardless of query count;
  *     it parallelizes perfectly (no shuffle of the big side).
  *   - [[annLshBucket]]: random-hyperplane LSH — each vector gets a sign
  *     bucket from H fixed integer hyperplanes; search only touches the
  *     query's bucket. At 100 TB the bucket assignment is a narrow map and
  *     the candidate join shuffles on the bucket id, reducing scored pairs
  *     by ~2^H.
  *
  * Float parity with the DuckDB oracle: embeddings are cast float→double
  * (exact), the dot product is a LEFT fold over index order (Spark
  * `aggregate` ≙ DuckDB `list_reduce` with prepended 0.0), so both engines
  * produce bit-identical doubles — ranking ties are then impossible to get
  * wrong, and we tie-break by vec_id anyway.
  */
object SimilarityOps {

  /** Number of fixed queries (vec_id < NQueries) and neighbors returned. */
  val NQueries = 8
  val TopK = 10

  /** LSH: H hyperplanes → 2^H sign buckets. Integer weights derived from a
    * fixed multiplicative sequence so Spark and the oracle share them as
    * literals: w(j)(d) = ((j·64 + d + 1)·2654435761 mod 101) − 50.
    */
  val LshPlanes = 4
  val Dim = 64
  def planeWeights(j: Int): IndexedSeq[Double] =
    (0 until Dim).map(d => (((j * Dim + d + 1) * 2654435761L) % 101L - 50L).toDouble)

  // ------------------------------------------------------------ primitives

  /** Left-fold dot product of two array<double> columns. Custom codegen'd
    * expression — the HOF form (`aggregate(zip_with(...))`) is interpreted
    * per element and this runs once per candidate PAIR. Same index-order
    * summation ⇒ bit-identical to the oracle's list_reduce.
    */
  def dot(a: Column, b: Column): Column = dot_product(a, b)

  /** SQL twin of [[dot]] — identical fold order. */
  def sqlDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (s,x) -> s + x)"

  /** embeddings + emb_d (double) + norm, computed once per row.
    * Repartitions first: the local embeddings table is one parquet file →
    * one input split, which would serialize all per-vector work (no-op
    * -sized shuffle at scale, where inputs have thousands of splits).
    */
  def withNorm(emb: DataFrame): DataFrame = {
    val d = transform(col("embedding"), x => x.cast("double"))
    emb
      .repartition(emb.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .select(col("vec_id"), col("label"), d.as("emb_d"))
      .withColumn("norm", sqrt(dot(col("emb_d"), col("emb_d"))))
  }

  def sqlWithNorm(table: String): String =
    s"""SELECT vec_id, label, emb_d, sqrt(${sqlDot("emb_d", "emb_d")}) AS norm
       |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb_d FROM $table)""".stripMargin

  /** Cosine similarity given precomputed norms — NULL when either norm
    * is zero. The guard is not cosmetic: Spark 4 runs ANSI mode by
    * default, where the bare division throws DIVIDE_BY_ZERO — one
    * degenerate all-zeros embedding in a 100 TB corpus would kill the
    * whole job. NULL compares false against any threshold: zero vectors
    * are degenerate, near-dups of nothing.
    */
  def cosine(ea: Column, na: Column, eb: Column, nb: Column): Column =
    when(na * nb > 0, dot(ea, eb) / (na * nb))

  /** SQL twin of [[cosine]] — the CASE guard is required for parity, not
    * style: an unguarded `x / 0.0` happens to be NULL on some DuckDB
    * versions but NaN under IEEE float division on others, and DuckDB
    * orders NaN ABOVE every value, so a NaN cosine would pass every
    * `>= threshold` filter and rank FIRST in the ANN DESC windows —
    * the oracle would emit zero-norm neighbors the guarded Spark side
    * never produces.
    */
  def sqlCosine(ea: String, na: String, eb: String, nb: String): String =
    s"CASE WHEN $na * $nb > 0 THEN ${sqlDot(ea, eb)} / ($na * $nb) END"

  // ---------------------------------------------------- ann_topk_bruteforce

  /** Exact top-K cosine neighbors for the fixed query set: broadcast the
    * queries, scan candidates once, per-query window for the top K.
    * The window shuffles only (query_id, score) pairs — N·|Q| rows, not N².
    */
  def annTopkBruteForce(emb: DataFrame): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("emb_d").as("eq"), col("norm").as("nq"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("eq"), col("nq"), col("emb_d"), col("norm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }

  def sqlAnnTopkBruteForce: String =
    s"""WITH e AS (${sqlWithNorm("embeddings")})
       |SELECT query_id, neighbor_id, rank, cos_sim FROM (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    ${sqlCosine("q.emb_d", "q.norm", "e.emb_d", "e.norm")} AS cos_sim,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCosine("q.emb_d", "q.norm", "e.emb_d", "e.norm")} DESC, e.vec_id) AS BIGINT) AS rank
       |  FROM e q JOIN e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NQueries)
       |WHERE rank <= $TopK""".stripMargin

  // ------------------------------------------------------- ann_lsh_bucket

  /** Sign-bucket id from the fixed hyperplanes (narrow map, no shuffle). */
  def lshBucket(embD: Column): Column =
    (0 until LshPlanes).map { j =>
      val w = array(planeWeights(j).map(lit): _*)
      when(dot(w, embD) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def sqlPlaneLit(j: Int): String =
    planeWeights(j).map(_.toString).mkString("([", ", ", "]::DOUBLE[])")

  def sqlLshBucket(embD: String): String =
    "CAST(" + (0 until LshPlanes).map { j =>
      s"CASE WHEN ${sqlDot(sqlPlaneLit(j), embD)} > 0 THEN ${1L << j} ELSE 0 END"
    }.mkString(" + ") + " AS BIGINT)"

  /** LSH-bucketed ANN: neighbors come only from the query's bucket, then
    * exact cosine ranks within it. Recall < 1 by construction (that's the
    * scale trade); bucket fan-out ≙ candidate count / 2^H.
    */
  def annLshBucket(emb: DataFrame): DataFrame = {
    val e = withNorm(emb).withColumn("bucket", lshBucket(col("emb_d")))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("bucket"),
        col("emb_d").as("eq"), col("norm").as("nq"))
    val scored = e.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("bucket"),
        cosine(col("eq"), col("nq"), col("emb_d"), col("norm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "bucket", "rank", "cos_sim")
  }

  // ----------------------------------------------------------- knn_graph

  /** Neighbors kept per vector in the kNN graph. */
  val KnnGraphK = 5

  /** Cluster-blocked k-nearest-neighbor GRAPH over the whole embedding
    * table — the adjacency structure graph clustering (connected
    * components over similarity edges), SemDeDup-style pipelines, and
    * diversity samplers consume. Unlike [[annTopkBruteForce]] (a fixed
    * tiny query set against the corpus), EVERY vector is a query, so
    * the quadratic pair space is bounded the way
    * [[DedupOps.dedupSemantic]] bounds it: neighbors come only from the
    * vector's max-dot coarse-centroid list (nProbe=1 semantics — recall
    * < 1 by construction, the documented IVF trade; at scale raise the
    * cluster count so Σ|cluster|² stays ~linear, or probe the
    * second-best list for boundary vectors at 2× pair cost).
    *
    * Scale shape: assignment is a narrow map (centroids ride as plan
    * literals); the within-cluster self-join shuffles on the cluster id
    * with the adaptive mod-salt of the other block joins (few clusters
    * → the salt restores parallelism); ranking is ONE per-vector window
    * on the raw double cosine (in-row fold order is identical in both
    * engines — the ann_topk parity precedent) with a neighbor-id
    * tiebreak, and the `rank <= k` filter plans as WindowGroupLimit so
    * every map task pre-limits to k rows per vector before the
    * exchange. Output is a directed edge list (vec_id, neighbor_id,
    * rank, cos_sim) of ≤ k·N rows; a vector alone in its cluster has no
    * edges and is absent.
    */
  def knnGraph(emb: DataFrame, k: Int = KnnGraphK,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame = {
    // assignment strategy by K (withClusterId): the oracle-pinned
    // literal-dot shape for small K, broadcast-join arg-max past the
    // measured literal-codegen cliff (granularity-∝-N territory)
    val e = DedupOps.materialize(knnAssign(emb, centroids),
      "knn_graph_clusters")
    knnEdgesWithinClusters(e, k)
      .select("vec_id", "neighbor_id", "rank", "cos_sim")
  }

  /** The graph's cluster-assignment face — (vec_id, emb_d, norm,
    * cluster_id) — shared by [[knnGraph]] and the streamed maintainer
    * ([[graft.stream.GraphStream]]), so batch and stream cannot disagree
    * on which list a vector lives in.
    */
  private[graft] def knnAssign(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]]): DataFrame =
    withClusterId(
      withNorm(emb).select(col("vec_id"), col("emb_d"), col("norm")),
      centroids)

  /** Within-cluster top-k edge build over an assigned (cluster_id,
    * vec_id, emb_d, norm) frame — [[knnGraph]]'s self-join + window
    * kernel as a shared definition: the streamed maintainer re-ranks
    * TOUCHED clusters through this exact kernel, so a recomputed
    * cluster's edges are bit-identical to the batch build's (same
    * cosine doubles, same neighbor-id tie rule). Output keeps
    * `cluster_id` (the stream's partition-overwrite key); [[knnGraph]]
    * projects it away.
    */
  private[graft] def knnEdgesWithinClusters(e: DataFrame, k: Int): DataFrame = {
    val salt = DedupOps.saltB(e)
    val a = e.select(col("cluster_id"), col("vec_id"),
        col("emb_d").as("ea"), col("norm").as("na"))
      .withColumn("salt", pmod(col("vec_id"), lit(salt)))
    val b = e.select(col("cluster_id").as("cluster2"),
        col("vec_id").as("neighbor_id"),
        col("emb_d").as("eb"), col("norm").as("nb"))
      .withColumn("salt2", explode(sequence(lit(0), lit(salt - 1))))
    val scored = a.join(b,
        col("cluster_id") === col("cluster2") &&
          col("salt") === col("salt2") &&
          col("vec_id") =!= col("neighbor_id"))
      .select(col("cluster_id"), col("vec_id"), col("neighbor_id"),
        cosine(col("ea"), col("na"), col("eb"), col("nb")).as("cos_sim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("cluster_id", "vec_id", "neighbor_id", "rank", "cos_sim")
  }

  /** DuckDB twin — the e CTE is [[DedupOps.sqlDedupSemantic]]'s cluster
    * assignment verbatim, so graph blocking and dedup blocking cannot
    * disagree.
    */
  def sqlKnnGraph: String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, emb_d, norm,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS cluster_id
       |  FROM (SELECT *, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")})))
       |SELECT vec_id, neighbor_id, rank, cos_sim FROM (
       |  SELECT a.vec_id, b.vec_id AS neighbor_id,
       |    ${sqlCosine("a.emb_d", "a.norm", "b.emb_d", "b.norm")} AS cos_sim,
       |    CAST(row_number() OVER (PARTITION BY a.vec_id
       |      ORDER BY ${sqlCosine("a.emb_d", "a.norm", "b.emb_d", "b.norm")} DESC,
       |        b.vec_id) AS BIGINT) AS rank
       |  FROM e a JOIN e b
       |    ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id)
       |WHERE rank <= $KnnGraphK""".stripMargin

  /** Prefix-dimension truncation levels for the matryoshka ablation. */
  val MrlDims: Seq[Int] = Seq(16, 32)

  /** Matryoshka ablation (Kusupati et al. 2022 MRL): recall@K of
    * brute-force search over PREFIX-truncated embeddings vs the
    * full-dimension exact top-K — the table that decides whether the
    * 2–4× index-size reduction of storing prefix dims is safe. Rows:
    * (mrl_dims, query_id, recall). Each truncation level is the same
    * broadcast-queries brute-force shape as [[annTopkBruteForce]];
    * truncation and the prefix norm are in-row slices, and the ONLY
    * cosine computed is over the prefix — this measures the geometry
    * the truncated index would actually search, not a rescaled full
    * cosine.
    */
  def matryoshkaRecall(emb: DataFrame): DataFrame = {
    val bf = annTopkBruteForce(emb).select("query_id", "neighbor_id")
    def truncTopk(dims: Int): DataFrame = {
      val e = withNorm(emb)
        .select(col("vec_id"), slice(col("emb_d"), 1, dims).as("emb_t"))
        .withColumn("norm_t", sqrt(dot(col("emb_t"), col("emb_t"))))
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("emb_t").as("eq"),
          col("norm_t").as("nq"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id"))
      e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          cosine(col("eq"), col("nq"), col("emb_t"), col("norm_t")).as("cos_sim"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= TopK)
        .select("query_id", "neighbor_id")
    }
    MrlDims.map { dims =>
      bf.join(truncTopk(dims).withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") /
          count(lit(1))).as("recall"))
        .withColumn("mrl_dims", lit(dims.toLong))
    }.reduce(_.unionByName(_))
      .select("mrl_dims", "query_id", "recall")
  }

  def sqlMatryoshkaRecall: String = {
    def arm(dims: Int): String =
      s"""SELECT CAST($dims AS BIGINT) AS mrl_dims, bf.query_id,
         |  CAST(count(t.neighbor_id) AS DOUBLE) / count(*) AS recall
         |FROM bf LEFT JOIN (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |      CAST(row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${sqlCosine("q.emb_t", "q.norm_t", "e.emb_t", "e.norm_t")} DESC,
         |          e.vec_id) AS BIGINT) AS rank
         |    FROM t$dims e JOIN t$dims q ON q.vec_id < $NQueries AND e.vec_id <> q.vec_id)
         |  WHERE rank <= $TopK) t
         |  ON t.query_id = bf.query_id AND t.neighbor_id = bf.neighbor_id
         |GROUP BY bf.query_id""".stripMargin
    def tCte(dims: Int): String =
      s"""t$dims AS (
         |  SELECT vec_id, emb_t, sqrt(${sqlDot("emb_t", "emb_t")}) AS norm_t
         |  FROM (SELECT vec_id, emb_d[1:$dims] AS emb_t
         |        FROM (${sqlWithNorm("embeddings")})))""".stripMargin
    s"""WITH bf AS (
       |  SELECT query_id, neighbor_id FROM (
       |${sqlAnnTopkBruteForce.linesIterator.map("    " + _).mkString("\n")}
       |  )),
       |${MrlDims.map(tCte).mkString(",\n")}
       |${MrlDims.map(arm).mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Contrastive-training triplets with HARD negative mining — the
    * embedding-training data-prep step (anchor, positive, negative):
    * per anchor, positive = the most-similar SAME-label neighbor,
    * negative = the most-similar DIFFERENT-label neighbor (hard — the
    * near-misses are what a contrastive loss learns from; random
    * negatives are trivially separable). Neighbors come from the
    * cluster-blocked [[knnGraph]] — the candidate generation is already
    * linear-shaped, and mining adds ONE anchor-keyed aggregation:
    * max over (cos, neighbor) structs conditioned on label match, so
    * per-anchor state is two structs regardless of k. Anchors missing
    * either side emit nothing (a triplet needs both); ties break to
    * the larger neighbor_id (the max-struct order, stated as contract).
    */
  /** Production entry: candidate granularity ∝ N (the
    * [[knnGraphAuto]] rule) — the fixed-8-centroid oracle shape is the
    * measured quadratic trap at scale (this operator: 55.9 s at x32 vs
    * the auto path's seconds, same cliff as SCALING round 7's 84 s).
    */
  def contrastiveTripletsAuto(emb: DataFrame): DataFrame =
    contrastiveTriplets(emb,
      autoCentroidSet(knnAutoCentroidCount(emb.count())))

  def contrastiveTriplets(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame =
    contrastiveTripletsOn(knnGraph(emb, KnnGraphK, centroids), emb)

  /** [[contrastiveTriplets]] over an explicit (already materialized) knn
    * edge frame `(vec_id, neighbor_id, rank, cos_sim)` — the entry a
    * deployment with a persisted [[knnGraph]] artifact calls, exactly the
    * pagerank / label-propagation / representatives serving discipline
    * (the oracle twin re-derives the graph from raw embeddings, so hash
    * parity proves the sharing is semantics-free). Labels come from the
    * embedding table; the mining itself is unchanged.
    */
  def contrastiveTripletsOn(edges: DataFrame, emb: DataFrame): DataFrame = {
    val labels = emb.select(col("vec_id"), col("label").cast("long"))
    val labeled = edges
      .join(labels.withColumnRenamed("label", "label_a"), Seq("vec_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"),
        col("label").as("label_b")), Seq("neighbor_id"))
    labeled.groupBy(col("vec_id"), col("label_a"))
      .agg(
        max(when(col("label_a") === col("label_b"),
          struct(col("cos_sim"), col("neighbor_id")))).as("p"),
        max(when(col("label_a") =!= col("label_b"),
          struct(col("cos_sim"), col("neighbor_id")))).as("n"))
      .filter(col("p").isNotNull && col("n").isNotNull)
      .select(col("vec_id").as("anchor_id"), col("label_a").as("label"),
        col("p.neighbor_id").as("positive_id"),
        col("n.neighbor_id").as("negative_id"),
        col("p.cos_sim").as("pos_cos"), col("n.cos_sim").as("neg_cos"),
        (col("p.cos_sim") - col("n.cos_sim")).as("margin"))
  }

  def sqlContrastiveTriplets: String =
    s"""WITH edges AS (
       |${sqlKnnGraph.linesIterator.map("  " + _).mkString("\n")}
       |),
       |labeled AS (
       |  SELECT e.vec_id, e.neighbor_id, e.cos_sim,
       |    CAST(la.label AS BIGINT) AS label_a,
       |    CAST(lb.label AS BIGINT) AS label_b
       |  FROM edges e
       |  JOIN embeddings la ON la.vec_id = e.vec_id
       |  JOIN embeddings lb ON lb.vec_id = e.neighbor_id),
       |ranked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY vec_id, label_a = label_b
       |      ORDER BY cos_sim DESC, neighbor_id DESC) AS r
       |  FROM labeled)
       |SELECT p.vec_id AS anchor_id, p.label_a AS label,
       |  p.neighbor_id AS positive_id, n.neighbor_id AS negative_id,
       |  p.cos_sim AS pos_cos, n.cos_sim AS neg_cos,
       |  p.cos_sim - n.cos_sim AS margin
       |FROM (SELECT * FROM ranked WHERE label_a = label_b AND r = 1) p
       |JOIN (SELECT * FROM ranked WHERE label_a <> label_b AND r = 1) n
       |  USING (vec_id)""".stripMargin

  // --------------------------------------- knn_graph: auto granularity

  /** Target cluster size for the granularity-∝-N rule. Within-cluster
    * pair cost is Σ|cluster|²; holding expected cluster size CONSTANT as
    * the corpus grows keeps that sum ~linear in N. The fixed-8-centroid
    * default is the measured quadratic trap (SCALING.md round 7: 84 s at
    * x32 vs 3.46 s with centroids ∝ N on the same operator) — so the
    * production entry points below derive the centroid count from the
    * corpus instead of trusting a pinned constant. 256 keeps per-cluster
    * work (~65k pairs) far below a task's split size while leaving
    * clusters statistically meaningful.
    */
  val KnnTargetClusterSize = 256

  /** Centroid count for a corpus of n vectors: ⌈n / target⌉, floored at
    * [[IvfCentroids]] so tiny corpora keep the oracle-pinned shape.
    */
  def knnAutoCentroidCount(n: Long, target: Int = KnnTargetClusterSize): Int =
    math.max(IvfCentroids.toLong, (n + target - 1) / target).toInt

  /** The deterministic centroid ladder extended to any K — the same
    * generator as [[defaultCentroids]] (which is `autoCentroidSet(8)`).
    * At scale the learned [[ivfTrain]] set drops in instead; the
    * AUTO-GRANULARITY rule (K ∝ N) is what must not be optional.
    */
  def autoCentroidSet(k: Int): IndexedSeq[IndexedSeq[Double]] =
    (0 until k).map(centroid)

  /** [[knnGraph]] with granularity ∝ N — the PRODUCTION DEFAULT path.
    * One O(1)-result count() decides K driver-side (the k-means-stats
    * "driver decides" pattern), then the graph runs with ⌈N/256⌉
    * clusters: constant expected cluster size, ~linear total pair work,
    * no quadratic trap when the corpus is 1000× bigger. The pinned-
    * centroid [[knnGraph]] face remains for the deterministic oracle key
    * and for callers bringing [[ivfTrain]]'s learned centroids.
    */
  def knnGraphAuto(emb: DataFrame, k: Int = KnnGraphK,
      targetClusterSize: Int = KnnTargetClusterSize): DataFrame =
    knnGraph(emb, k,
      autoCentroidSet(knnAutoCentroidCount(emb.count(), targetClusterSize)))

  /** Centroid count above which assignment switches from plan-literal
    * dot arrays to the broadcast-join arg-max ([[clusterIdsOf]]).
    * MEASURED boundary, not taste: a K=250 literal `array(dot, dot, …)`
    * expression evaluated 30.5 s for 64k vectors on EVERY run (the
    * expression is too large to stay in efficient codegen), while K=8
    * took 0.4 s and the join form does the same arithmetic through ONE
    * codegen'd dot per (vector, centroid) row. Conf-overridable so the
    * equivalence spec can force either path on the same K.
    */
  val LiteralCentroidMax = 16
  val LiteralCentroidMaxConf = "spark.graft.knn.literalCentroidMax"
  private def literalMax(df: DataFrame): Int =
    df.sparkSession.conf.getOption(LiteralCentroidMaxConf)
      .map(_.toInt).getOrElse(LiteralCentroidMax)

  /** Max-dot cluster ids for a (vec_id, emb_d, …) frame: literal dot
    * array for small K (the oracle-pinned shape), broadcast-join arg-max
    * for large K — centroids become DATA (a K-row broadcast), each
    * (vector, centroid) row pays one codegen'd [[dot]], and the arg-max
    * is a map-side-combined `max(struct(dot, -cent_id))` agg whose tie
    * rule (highest dot, then LOWEST centroid id) is exactly the literal
    * path's `array_position(dots, array_max(dots))`. Output
    * (vec_id, cluster_id); narrow columns only ride the K-fan-out.
    */
  private[ops] def withClusterId(base: DataFrame,
      cents: Seq[IndexedSeq[Double]]): DataFrame =
    if (cents.size <= literalMax(base))
      base
        .withColumn("dots", centDotsOf(cents, col("emb_d")))
        .withColumn("cluster_id",
          (array_position(col("dots"), array_max(col("dots"))) - 1)
            .cast("long"))
        .drop("dots")
    else base.join(clusterIdsOf(base, cents), Seq("vec_id"))

  private[ops] def clusterIdsOf(e: DataFrame,
      cents: Seq[IndexedSeq[Double]]): DataFrame = {
      import scala.jdk.CollectionConverters._
      val spark = e.sparkSession
      val cdf = spark.createDataFrame(
        cents.zipWithIndex.map { case (c, i) =>
          org.apache.spark.sql.Row(i.toLong, c)
        }.asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cent_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("cvec",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType)))))
      e.select(col("vec_id"), col("emb_d"))
        .crossJoin(broadcast(cdf))
        .select(col("vec_id"), col("cent_id"),
          dot(col("cvec"), col("emb_d")).as("dd"))
        .groupBy("vec_id")
        .agg(max(struct(col("dd"), (-col("cent_id")).as("neg"))).as("m"))
        .select(col("vec_id"), (-col("m.neg")).cast("long").as("cluster_id"))
    }

  // ------------------------------------------- knn_graph: 2-probe + recall

  /** [[knnGraph]] probing each vector's best AND second-best centroid
    * list — the boundary-vector fix for nProbe=1's structural recall
    * loss (a vector near a cluster boundary has true neighbors just
    * across it). Candidates still live in exactly one list, so each
    * (query, neighbor) pair appears at most once; query-side rows double
    * (2× pair cost), nothing else changes — the same recall/cost dial
    * [[annIvfProbe]] exposes, applied to the all-vectors graph.
    */
  def knnGraph2Probe(emb: DataFrame, k: Int = KnnGraphK,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame = {
    val salt = DedupOps.saltB(emb)
    val e = DedupOps.materialize(
      assigned(emb, centroids)
        .withColumn("second",
          array_position(col("dots"),
            array_max(array_remove(col("dots"), array_max(col("dots"))))) - 1)
        .select(col("vec_id"), col("emb_d"), col("norm"),
          col("centroid").cast("long").as("cluster_id"),
          col("second").cast("long").as("second_id")),
      "knn_graph2_clusters")
    val a = e.select(col("vec_id"), col("emb_d").as("ea"), col("norm").as("na"),
        explode(array(col("cluster_id"), col("second_id"))).as("probe"))
      .withColumn("salt", pmod(col("vec_id"), lit(salt)))
    val b = e.select(col("cluster_id").as("cluster2"),
        col("vec_id").as("neighbor_id"),
        col("emb_d").as("eb"), col("norm").as("nb"))
      .withColumn("salt2", explode(sequence(lit(0), lit(salt - 1))))
    val scored = a.join(b,
        col("probe") === col("cluster2") && col("salt") === col("salt2") &&
          col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("neighbor_id"),
        cosine(col("ea"), col("na"), col("eb"), col("nb")).as("cos_sim"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "neighbor_id", "rank", "cos_sim")
  }

  /** Measured recall of the cluster-blocked graph against exact brute
    * force — the [[annRecall]] discipline applied to [[knnGraph]]: for
    * the fixed query subset (vec_id < [[NQueries]]), what fraction of
    * the TRUE top-[[KnnGraphK]] neighbors does the graph keep, probing
    * 1 list and probing 2? The gap between the two rows is exactly the
    * boundary-vector loss the second-best probe buys back; the monitor
    * a production pipeline runs on a sample before trusting nProbe=1.
    * (The window rank is per-vector, so filtering to the query subset
    * after ranking changes nothing — same edges, cheaper oracle.)
    */
  def knnRecall(emb: DataFrame): DataFrame =
    knnRecallWith(emb, defaultCentroids)

  /** [[knnRecall]] against ANY centroid set — the production monitor
    * runs this with [[ivfTrain]]'s learned quantizer on a sample before
    * trusting nProbe=1 blocking (the fixed pseudo-random set's 0.10
    * recall on the fixture is exactly the failure it would catch).
    */
  def knnRecallWith(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]]): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("emb_d").as("eq"),
        col("norm").as("nq"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("eq"), col("nq"), col("emb_d"), col("norm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    val exact = scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= KnnGraphK)
      .select("query_id", "neighbor_id")
    def recallOf(name: String, g: DataFrame): DataFrame =
      exact.join(
          g.filter(col("vec_id") < NQueries)
            .select(col("vec_id").as("query_id"), col("neighbor_id"))
            .withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") /
          count(lit(1))).as("recall"))
        .withColumn("method", lit(name))
    recallOf("cluster_1probe", knnGraph(emb, KnnGraphK, centroids))
      .unionByName(recallOf("cluster_2probe",
        knnGraph2Probe(emb, KnnGraphK, centroids)))
      .select("method", "query_id", "recall")
  }

  def sqlKnnRecall: String = {
    val cos = sqlCosine("q.emb_d", "q.norm", "e.emb_d", "e.norm")
    val gcos = sqlCosine("a.emb_d", "a.norm", "b.emb_d", "b.norm")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, emb_d, norm, dots,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS cluster_id,
       |    CAST(list_position(dots, list_max(list_filter(dots, x -> x <> list_max(dots)))) - 1 AS BIGINT) AS second_id
       |  FROM (SELECT *, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")}))),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY $cos DESC, e.vec_id) AS BIGINT) AS rank
       |    FROM e q JOIN e ON e.vec_id <> q.vec_id
       |    WHERE q.vec_id < $NQueries)
       |  WHERE rank <= $KnnGraphK),
       |g1 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY $gcos DESC, b.vec_id) AS BIGINT) AS rank
       |    FROM e a JOIN e b
       |      ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id
       |    WHERE a.vec_id < $NQueries)
       |  WHERE rank <= $KnnGraphK),
       |g2 AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY $gcos DESC, b.vec_id) AS BIGINT) AS rank
       |    FROM (SELECT vec_id, emb_d, norm,
       |            unnest([cluster_id, second_id]) AS probe
       |          FROM e WHERE vec_id < $NQueries) a
       |    JOIN e b ON a.probe = b.cluster_id AND a.vec_id <> b.vec_id)
       |  WHERE rank <= $KnnGraphK)
       |SELECT 'cluster_1probe' AS method, exact.query_id,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
       |FROM exact LEFT JOIN g1 a
       |  ON exact.query_id = a.query_id AND exact.neighbor_id = a.neighbor_id
       |GROUP BY exact.query_id
       |UNION ALL
       |SELECT 'cluster_2probe' AS method, exact.query_id,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
       |FROM exact LEFT JOIN g2 a
       |  ON exact.query_id = a.query_id AND exact.neighbor_id = a.neighbor_id
       |GROUP BY exact.query_id""".stripMargin
  }

  // --------------------------------------------------------- knn_pagerank

  /** PageRank damping (d = 85/100 — rational on purpose) and fixed
    * iteration count for the oracle key.
    */
  val PrDampNum = 85L
  val PrIters = 5

  /** PageRank-style centrality over the [[knnGraph]] edges — the graph
    * face of representativeness selection: a vector many near-neighbor
    * chains point INTO is central to its region (the coreset/authority
    * pick, complementing [[clusterSample]]'s geometric prototypes), and
    * a dedup cluster's highest-centrality member is the natural
    * survivor. Standard power iteration with damping 85/100,
    * [[PrIters]] fixed rounds, EXACT integer micros: per round,
    * `pr'(v) = (15·10⁶) div 100 + (85·Σ_{u→v} (pr(u) div out(u))) div 100`
    * — integer division before the sum and after the damping product,
    * identical in both engines; no convergence test (fixed rounds ARE
    * the oracle contract, the [[graft.ops.TextOps]] train-loop
    * discipline).
    *
    * Scale shape: each round is one join of the rank table against the
    * edge list on src (k·N rows) and one map-side-combined sum by dst —
    * the canonical distributed PR round; the plan grows LINEARLY in
    * rounds (the rank table feeds one join side only, unlike the
    * suffix-array's self-join), so five rounds need no lineage
    * truncation. Nodes with no IN-edges keep the teleport term only
    * (left join, coalesce 0). Node set = vectors appearing in the edge
    * list (isolated vectors have no graph opinion, absent in both
    * engines).
    */
  def knnPagerank(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame =
    pagerankOn(DedupOps.materialize(knnEdges(emb, centroids), "pr_edges"))

  /** PR over an explicit (already-materialized) edge list — split out so
    * [[communityRepresentatives]] runs LP and PR over ONE knn build.
    */
  private[graft] def pagerankOn(edges: DataFrame): DataFrame = {
    // same per-round truncation as [[labelPropagate]] (review round-10):
    // checkpointed rank/degree tables are sized blocks, so the
    // rank⋈edges⋈degree joins broadcast instead of sort-merging on the
    // stats-less iterative lineage
    val runId = java.util.UUID.randomUUID().toString.take(8)
    def truncate(df: DataFrame, name: String): DataFrame =
      DedupOps.truncateIter(df, s"pr-$runId", name)
    val outDeg = truncate(
      edges.groupBy("src").agg(count(lit(1)).as("deg")), "pr_deg")
    val nodes = truncate(
      edges.select(col("src").as("vec_id"))
        .union(edges.select(col("dst").as("vec_id"))).distinct(),
      "pr_nodes")
    val teleport = (15L * 1000000L) / 100L
    var pr = nodes.withColumn("pr_micro", lit(1000000L))
    var spent: DataFrame = null
    for (i <- 1 to PrIters) {
      val contrib = pr
        .join(edges, pr("vec_id") === edges("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("vec_id"),
          expr("pr_micro div deg").as("c"))
        .groupBy("vec_id").agg(sum(col("c")).as("in_sum"))
      val next = truncate(
        nodes.join(contrib, Seq("vec_id"), "left")
          .select(col("vec_id"),
            (lit(teleport) +
              expr(s"($PrDampNum * coalesce(in_sum, 0)) div 100"))
              .as("pr_micro")),
        s"pr_rank_${i % 2}")
      if (spent != null)
        org.apache.spark.sql.graftext.CheckpointBlocks.unpersist(spent)
      spent = next
      pr = next
    }
    org.apache.spark.sql.graftext.CheckpointBlocks.unpersist(outDeg)
    org.apache.spark.sql.graftext.CheckpointBlocks.unpersist(nodes)
    pr.select(col("vec_id"), col("pr_micro"),
      (col("pr_micro").cast("double") / 1000000.0).as("pr"))
  }

  /** DuckDB twin: the graph CTE is [[sqlKnnGraph]]'s; the five rounds
    * unroll as pr0..pr5 CTEs.
    */
  def sqlKnnPagerank: String = {
    val teleport = (15L * 1000000L) / 100L
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n.vec_id,
         |    $teleport + ($PrDampNum * coalesce(s.in_sum, 0)) // 100
         |      AS pr_micro
         |  FROM nodes n LEFT JOIN (
         |    SELECT g.dst AS vec_id,
         |      CAST(sum(p.pr_micro // d.deg) AS BIGINT) AS in_sum
         |    FROM $prev p
         |    JOIN g ON g.src = p.vec_id
         |    JOIN deg d ON d.src = g.src
         |    GROUP BY g.dst) s ON s.vec_id = n.vec_id)""".stripMargin
    val rounds = (1 to PrIters)
      .map(i => round(s"pr${i - 1}", s"pr$i")).mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, emb_d, norm,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS cluster_id
       |  FROM (SELECT *, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")}))),
       |g AS MATERIALIZED (
       |  SELECT vec_id AS src, neighbor_id AS dst FROM (
       |    SELECT a.vec_id, b.vec_id AS neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqlCosine("a.emb_d", "a.norm", "b.emb_d", "b.norm")} DESC,
       |          b.vec_id) AS BIGINT) AS rank
       |    FROM e a JOIN e b
       |      ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id)
       |  WHERE rank <= $KnnGraphK),
       |deg AS (SELECT src, count(*) AS deg FROM g GROUP BY src),
       |nodes AS (SELECT DISTINCT vec_id FROM (
       |  SELECT src AS vec_id FROM g UNION ALL SELECT dst FROM g)),
       |pr0 AS (SELECT vec_id, CAST(1000000 AS BIGINT) AS pr_micro FROM nodes),
       |$rounds
       |SELECT vec_id, CAST(pr_micro AS BIGINT) AS pr_micro,
       |  CAST(pr_micro AS DOUBLE) / 1000000.0 AS pr
       |FROM pr$PrIters""".stripMargin
  }

  // ------------------------------------------------------ knn_communities

  /** Label-propagation rounds for [[knnCommunities]] — synchronous LP
    * converges fast on knn graphs (small diameter within communities);
    * 3 pinned rounds keep the unrolled oracle tractable.
    */
  val LpIters = 3

  /** Community detection over the knn graph — synchronous label
    * propagation (Raghavan et al. 2007): every node starts labeled by
    * its own id, and each round adopts the MODE of its neighbors'
    * labels (tie → smallest label — deterministic, engine-independent).
    * Communities are the granularity between [[graft.ops.DedupOps
    * .dedupComponents]]' connected components (too coarse: one bridge
    * edge fuses two topic clusters) and the raw knn edges (too fine) —
    * the unit a diversity sampler or topic-balance card works in.
    * Graph-face sibling of [[knnPagerank]]: same edges, mode instead of
    * rank mass. Edges symmetrize first (knn is directed; communities
    * are not).
    *
    * Shape per round: ONE labels⋈edges join + one (dst, label) count
    * agg + one per-dst arg-max — all map-side combinable; plan linear
    * in rounds (labels feed one join side — the pagerank discipline).
    */
  def knnCommunities(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame =
    labelPropagate(knnEdges(emb, centroids))

  /** LP over an explicit edge list — split out so the spec can feed a
    * hand-built graph with a known community structure.
    */
  private[graft] def labelPropagate(knn: DataFrame): DataFrame = {
    // per-round lineage truncation (the connectedComponents discipline,
    // review round-10): a cache-backed label table gives AQE no size
    // stats on the iterative lineage, so the mid-pipeline label⋈edges
    // joins fell back to sort-merge; a checkpointed round is a sized
    // block AQE broadcasts. Same pinned-RDD hygiene: each round's
    // checkpoint is freed when the next materializes, the final one
    // backs the returned frame.
    val runId = java.util.UUID.randomUUID().toString.take(8)
    def truncate(df: DataFrame, name: String): DataFrame =
      DedupOps.truncateIter(df, s"lp-$runId", name)
    val edges = truncate(
      knn.union(knn.select(col("dst").as("src"), col("src").as("dst")))
        .distinct(),
      "lp_edges")
    var labels = edges.select(col("src").as("vec_id")).distinct()
      .withColumn("label", col("vec_id"))
    var spent: DataFrame = null
    for (i <- 1 to LpIters) {
      val next = truncate(
        labels
          .join(edges, labels("vec_id") === edges("src"))
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("dst"))
          .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
          .select(col("dst").as("vec_id"), (-col("m.nl")).as("label")),
        s"lp_labels_${i % 2}")
      if (spent != null)
        org.apache.spark.sql.graftext.CheckpointBlocks.unpersist(spent)
      spent = next
      labels = next
    }
    org.apache.spark.sql.graftext.CheckpointBlocks.unpersist(edges)
    val sizes = labels.groupBy(col("label"))
      .agg(count(lit(1)).as("n_members"))
    labels.join(sizes, "label")
      .select(col("vec_id"), col("label").as("community_id"), col("n_members"))
  }

  /** DuckDB twin: [[sqlKnnPagerank]]'s graph CTEs with the rounds
    * unrolled as l0..l3; the per-node arg-max is a row_number ordered
    * (cnt DESC, label ASC) — the same tie rule as the struct max.
    */
  def sqlKnnCommunities: String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT vec_id, label FROM (
         |    SELECT eg.dst AS vec_id, p.label, count(*) AS cnt,
         |      row_number() OVER (PARTITION BY eg.dst
         |        ORDER BY count(*) DESC, p.label) AS r
         |    FROM $prev p JOIN eg ON eg.src = p.vec_id
         |    GROUP BY eg.dst, p.label)
         |  WHERE r = 1)""".stripMargin
    val rounds = (1 to LpIters)
      .map(i => round(s"l${i - 1}", s"l$i")).mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, emb_d, norm,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS cluster_id
       |  FROM (SELECT *, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")}))),
       |g AS MATERIALIZED (
       |  SELECT vec_id AS src, neighbor_id AS dst FROM (
       |    SELECT a.vec_id, b.vec_id AS neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqlCosine("a.emb_d", "a.norm", "b.emb_d", "b.norm")} DESC,
       |          b.vec_id) AS BIGINT) AS rank
       |    FROM e a JOIN e b
       |      ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id)
       |  WHERE rank <= $KnnGraphK),
       |eg AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM g UNION ALL SELECT dst, src FROM g)),
       |nodes AS (SELECT DISTINCT src AS vec_id FROM eg),
       |l0 AS (SELECT vec_id, vec_id AS label FROM nodes),
       |$rounds
       |SELECT l.vec_id, l.label AS community_id, s.n_members
       |FROM l$LpIters l JOIN (
       |  SELECT label, count(*) AS n_members FROM l$LpIters GROUP BY label) s
       |  ON s.label = l.label""".stripMargin
  }

  // ---------------------------------------------- community_representatives

  /** The graph-face coreset: per [[knnCommunities]] community, the
    * member with the highest [[knnPagerank]] authority (tie → smallest
    * vec_id) — "one representative per topic, the most central one".
    * The survivor rule [[graft.ops.DedupOps.dedupSurvivors]] applies at
    * the near-dup level, lifted to the community level; the geometric
    * sibling is `cluster_sample`'s prototypes. Both inputs are
    * already-verified operators over the SAME knn edges; this is one
    * vec_id-keyed join + one community-keyed arg-max on top — the
    * composition costs two metadata-scale exchanges beyond what the
    * graph ops already paid.
    */
  def communityRepresentatives(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame =
    // ONE knn build: LP and PR both read the same materialized edges.
    // Honest x32 note: measured ≈ even with two builds (6.83 vs 6.85 s)
    // because at fixture scale the 8 iterative rounds' fixed per-stage
    // overhead dominates, not the 25k-edge build — the sharing pays at
    // real scale where the blocked pair join is the cost
    communityRepresentativesOn(DedupOps.materialize(
      knnEdges(emb, centroids), "cr_edges"))

  /** The knn graph as a bare (src, dst) edge list — THE shared serving
    * artifact of the graph family: a production deployment builds the
    * knn graph once beside the embedding table and every graph consumer
    * (pagerank authority, LP communities, representatives) reads it,
    * exactly as the token table is materialized once beside the corpus.
    */
  def knnEdges(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame =
    knnGraph(emb, centroids = centroids)
      .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))

  /** [[communityRepresentatives]] over an explicit (already
    * materialized) edge list — the entry a deployment with a persisted
    * [[knnEdges]] artifact calls; LP and PR read the SAME edges.
    */
  def communityRepresentativesOn(edges: DataFrame): DataFrame = {
    // LP and PR are INDEPENDENT given the edge list, but each is a chain
    // of driver-serialized truncation rounds (3 LP + 5 PR + 3 one-off
    // checkpoints) whose per-round fixed cost dominates at small scale.
    // Run the two chains on two driver threads (guide §2.6 overlap —
    // Spark schedules concurrent jobs FIFO and back-fills executors):
    // identical frames, identical results, the rounds of one chain fill
    // the scheduling gaps of the other. Measured at sf0.1 x32:
    // 3.36 s -> 2.18 s. The edge input is materialized/persisted by
    // every caller, so the two threads share one build.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val lpF = Future(labelPropagate(edges))
      val prF = Future(pagerankOn(edges))
      // one chain failing must not leak the other (review r14): the pool
      // thread runs its eager rounds to completion regardless — drain the
      // survivor and drop the checkpoint blocks nobody will read
      def drained(t: Throwable, other: => DataFrame): Nothing = {
        try org.apache.spark.sql.graftext.CheckpointBlocks.unpersist(other)
        catch { case _: Throwable => () }
        throw t
      }
      val lp = try Await.result(lpF, Duration.Inf)
        catch { case t: Throwable => drained(t, Await.result(prF, Duration.Inf)) }
      val pr = try Await.result(prF, Duration.Inf)
        catch { case t: Throwable => drained(t, lp) }
      lp.join(pr.select(col("vec_id"), col("pr_micro")), "vec_id")
        .groupBy(col("community_id"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("pr_micro"), (-col("vec_id")).as("nv"))).as("m"))
        .select(col("community_id"), (-col("m.nv")).as("rep_vec_id"),
          col("m.pr_micro").as("rep_pr_micro"), col("n_members"))
    } finally pool.shutdown()
  }

  /** DuckDB twin: ONE shared e/g graph prefix, the LP and PR round
    * chains side by side, then the same join + arg-max (row_number
    * ordered pr DESC, vec_id ASC — the struct-max tie rule).
    */
  def sqlCommunityRepresentatives: String = {
    val teleport = (15L * 1000000L) / 100L
    def prRound(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT n.vec_id,
         |    $teleport + ($PrDampNum * coalesce(s.in_sum, 0)) // 100
         |      AS pr_micro
         |  FROM nodes n LEFT JOIN (
         |    SELECT g.dst AS vec_id,
         |      CAST(sum(p.pr_micro // d.deg) AS BIGINT) AS in_sum
         |    FROM $prev p
         |    JOIN g ON g.src = p.vec_id
         |    JOIN deg d ON d.src = g.src
         |    GROUP BY g.dst) s ON s.vec_id = n.vec_id)""".stripMargin
    def lpRound(prev: String, cur: String): String =
      s"""$cur AS (
         |  SELECT vec_id, label FROM (
         |    SELECT eg.dst AS vec_id, p.label, count(*) AS cnt,
         |      row_number() OVER (PARTITION BY eg.dst
         |        ORDER BY count(*) DESC, p.label) AS r
         |    FROM $prev p JOIN eg ON eg.src = p.vec_id
         |    GROUP BY eg.dst, p.label)
         |  WHERE r = 1)""".stripMargin
    val prRounds = (1 to PrIters)
      .map(i => prRound(s"pr${i - 1}", s"pr$i")).mkString(",\n")
    val lpRounds = (1 to LpIters)
      .map(i => lpRound(s"l${i - 1}", s"l$i")).mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, emb_d, norm,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS cluster_id
       |  FROM (SELECT *, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")}))),
       |g AS MATERIALIZED (
       |  SELECT vec_id AS src, neighbor_id AS dst FROM (
       |    SELECT a.vec_id, b.vec_id AS neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqlCosine("a.emb_d", "a.norm", "b.emb_d", "b.norm")} DESC,
       |          b.vec_id) AS BIGINT) AS rank
       |    FROM e a JOIN e b
       |      ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id)
       |  WHERE rank <= $KnnGraphK),
       |eg AS MATERIALIZED (
       |  SELECT DISTINCT src, dst FROM (
       |    SELECT src, dst FROM g UNION ALL SELECT dst, src FROM g)),
       |deg AS (SELECT src, count(*) AS deg FROM g GROUP BY src),
       |nodes AS (SELECT DISTINCT vec_id FROM (
       |  SELECT src AS vec_id FROM g UNION ALL SELECT dst FROM g)),
       |pr0 AS (SELECT vec_id, CAST(1000000 AS BIGINT) AS pr_micro FROM nodes),
       |$prRounds,
       |l0 AS (SELECT src AS vec_id, src AS label FROM (SELECT DISTINCT src FROM eg)),
       |$lpRounds
       |SELECT community_id, rep_vec_id, rep_pr_micro, n_members FROM (
       |  SELECT l.label AS community_id, l.vec_id AS rep_vec_id,
       |    p.pr_micro AS rep_pr_micro,
       |    count(*) OVER (PARTITION BY l.label) AS n_members,
       |    row_number() OVER (PARTITION BY l.label
       |      ORDER BY p.pr_micro DESC, l.vec_id) AS r
       |  FROM l$LpIters l JOIN pr$PrIters p ON p.vec_id = l.vec_id)
       |WHERE r = 1""".stripMargin
  }

  // ----------------------------------------------------- ann_graph_search

  /** Graph-search entry points (fixed, deterministic: the [[SearchSeeds]]
    * smallest non-query vec_ids). Production NSW/HNSW picks arbitrary or
    * hierarchical entry points; what matters is the walk, not the door.
    */
  val SearchSeeds = 4

  /** Beam width (candidates kept per query per hop) and hop count. Small
    * on the fixture; production tunes B up for recall (the ef-search
    * dial) and H to the graph diameter (~log N for NSW-like graphs).
    */
  val BeamWidth = 8
  val BeamHops = 2

  /** Graph-based ANN: BEAM SEARCH over the [[knnGraph]] adjacency — the
    * NSW/HNSW-family search loop (Malkov & Yashunin 2016), the production
    * ANN default beside the IVF family. From fixed entry points, each hop
    * expands the current beam through the graph's out-edges, scores every
    * candidate by exact cosine against the query, and keeps the best
    * [[BeamWidth]] per query; after [[BeamHops]] hops the top-k of the
    * final beam is the answer. Recall comes from the graph's navigability
    * rather than from partition coverage — the reason graph indexes beat
    * IVF at high recall on big corpora.
    *
    * Batch-parallel shape (this is the ONE ANN family whose classic form
    * is a sequential per-query walk; the Spark rendition walks ALL
    * queries in lock-step): each hop is
    * frontier(|Q|·B rows) ⋈ edges(k·N) on the candidate id, a DISTINCT
    * on (query, candidate), a scoring join against the vector table, and
    * a per-query WindowGroupLimit top-B — every step bounded, no
    * per-query driver loop, hop count FIXED (the unrolled-loop
    * discipline of [[PretrainOps]]'s BPE oracle). The frontier never
    * exceeds |Q|·B·(k+1) rows, so a million queries ride the same plan.
    * Dedup-before-rank is load-bearing: a candidate reached twice would
    * occupy two beam slots and the engines would disagree on which dup
    * ranks first.
    *
    * Determinism: ranking orders by (cos DESC, cand_id) — total order,
    * NULL cosines (zero-norm vectors) last in both engines. Output is
    * (query_id, neighbor_id, rank, cos_sim), rank ≤ k.
    */
  def annGraphSearch(emb: DataFrame, k: Int = KnnGraphK,
      hops: Int = BeamHops, beam: Int = BeamWidth,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame = {
    val edges = DedupOps.materialize(
      knnGraph(emb, centroids = centroids).select(col("vec_id").as("src"),
        col("neighbor_id").as("dst")),
      "graph_search_edges")
    graphBeamSearch(emb, edges, k, hops, beam)
  }

  /** [[annGraphSearch]] over an explicit (already materialized) edge
    * list — the [[communityRepresentativesOn]] discipline applied to the
    * beam search: a deployment serves every graph face (search, PR, LP,
    * representatives) from ONE persisted [[knnEdges]] artifact instead
    * of rebuilding the graph per consumer. Identical output to
    * [[annGraphSearch]] when handed `knnEdges(emb)` — same build, same
    * projection (round 14: the registered key joins the shared-cache
    * ledger this way; the DuckDB twin re-derives the graph from
    * scratch, so hash parity proves the sharing is semantics-free).
    */
  def annGraphSearchOn(emb: DataFrame, edges: DataFrame,
      k: Int = KnnGraphK, hops: Int = BeamHops,
      beam: Int = BeamWidth): DataFrame =
    graphBeamSearch(emb, edges, k, hops, beam)

  /** [[annGraphSearch]] with HIERARCHICAL entry points — the HNSW
    * upper-layer idea in its one-level form: instead of arbitrary fixed
    * seeds, the walk enters at each cluster's best PROTOTYPE (the
    * [[clusterSample]] n=1 representative — the vector most central to
    * its coarse cell), so hop 0 already spans the whole space and the
    * beam's first prune lands the walk in the query's own region. At
    * production K the prototype table is still tiny (K rows); for K in
    * the millions, recurse — prototypes of prototype-clusters — which is
    * exactly HNSW's layer stack: [[annGraphSearchHier2]] is that
    * two-level form.
    */
  def annGraphSearchHier(emb: DataFrame, k: Int = KnnGraphK,
      hops: Int = BeamHops, beam: Int = BeamWidth,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame = {
    val edges = DedupOps.materialize(
      knnGraph(emb, centroids = centroids).select(col("vec_id").as("src"),
        col("neighbor_id").as("dst")),
      "graph_search_edges")
    graphBeamSearch(emb, edges, k, hops, beam,
      Some(clusterSampleWith(emb, 1, centroids)
        .select(col("vec_id").as("cand_id"))))
  }

  /** Super-cell count for [[annGraphSearchHier2]]'s level-2 entry layer. */
  val HierSuperK = 4

  /** The TWO-LEVEL entry hierarchy [[annGraphSearchHier]]'s doc promises
    * — HNSW's layer stack in its first recursion: the K level-1
    * prototypes (one per coarse cell) are themselves clustered into
    * [[HierSuperK]] super-cells, and hop 0 enters at each super-cell's
    * most prototypical member only. The walk then spends ONE hop on the
    * PROTOTYPE graph (k-NN among the K prototypes, blocked by
    * super-cell — every prototype is one hop from its super-cell's
    * entry) to land on the query's region's prototype, and the
    * remaining `hops` on the base graph, same beam discipline
    * throughout.
    *
    * Why this matters at scale: with K cells (millions at 100 TB /
    * granularity-∝-N), the one-level hier scores |Q|·K entry candidates
    * at hop 0 — itself a brute-force pass. Two levels score
    * |Q|·superK, then |Q|·beam·k — entry cost drops from O(K) to
    * O(√K-ish) per query, and recursing again is the same move (each
    * added layer divides the exponent, which is exactly HNSW's log
    * structure). Recall is preserved because one-hop coverage is TOTAL
    * by construction: the prototype k-NN graph alone covers a
    * super-cell only while its members ≤ KnnGraphK out-edges, so the
    * prototype edge list additionally connects each super-cell's entry
    * to EVERY member of its cell — K extra rows, and exactly the
    * explicit entry→layer-member links HNSW maintains per upper-layer
    * node (spec-pinned ≥ one-level at equal beam on the clustered
    * fixture).
    */
  def annGraphSearchHier2(emb: DataFrame, k: Int = KnnGraphK,
      hops: Int = BeamHops, beam: Int = BeamWidth,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids,
      superK: Int = HierSuperK): DataFrame = {
    val baseEdges = DedupOps.materialize(
      knnGraph(emb, centroids = centroids).select(col("vec_id").as("src"),
        col("neighbor_id").as("dst")),
      "graph_search_edges")
    val protoIds = clusterSampleWith(emb, 1, centroids).select("vec_id")
    val protoVecs = DedupOps.materialize(
      emb.join(protoIds, "vec_id"), "hier2_protos")
    val superCents = autoCentroidSet(superK)
    val entries = clusterSampleWith(protoVecs, 1, superCents)
      .select(col("centroid"), col("vec_id"))
    val superSeeds = entries.select(col("vec_id").as("cand_id"))
    // entry→member edges: every prototype one hop from its super-cell's
    // entry REGARDLESS of cell size (the k-NN graph caps out-degree at
    // KnnGraphK, so a super-cell with more members than that would
    // otherwise leave some prototypes unreachable in the single
    // prototype hop — the millions-of-cells regime this operator is for)
    val protoCells = clusterSampleWith(protoVecs, Int.MaxValue, superCents)
      .select(col("centroid"), col("vec_id"))
    val coverage = protoCells
      .join(entries.select(col("centroid"), col("vec_id").as("entry_id")),
        Seq("centroid"))
      .filter(col("vec_id") =!= col("entry_id"))
      .select(col("entry_id").as("src"), col("vec_id").as("dst"))
    val protoEdges = DedupOps.materialize(
      knnGraph(protoVecs, centroids = superCents)
        .select(col("vec_id").as("src"), col("neighbor_id").as("dst"))
        .union(coverage).distinct(),
      "hier2_proto_edges")
    graphBeamSearch(emb, baseEdges, k, hops + 1, beam,
      Some(superSeeds),
      Some(protoEdges +: Seq.fill(hops)(baseEdges)))
  }

  /** The search loop over an ALREADY-BUILT edge list — shared by the
    * in-memory face and the indexed face, so the two cannot diverge.
    */
  /** @param hopEdgesOpt per-hop edge lists (length = number of hops) —
    *        the two-level entry hierarchy walks its FIRST hop on the
    *        prototype graph and the rest on the base graph; None = every
    *        hop on `edges` (the one-level faces).
    */
  private def graphBeamSearch(emb: DataFrame, edges: DataFrame, k: Int,
      hops: Int, beam: Int,
      seedsOpt: Option[DataFrame] = None,
      hopEdgesOpt: Option[Seq[DataFrame]] = None): DataFrame = {
    require(hops >= 1, s"annGraphSearch: hops must be >= 1, got $hops")
    require(beam >= k, s"annGraphSearch: beam $beam must cover k=$k")
    val perHop = hopEdgesOpt.getOrElse(Seq.fill(hops)(edges))
    require(perHop.length == hops,
      s"annGraphSearch: ${perHop.length} hop edge lists for $hops hops")
    val e = DedupOps.materialize(
      withNorm(emb).select(col("vec_id"), col("emb_d"), col("norm")),
      "graph_search_vectors")
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"),
        col("emb_d").as("eq"), col("norm").as("nq"))
    val seeds = seedsOpt.getOrElse(
      e.filter(col("vec_id") >= NQueries)
        .orderBy(col("vec_id")).limit(SearchSeeds)
        .select(col("vec_id").as("cand_id")))
    def score(frontier: DataFrame): DataFrame =
      frontier.join(e, frontier("cand_id") === e("vec_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("cand_id"),
          cosine(col("eq"), col("nq"), col("emb_d"), col("norm"))
            .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    var beam0 = q.select(col("query_id")).crossJoin(broadcast(seeds))
    for (h <- 0 until hops) {
      val eh = perHop(h)
      val expanded = beam0.select(col("query_id"), col("cand_id"))
        .union(beam0.join(eh, beam0("cand_id") === eh("src"))
          .select(col("query_id"), col("dst").as("cand_id")))
        .filter(col("cand_id") =!= col("query_id"))
        .distinct()
      beam0 = score(expanded)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= beam)
        .select(col("query_id"), col("cand_id"), col("cos_sim"))
    }
    beam0
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id").as("neighbor_id"),
        col("rank"), col("cos_sim"))
  }

  /** [[annGraphSearch]] over the granularity-∝-N graph — the PRODUCTION
    * default, exactly [[knnGraphAuto]]'s rule: the underlying edge build
    * derives its centroid count from the corpus so the graph
    * construction never hits the fixed-granularity quadratic trap; the
    * search loop is unchanged (its cost is |Q|·beam·hops, independent of
    * N once the graph exists).
    */
  def annGraphSearchAuto(emb: DataFrame, k: Int = KnnGraphK,
      hops: Int = BeamHops, beam: Int = BeamWidth,
      targetClusterSize: Int = KnnTargetClusterSize): DataFrame =
    annGraphSearch(emb, k, hops, beam,
      autoCentroidSet(knnAutoCentroidCount(emb.count(), targetClusterSize)))

  /** Persist the k-NN graph as an INDEX artifact — the production split:
    * the edge build (the expensive, corpus-sized pass) runs once and
    * writes parquet; every later search amortizes it. Mirrors
    * [[writeIvfIndex]]. Cold-composed vs indexed is measured in
    * SCALING.md (the composed cold path at x32 pays the whole graph
    * build + a cache stampede inside one job; the indexed search reads
    * a 2-column edge list).
    */
  def writeKnnGraphIndex(emb: DataFrame, dir: String, k: Int = KnnGraphK,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): Unit =
    knnGraph(emb, k, centroids)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)

  /** Beam search over a persisted [[writeKnnGraphIndex]] graph. Results
    * are identical to [[annGraphSearch]] over the same vectors+centroids
    * — both run [[graphBeamSearch]]; parquet round-trips the edge ids
    * exactly.
    */
  def annGraphSearchIndexed(spark: SparkSession, indexDir: String,
      emb: DataFrame, k: Int = KnnGraphK, hops: Int = BeamHops,
      beam: Int = BeamWidth): DataFrame =
    graphBeamSearch(emb,
      spark.read.parquet(indexDir)
        .select(col("vec_id").as("src"), col("neighbor_id").as("dst")),
      k, hops, beam)

  /** DuckDB twin: the e/graph CTEs are [[sqlKnnGraph]]'s verbatim; the
    * two hops unroll as expand→distinct→score→beam CTE pairs.
    */
  def sqlAnnGraphSearch: String = {
    val qcos = sqlCosine("q.eq", "q.nq", "e.emb_d", "e.norm")
    def hop(prev: String, x: String, f: String): String =
      s"""$x AS (
         |  SELECT DISTINCT query_id, cand_id FROM (
         |    SELECT query_id, cand_id FROM $prev
         |    UNION ALL
         |    SELECT p.query_id, g.dst AS cand_id
         |    FROM $prev p JOIN g ON g.src = p.cand_id)
         |  WHERE cand_id <> query_id),
         |$f AS (
         |  SELECT query_id, cand_id, cos_sim FROM (
         |    SELECT x.query_id, x.cand_id, $qcos AS cos_sim,
         |      CAST(row_number() OVER (PARTITION BY x.query_id
         |        ORDER BY $qcos DESC, x.cand_id) AS BIGINT) AS rk
         |    FROM $x x JOIN q ON q.query_id = x.query_id
         |    JOIN e ON e.vec_id = x.cand_id)
         |  WHERE rk <= $BeamWidth)""".stripMargin
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, emb_d, norm,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS cluster_id
       |  FROM (SELECT *, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")}))),
       |g AS MATERIALIZED (
       |  SELECT vec_id AS src, neighbor_id AS dst FROM (
       |    SELECT a.vec_id, b.vec_id AS neighbor_id,
       |      CAST(row_number() OVER (PARTITION BY a.vec_id
       |        ORDER BY ${sqlCosine("a.emb_d", "a.norm", "b.emb_d", "b.norm")} DESC,
       |          b.vec_id) AS BIGINT) AS rank
       |    FROM e a JOIN e b
       |      ON a.cluster_id = b.cluster_id AND a.vec_id <> b.vec_id)
       |  WHERE rank <= $KnnGraphK),
       |q AS (SELECT vec_id AS query_id, emb_d AS eq, norm AS nq
       |      FROM e WHERE vec_id < $NQueries),
       |seeds AS (SELECT vec_id AS cand_id FROM e WHERE vec_id >= $NQueries
       |          ORDER BY vec_id LIMIT $SearchSeeds),
       |f0 AS (SELECT query_id, cand_id FROM q CROSS JOIN seeds),
       |${hop("f0", "x1", "f1")},
       |${hop("f1", "x2", "f2")}
       |SELECT query_id, cand_id AS neighbor_id,
       |  CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rank,
       |  cos_sim
       |FROM f2
       |QUALIFY rank <= $KnnGraphK""".stripMargin
  }

  // ------------------------------------------------------- ann_ivf_probe

  /** IVF parameters: K coarse centroids, nProbe probed lists per query.
    * Centroids here are fixed deterministic literals (shared with the
    * oracle); at scale they come from a prior k-means pass over a sample —
    * the operator shape (assign → invert → probe) is identical.
    */
  val IvfCentroids = 8
  val IvfProbes = 2
  def centroid(j: Int): IndexedSeq[Double] =
    (0 until Dim).map(d => (((j * Dim + d + 1) * 48271L) % 199L - 99L) / 100.0)

  /** Default (deterministic, oracle-shared) coarse centroid set. */
  def defaultCentroids: IndexedSeq[IndexedSeq[Double]] =
    (0 until IvfCentroids).map(centroid)

  private def centDotsOf(cents: Seq[IndexedSeq[Double]], embD: Column): Column =
    array(cents.map(c => dot(array(c.map(lit): _*), embD)): _*)

  private[ops] def centDots(embD: Column): Column =
    centDotsOf(defaultCentroids, embD)

  private def sqlCentroidLit(j: Int): String =
    centroid(j).map(_.toString).mkString("([", ", ", "]::DOUBLE[])")

  private[ops] def sqlCentDots(embD: String): String =
    (0 until IvfCentroids).map(j => sqlDot(sqlCentroidLit(j), embD))
      .mkString("[", ", ", "]")

  /** IVF-bucketed ANN: every vector is assigned to its max-dot coarse
    * centroid (the inverted list id — a narrow map, no shuffle); each
    * query probes its [[IvfProbes]] best lists and ranks candidates by
    * exact cosine. The probe join is an equi-join on the list id
    * (candidates shuffle once by list), touching ~nProbe/K of the corpus
    * — the IVF recall/cost trade at 100 TB.
    *
    * `centroids` defaults to the fixed oracle-shared set; pass
    * [[ivfTrain]]'s output to search against a LEARNED quantizer (the
    * trained centroids are unit-norm, so max-dot ≡ max-cosine assignment).
    */
  /** Centroid assignment shared by the probe search and the index
    * build: unit-norm vectors plus their per-centroid dots and argmax
    * list id — a narrow map, centroids ride as plan literals.
    */
  private def assigned(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]]): DataFrame =
    withNorm(emb)
      .withColumn("dots", centDotsOf(centroids, col("emb_d")))
      .withColumn("centroid", array_position(col("dots"), array_max(col("dots"))) - 1)

  /** The fixed query side: each query's best + second-best list, one
    * probe row per list.
    */
  private def probeQueries(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < NQueries)
      .withColumn("second",
        array_position(col("dots"),
          array_max(array_remove(col("dots"), array_max(col("dots"))))) - 1)
      .select(col("vec_id").as("query_id"), col("emb_d").as("eq"), col("norm").as("nq"),
        explode(array(col("centroid"), col("second"))).as("probe"))

  /** Probe-join + exact-cosine rerank over any inverted-list frame
    * carrying (vec_id, emb_d, norm, centroid) — shared by the in-memory
    * and the disk-indexed search so the two can never diverge.
    */
  private def rankProbed(lists: DataFrame, q: DataFrame): DataFrame = {
    val scored = lists.join(broadcast(q),
        col("centroid") === col("probe") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("centroid").cast("long").as("centroid"),
        cosine(col("eq"), col("nq"), col("emb_d"), col("norm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "centroid", "rank", "cos_sim")
  }

  def annIvfProbe(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame = {
    val e = assigned(emb, centroids)
    rankProbed(e, probeQueries(e))
  }

  /** Persist the IVF inverted lists as a parquet dataset PARTITIONED BY
    * list id — the serving layout the probe trade needs at 100 TB: a
    * query touching nProbe of K lists should READ nProbe/K of the index,
    * and with `centroid` as a physical partition column that selection
    * happens at the file index (directories never opened), not as a
    * filter over a full scan. Pay one assignment pass at index-build
    * time; every subsequent probe query prunes.
    */
  /** The index row shape [[writeIvfIndex]] persists — public so the
    * streaming appender ([[graft.stream.IndexStream]]) writes the SAME
    * rows through the exactly-once file sink.
    */
  def ivfIndexRows(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame =
    assigned(emb, centroids)
      .select(col("vec_id"), col("emb_d"), col("norm"), col("centroid"))

  def writeIvfIndex(emb: DataFrame, dir: String,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): Unit =
    ivfIndexRows(emb, centroids)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("centroid").parquet(dir)

  /** Search a persisted [[writeIvfIndex]] index. The probe join is on
    * the PARTITION column, so Spark's dynamic partition pruning turns
    * the broadcast query side into a partition filter: only the probed
    * list directories are read (spec-asserted via the scan's
    * `dynamicpruning` partition filter). Results are identical to the
    * in-memory [[annIvfProbe]] over the same vectors+centroids — both
    * run [[rankProbed]]; parquet round-trips doubles exactly.
    */
  def annIvfProbeIndexed(spark: SparkSession, indexDir: String,
      queries: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids): DataFrame =
    rankProbed(spark.read.parquet(indexDir),
      probeQueries(assigned(queries, centroids)))

  /** One Lloyd iteration of the IVF coarse quantizer: assign every vector
    * to its max-dot centroid, then emit the new centroid means per
    * dimension (+ cluster sizes). This is the training step that produces
    * the [[annIvfProbe]] centroids at scale: assignment is a narrow map,
    * the update is one (centroid, dim)-keyed agg with map-side partial
    * means — iterate by feeding the output back as the next centroid set.
    */
  def ivfTrainStep(emb: DataFrame): DataFrame = {
    val e = withNorm(emb)
      .withColumn("dots", centDots(col("emb_d")))
      .withColumn("centroid", array_position(col("dots"), array_max(col("dots"))) - 1)
    e.select(col("centroid"), posexplode(col("emb_d")))
      .toDF("centroid", "dim_idx", "v")
      .groupBy("centroid", "dim_idx")
      .agg(avg(col("v")).as("mean_val"), count(lit(1)).as("n_vecs"))
      .select(col("centroid"), col("dim_idx").cast("long").as("dim_idx"),
        col("mean_val"), col("n_vecs"))
  }

  /** Iterative IVF training driver: spherical k-means to convergence,
    * feeding the renormalized means back as the next centroid set — the
    * pass that produces [[annIvfProbe]]'s coarse quantizer at scale.
    *
    * Per iteration: unit-normalized vectors are assigned to their
    * max-cosine centroid (a narrow map — centroids ride along as plan
    * literals), then ONE (centroid, dim)-keyed map-side-combined agg
    * yields the new per-dimension sums, cluster sizes, and the objective;
    * only the k×Dim centroid matrix (a few KB) ever reaches the driver —
    * the legitimate k-means driver loop, not a collect() anti-pattern.
    * Empty clusters keep their previous centroid.
    *
    * Spherical k-means ascends the mean-cosine objective monotonically
    * (assignment maximizes each row's cosine; the normalized mean
    * maximizes within-cluster cosine sum), so `objectives` is
    * non-decreasing; the loop stops at `maxIter` or when the improvement
    * drops below `tol`.
    *
    * @return (final unit-norm centroids, per-iteration mean-cosine objective)
    */
  /** Deterministic FARTHEST-POINT (k-center greedy) seeding for
    * [[ivfTrain]] — the derandomized k-means++ (k-means++ samples
    * proportional to distance; greedy k-center takes the argmax, which
    * needs no RNG and is reproducible across runs): start from the
    * smallest vec_id's unit vector, then repeatedly add the vector
    * FARTHEST (min max-cosine) from the chosen set, ties by vec_id.
    * Each step is one TakeOrderedAndProject over the unit table — k−1
    * bounded jobs, driver receives k vectors (the driver-decides
    * pattern). Spread-out seeds stop Lloyd from collapsing onto a
    * CLUSTERED corpus's dense core — the regime where init choice
    * matters. Measured honestly on the near-uniform synthetic fixture
    * ([[knnRecallWith]]): 0.375/0.525 vs the ladder init's 0.40/0.625 —
    * uniform data has no dense core to escape, and greedy k-center's
    * known weakness (seeds attracted to extremes) shows instead; on
    * real clustered embeddings the ranking flips, which is why the init
    * is an OPTION, not the default.
    */
  def farthestPointInit(emb: DataFrame,
      k: Int = IvfCentroids): IndexedSeq[IndexedSeq[Double]] = {
    val e = withNorm(emb).filter(col("norm") > 0)
      .withColumn("unit", transform(col("emb_d"), _ / col("norm")))
      .select(col("vec_id"), col("unit")).cache()
    try {
      // loud on degenerate input: the ladder init survives an empty or
      // all-zero corpus, so opting INTO this init must not turn that
      // into a bare ArrayIndexOutOfBounds; and fewer DISTINCT unit
      // vectors than k would silently return duplicate centroids, so the
      // guard counts distinct units, not rows — a corpus of n ≥ k rows
      // duplicating < k embeddings must fail just as loudly
      val n = e.select("unit").distinct().count()
      require(n >= k,
        s"farthestPointInit: $n distinct nonzero-norm unit vectors < k=$k — " +
          "use the default ladder init for degenerate corpora")
      def unitOf(df: DataFrame): IndexedSeq[Double] =
        df.select("unit").collect()(0).getSeq[Double](0).toIndexedSeq
      var cents = IndexedSeq(unitOf(e.orderBy("vec_id").limit(1)))
      while (cents.size < k) {
        val dots = array(cents.map(c =>
          dot(array(c.map(lit): _*), col("unit"))): _*)
        cents = cents :+ unitOf(
          e.withColumn("mx", array_max(dots))
            .orderBy(col("mx").asc, col("vec_id").asc).limit(1))
      }
      cents
    } finally { e.unpersist(); () }
  }

  def ivfTrain(emb: DataFrame, k: Int = IvfCentroids, maxIter: Int = 5,
      tol: Double = 1e-9,
      init: Seq[IndexedSeq[Double]] = Seq.empty)
      : (IndexedSeq[IndexedSeq[Double]], Seq[Double]) = {
    def normalize(v: IndexedSeq[Double]): IndexedSeq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    require(init.isEmpty || init.size == k,
      s"ivfTrain: init has ${init.size} centroids, k=$k")
    val e = withNorm(emb)
      .filter(col("norm") > 0)
      .withColumn("unit", transform(col("emb_d"), _ / col("norm")))
      .select("unit")
      .cache()
    try {
      var cents: IndexedSeq[IndexedSeq[Double]] =
        if (init.nonEmpty) init.map(normalize).toIndexedSeq
        else (0 until k).map(j => normalize(centroid(j)))
      val objectives = scala.collection.mutable.ArrayBuffer.empty[Double]
      var iter = 0
      var improving = true
      while (iter < maxIter && improving) {
        val dots = array(cents.map(c =>
          dot(array(c.map(lit): _*), col("unit"))): _*)
        val assigned = e
          .withColumn("dots", dots)
          .withColumn("centroid", array_position(col("dots"), array_max(col("dots"))) - 1)
          .withColumn("best", array_max(col("dots")))
        val stats = assigned
          .select(col("centroid"), col("best"), posexplode(col("unit")))
          .toDF("centroid", "best", "dim_idx", "v")
          .withColumn("dim_idx", col("dim_idx").cast("long"))
          .groupBy("centroid", "dim_idx")
          .agg(sum(col("v")).as("s"), count(lit(1)).as("n"),
            // each ROW's cosine counted once, not once per dimension
            sum(when(col("dim_idx") === 0, col("best"))).as("obj"))
          .collect()
        val n = stats.filter(_.getAs[Long]("dim_idx") == 0L)
          .map(_.getAs[Long]("n")).sum
        if (n == 0)
          // empty input (or all zero-norm): nothing to train on — return
          // the seed centroids with an empty objective history rather
          // than a NaN objective and a silent one-iteration exit
          return (cents, objectives.toSeq)
        val obj = stats.flatMap(r => Option(r.getAs[java.lang.Double]("obj")))
          .map(_.doubleValue).sum / n
        val sums = stats.groupBy(_.getAs[Long]("centroid")).map { case (c, rs) =>
          c.toInt -> rs.sortBy(_.getAs[Long]("dim_idx"))
            .map(_.getAs[Double]("s")).toIndexedSeq
        }
        cents = (0 until k).map(j => sums.get(j).map(normalize).getOrElse(cents(j)))
        // (Option.forall on None is true, so the first iteration always
        // continues)
        improving = objectives.lastOption.forall(prev => obj - prev > tol)
        objectives += obj
        iter += 1
      }
      (cents, objectives.toSeq)
    } finally { e.unpersist(); () }
  }

  /** Recall@[[TopK]] of the approximate ANN paths against the exact
    * brute-force baseline, per query — the measurement that makes the
    * LSH/IVF recall/cost trade a NUMBER instead of a hope. Output one row
    * per (method, query): |approx ∩ exact| / K.
    *
    * Scale shape: the expensive inputs are the three ANN queries
    * themselves (each already scale-shaped); the recall join runs on
    * their outputs — |Q|·K rows per side, driver-trivial but computed
    * distributed like everything else. In production this runs on a
    * SAMPLE of queries as the recall monitor for tuning H / nProbe.
    */
  def annRecall(emb: DataFrame): DataFrame = {
    val bf = annTopkBruteForce(emb).select("query_id", "neighbor_id")
    def recallOf(name: String, approx: DataFrame): DataFrame =
      bf.join(
          approx.select(col("query_id"), col("neighbor_id"))
            .withColumn("hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") /
          count(lit(1))).as("recall"))
        .withColumn("method", lit(name))
    recallOf("lsh_bucket", annLshBucket(emb))
      .unionByName(recallOf("ivf_probe", annIvfProbe(emb)))
      // the PQ leg measures BOTH losses at once: the IVF probe's list
      // truncation and the ADC quantization error on top of it — the
      // number that says whether the 32× index compression is safe
      .unionByName(recallOf("ivfpq_probe", annIvfPqProbe(emb)))
      // the PCA leg measures the DIMENSION-reduction loss: how much of
      // the exact top-K survives a coarse pass in the projected space
      .unionByName(recallOf("pca_refine", annPcaRefine(emb)))
      .select("method", "query_id", "recall")
  }

  def sqlAnnRecall: String =
    s"""WITH bf AS (SELECT query_id, neighbor_id FROM (
       |${sqlAnnTopkBruteForce}
       |) t),
       |lsh AS (SELECT query_id, neighbor_id FROM (
       |${sqlAnnLshBucket}
       |) t),
       |ivf AS (SELECT query_id, neighbor_id FROM (
       |${sqlAnnIvfProbe}
       |) t),
       |ivfpq AS (SELECT query_id, neighbor_id FROM (
       |${sqlAnnIvfPqProbe}
       |) t),
       |pca AS (SELECT query_id, neighbor_id FROM (
       |${sqlAnnPcaRefine}
       |) t)
       |SELECT 'lsh_bucket' AS method, bf.query_id,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
       |FROM bf LEFT JOIN lsh a
       |  ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
       |GROUP BY bf.query_id
       |UNION ALL
       |SELECT 'ivf_probe' AS method, bf.query_id,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
       |FROM bf LEFT JOIN ivf a
       |  ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
       |GROUP BY bf.query_id
       |UNION ALL
       |SELECT 'ivfpq_probe' AS method, bf.query_id,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
       |FROM bf LEFT JOIN ivfpq a
       |  ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
       |GROUP BY bf.query_id
       |UNION ALL
       |SELECT 'pca_refine' AS method, bf.query_id,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS recall
       |FROM bf LEFT JOIN pca a
       |  ON bf.query_id = a.query_id AND bf.neighbor_id = a.neighbor_id
       |GROUP BY bf.query_id""".stripMargin

  def sqlIvfTrainStep: String =
    s"""WITH e AS (
       |  SELECT vec_id, emb_d,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS centroid
       |  FROM (SELECT vec_id, emb_d, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")})))
       |SELECT centroid, CAST(i - 1 AS BIGINT) AS dim_idx,
       |  avg(emb_d[i]) AS mean_val, count(*) AS n_vecs
       |FROM e CROSS JOIN (SELECT unnest(range(1, $Dim + 1)) AS i) r
       |GROUP BY 1, 2""".stripMargin

  def sqlAnnIvfProbe: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, emb_d, norm, dots,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS centroid
       |  FROM (SELECT *, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")}))),
       |q AS (
       |  SELECT vec_id AS query_id, emb_d, norm, unnest([centroid,
       |    CAST(list_position(dots, list_max(list_filter(dots, x -> x <> list_max(dots)))) - 1 AS BIGINT)]) AS probe
       |  FROM e WHERE vec_id < $NQueries)
       |SELECT query_id, neighbor_id, centroid, rank, cos_sim FROM (
       |  SELECT q.query_id, e.vec_id AS neighbor_id, e.centroid,
       |    ${sqlCosine("q.emb_d", "q.norm", "e.emb_d", "e.norm")} AS cos_sim,
       |    CAST(row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY ${sqlCosine("q.emb_d", "q.norm", "e.emb_d", "e.norm")} DESC, e.vec_id) AS BIGINT) AS rank
       |  FROM e JOIN q ON e.centroid = q.probe AND e.vec_id <> q.query_id)
       |WHERE rank <= $TopK""".stripMargin

  def sqlAnnLshBucket: String =
    s"""WITH e AS (
       |  SELECT vec_id, label, emb_d, norm, ${sqlLshBucket("emb_d")} AS bucket
       |  FROM (${sqlWithNorm("embeddings")}))
       |SELECT query_id, neighbor_id, bucket, rank, cos_sim FROM (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, e.bucket,
       |    ${sqlCosine("q.emb_d", "q.norm", "e.emb_d", "e.norm")} AS cos_sim,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${sqlCosine("q.emb_d", "q.norm", "e.emb_d", "e.norm")} DESC, e.vec_id) AS BIGINT) AS rank
       |  FROM e q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NQueries)
       |WHERE rank <= $TopK""".stripMargin

  // --------------------------------------------------- product quantization

  /** PQ parameters: the [[Dim]]-dim space splits into [[PqSubspaces]]
    * contiguous subspaces of [[PqSubDim]] dims, each with its own
    * [[PqCodes]]-entry codebook. A vector compresses to M small codes
    * (8 codes of 4 bits here vs 256 bytes of raw floats) and search scores
    * candidates by per-subspace table LOOKUP (asymmetric distance
    * computation) instead of a Dim-wide dot — the design of Jégou, Douze
    * & Schmid 2011, "Product Quantization for Nearest Neighbor Search",
    * and of FAISS's IndexIVFPQ.
    *
    * Codebooks here are fixed deterministic literals shared with the
    * oracle (the [[centroid]] discipline); at scale they come from
    * per-subspace k-means over a sample — [[pqTrainStep]] is that step,
    * and no operator shape changes when the literals are replaced by
    * trained values.
    */
  val PqSubspaces = 8
  val PqSubDim: Int = Dim / PqSubspaces
  val PqCodes = 16

  def pqCentroid(m: Int, j: Int): IndexedSeq[Double] =
    (0 until PqSubDim).map(d =>
      ((((m * PqCodes + j) * PqSubDim + d + 1) * 2654435761L) % 2001L - 1000L) / 1000.0)

  /** Codebook flattened `[(m·PqCodes + j)·PqSubDim + d]` — the layout
    * [[org.apache.spark.sql.graftext.HashKernels.pqDistTables]] reads.
    */
  lazy val defaultPqCodebook: Array[Double] =
    (0 until PqSubspaces).flatMap(m =>
      (0 until PqCodes).flatMap(j => pqCentroid(m, j))).toArray

  /** All M distance tables as one array-of-arrays column — a single
    * codegen'd kernel call ([[org.apache.spark.sql.graftext.PqDistTables]])
    * with the codebook as a reference object. The declarative expansion
    * (M·K·subDim literal subtract-square terms) was measured 2-6× slower:
    * large enough to drop the projection out of whole-stage codegen into
    * per-node interpreted eval, and the argmin pattern re-evaluated it
    * per reference. Evaluate this once per row (own projection) and
    * derive codes via [[pqCodesOf]]. Sum order inside the kernel is
    * ascending-dim left-assoc — bit-identical to the SQL twin.
    */
  private def pqDistsTab(embD: Column,
      cb: Array[Double] = defaultPqCodebook): Column =
    org.apache.spark.sql.graftext.ArrayFunctions.pq_dist_tables(
      embD, PqSubspaces, PqCodes, PqSubDim, cb)

  /** argmin codes from a precomputed distance-table column — first
    * minimum wins ties in both engines (array_position/list_position
    * return the first match). The lambda binds each subspace's table
    * once, so the argmin scan costs M·K compares, not M·K distance
    * recomputations.
    */
  private def pqCodesOf(dtab: Column): Column =
    transform(dtab, d => array_position(d, array_min(d)) - 1)

  private def sqlPqDists(m: Int, embD: String): String =
    (0 until PqCodes).map { j =>
      pqCentroid(m, j).zipWithIndex.map { case (c, d) =>
        val e = s"($embD[${m * PqSubDim + d + 1}] - $c)"
        s"$e * $e"
      }.mkString("(", " + ", ")")
    }.mkString("[", ", ", "]")

  /** PQ code table: one single-pass narrow encode compressing every vector
    * to its M subspace codes — the code side of an IVFADC index, 32×
    * smaller than the raw vectors it stands in for. Output exploded
    * (vec_id, subspace, code) for the oracle.
    */
  def pqEncode(emb: DataFrame): DataFrame =
    withNorm(emb)
      .select(col("vec_id"), pqDistsTab(col("emb_d")).as("dtab"))
      .select(col("vec_id"), posexplode(pqCodesOf(col("dtab"))))
      .toDF("vec_id", "subspace", "code")
      .select(col("vec_id"), col("subspace").cast("long").as("subspace"),
        col("code"))

  def sqlPqEncode: String = {
    val dists = (0 until PqSubspaces)
      .map(m => s"${sqlPqDists(m, "emb_d")} AS d$m").mkString(",\n    ")
    val codes = (0 until PqSubspaces)
      .map(m => s"CAST(list_position(d$m, list_min(d$m)) - 1 AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""SELECT vec_id, CAST(s.i AS BIGINT) AS subspace, codes[s.i + 1] AS code
       |FROM (
       |  SELECT vec_id, $codes AS codes
       |  FROM (SELECT vec_id, $dists
       |        FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb_d
       |              FROM embeddings))),
       |  (SELECT unnest(range($PqSubspaces)) AS i) s""".stripMargin
  }

  /** IVF+PQ (IVFADC) probe search: candidates live in their IVF list and
    * carry only their M PQ codes; each query precomputes per-subspace
    * distance tables to every codebook entry (M×K doubles, in-row BEFORE
    * the join), probes its nProbe lists through the same centroid
    * equi-join as [[annIvfProbe]], and scores each candidate as M table
    * lookups. Two compounding scale wins over the exact probe: the
    * candidate side shuffles/stores codes (8 longs) instead of 64-double
    * vectors, and per-pair scoring drops from O(Dim) mults to O(M)
    * lookups — the trade that makes billion-vector ANN affordable.
    * Ranking is by approximate distance; the standard refine step (exact
    * rerank of the few survivors) is [[annTopkBruteForce]]'s shape over
    * TopK rows and is omitted here to keep the approximation observable.
    */
  /** The PQ-coded candidate rows of an assigned frame: (vec_id, centroid,
    * codes) — 8 longs standing in for 64 doubles.
    */
  private def pqCands(a: DataFrame, cb: Array[Double]): DataFrame =
    a.select(col("vec_id"), col("centroid"),
        pqDistsTab(col("emb_d"), cb).as("dtab"))
      .select(col("vec_id"), col("centroid"), pqCodesOf(col("dtab")).as("codes"))

  /** The fixed query side with per-subspace ADC tables + probe lists.
    * The qtab is computed BEFORE the probe explode: after it, the
    * kernel would run (and the 128-double table would broadcast) once
    * per probe row instead of once per query — 2× here, linear in
    * nProbe at realistic probe counts.
    */
  private def pqProbeQueries(a: DataFrame, cb: Array[Double]): DataFrame =
    a.filter(col("vec_id") < NQueries)
      .withColumn("second",
        array_position(col("dots"),
          array_max(array_remove(col("dots"), array_max(col("dots"))))) - 1)
      .select(col("vec_id").as("query_id"),
        pqDistsTab(col("emb_d"), cb).as("qtab"),
        explode(array(col("centroid"), col("second"))).as("probe"))

  /** ADC probe-join + rank over any coded candidate frame carrying
    * (vec_id, centroid, codes) — shared by the in-memory and the
    * disk-indexed search so the two can never diverge.
    */
  private def rankAdc(cand: DataFrame, q: DataFrame): DataFrame = {
    val adc = (0 until PqSubspaces).map { m =>
      element_at(element_at(col("qtab"), m + 1),
        (element_at(col("codes"), m + 1) + lit(1L)).cast("int"))
    }.reduce(_ + _)
    val scored = cand.join(broadcast(q),
        col("centroid") === col("probe") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("centroid").cast("long").as("centroid"), adc.as("approx_d2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_d2").asc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "centroid", "rank", "approx_d2")
  }

  def annIvfPqProbe(emb: DataFrame): DataFrame = {
    val a = assigned(emb, defaultCentroids)
    rankAdc(pqCands(a, defaultPqCodebook), pqProbeQueries(a, defaultPqCodebook))
  }

  /** Persist the IVFADC serving index: inverted lists partitioned by
    * centroid (the [[writeIvfIndex]] layout, so probes prune at the file
    * index via dynamic partition pruning) whose rows carry ONLY the M PQ
    * codes — the index is ~32× smaller than the exact-vector one, the
    * compression that lets a billion-vector index live on a few machines.
    */
  /** The IVFADC index row shape — public so the streaming appender
    * ([[graft.stream.IndexStream.runPq]]) writes the SAME rows through
    * the exactly-once file sink.
    */
  def ivfPqIndexRows(emb: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids,
      codebook: Array[Double] = defaultPqCodebook): DataFrame =
    pqCands(assigned(emb, centroids), codebook)

  def writeIvfPqIndex(emb: DataFrame, dir: String,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids,
      codebook: Array[Double] = defaultPqCodebook): Unit =
    ivfPqIndexRows(emb, centroids, codebook)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("centroid").parquet(dir)

  /** Search a persisted [[writeIvfPqIndex]] index — the probe join is on
    * the partition column (only probed list directories are read), and
    * scoring is ADC over the stored codes. Results are identical to the
    * in-memory [[annIvfPqProbe]] over the same vectors/codebooks — both
    * run [[rankAdc]], and codes are integers so the parquet round-trip
    * is trivially exact.
    */
  def annIvfPqProbeIndexed(spark: SparkSession, indexDir: String,
      queries: DataFrame,
      centroids: Seq[IndexedSeq[Double]] = defaultCentroids,
      codebook: Array[Double] = defaultPqCodebook): DataFrame =
    rankAdc(spark.read.parquet(indexDir),
      pqProbeQueries(assigned(queries, centroids), codebook))

  def sqlAnnIvfPqProbe: String = {
    val qtab = (0 until PqSubspaces).map(m => sqlPqDists(m, "emb_d"))
      .mkString("[", ", ", "]")
    val codes = (0 until PqSubspaces).map { m =>
      val d = sqlPqDists(m, "emb_d")
      s"CAST(list_position($d, list_min($d)) - 1 AS BIGINT)"
    }.mkString("[", ", ", "]")
    val adc = (0 until PqSubspaces)
      .map(m => s"q.qtab[${m + 1}][e.codes[${m + 1}] + 1]").mkString(" + ")
    s"""WITH e0 AS (
       |  SELECT vec_id, emb_d, dots,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS centroid
       |  FROM (SELECT *, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")}))),
       |e AS (SELECT vec_id, centroid, $codes AS codes FROM e0),
       |q AS (
       |  SELECT vec_id AS query_id, $qtab AS qtab, unnest([centroid,
       |    CAST(list_position(dots, list_max(list_filter(dots, x -> x <> list_max(dots)))) - 1 AS BIGINT)]) AS probe
       |  FROM e0 WHERE vec_id < $NQueries)
       |SELECT query_id, neighbor_id, centroid, rank, approx_d2 FROM (
       |  SELECT q.query_id, e.vec_id AS neighbor_id, e.centroid,
       |    $adc AS approx_d2,
       |    CAST(row_number() OVER (PARTITION BY q.query_id
       |      ORDER BY $adc ASC, e.vec_id) AS BIGINT) AS rank
       |  FROM e JOIN q ON e.centroid = q.probe AND e.vec_id <> q.query_id)
       |WHERE rank <= $TopK""".stripMargin
  }

  /** The refine step that completes the IVFADC pipeline: exact-cosine
    * rerank of the ADC survivors. [[annIvfPqProbe]] ranks by approximate
    * quantized distance; production IVFADC follows it with an exact
    * rerank of the few survivors — fetch true vectors for |Q|·K ids (the
    * survivor set broadcasts; the vector table is scanned once, never
    * shuffled) and reorder by exact cosine. Output is the SAME K
    * neighbors per query, re-ranked — making the ADC approximation's
    * ordering error observable and correctable at the cost of K exact
    * distance evaluations per query instead of a corpus-wide scan.
    */
  def annIvfPqRefine(emb: DataFrame): DataFrame = {
    val e = withNorm(emb)
    val survivors = annIvfPqProbe(emb).select("query_id", "neighbor_id")
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("emb_d").as("eq"),
        col("norm").as("nq"))
    val exact = e.join(broadcast(survivors), col("vec_id") === col("neighbor_id"))
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("eq"), col("nq"), col("emb_d"), col("norm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }

  def sqlAnnIvfPqRefine: String =
    s"""WITH e AS (${sqlWithNorm("embeddings")}),
       |adc AS (SELECT query_id, neighbor_id FROM (
       |${sqlAnnIvfPqProbe}
       |) t)
       |SELECT query_id, neighbor_id, rank, cos_sim FROM (
       |  SELECT a.query_id, a.neighbor_id,
       |    ${sqlCosine("q.emb_d", "q.norm", "n.emb_d", "n.norm")} AS cos_sim,
       |    CAST(row_number() OVER (PARTITION BY a.query_id
       |      ORDER BY ${sqlCosine("q.emb_d", "q.norm", "n.emb_d", "n.norm")} DESC, a.neighbor_id) AS BIGINT) AS rank
       |  FROM adc a
       |  JOIN e n ON n.vec_id = a.neighbor_id
       |  JOIN e q ON q.vec_id = a.query_id)""".stripMargin

  // -------------------------------------------------------- ann_pca_refine

  /** Coarse candidates per query for the PCA-reduced first pass. */
  val PcaCoarseCands = 32

  /** PCA-reduced ANN: coarse cosine search in the k=[[graft.ops
    * .PretrainOps.PcaK]] PROJECTED space (per-pair cost k mults instead
    * of [[Dim]] — the matrix-sketch sibling of PQ's table-lookup trick),
    * take the top [[PcaCoarseCands]] per query, then exact-cosine rerank
    * to [[TopK]] in the full space — the [[annIvfPqRefine]] two-stage
    * shape with the dimension reduction, not the quantization, carrying
    * the cheap pass. Completes the PCA family: project
    * ([[graft.ops.PretrainOps.embedPcaProject]]) → dedup
    * ([[graft.ops.DedupOps.dedupSemanticPca]]) → search (here).
    *
    * Scale shape: the projected+normed table materializes ONCE (at real
    * scale it is the stored reduced index — 16× narrower than the
    * vectors); the coarse pass is a broadcast nested-loop over 4-dim
    * rows with a WindowGroupLimit top-C; only the |Q|·C survivor ids
    * (broadcast) touch full vectors again, one scan, never a corpus
    * shuffle.
    */
  def annPcaRefine(emb: DataFrame): DataFrame = {
    val comps = graft.ops.PretrainOps.defaultPcaComponents
    val proj = array(comps.map(c =>
      dot(array(c.map(lit): _*), col("emb_d"))): _*)
    val e = graft.ops.DedupOps.materialize(
      withNorm(emb)
        .withColumn("p", proj)
        .withColumn("pnorm", sqrt(dot(col("p"), col("p")))),
      "ann_pca_proj")
    val qp = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("p").as("pq"),
        col("pnorm").as("pnq"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("pca_sim").desc, col("neighbor_id"))
    val cands = e.join(broadcast(qp), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("pq"), col("pnq"), col("p"), col("pnorm")).as("pca_sim"))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= PcaCoarseCands)
      .select("query_id", "neighbor_id")
    val qv = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("emb_d").as("eq"),
        col("norm").as("nq"))
    val exact = e.join(broadcast(cands), col("vec_id") === col("neighbor_id"))
      .join(broadcast(qv), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("eq"), col("nq"), col("emb_d"), col("norm")).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "rank", "cos_sim")
  }

  def sqlAnnPcaRefine: String = {
    val projList = graft.ops.PretrainOps.sqlPcaProjList("emb_d")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, emb_d, norm, p, sqrt(${sqlDot("p", "p")}) AS pnorm
       |  FROM (SELECT vec_id, emb_d, norm, $projList AS p
       |        FROM (${sqlWithNorm("embeddings")}))),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${sqlCosine("q.p", "q.pnorm", "e.p", "e.pnorm")} DESC,
       |          e.vec_id) AS crank
       |    FROM e q JOIN e ON e.vec_id <> q.vec_id
       |    WHERE q.vec_id < $NQueries)
       |  WHERE crank <= $PcaCoarseCands)
       |SELECT query_id, neighbor_id, rank, cos_sim FROM (
       |  SELECT c.query_id, c.neighbor_id,
       |    ${sqlCosine("q.emb_d", "q.norm", "n.emb_d", "n.norm")} AS cos_sim,
       |    CAST(row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY ${sqlCosine("q.emb_d", "q.norm", "n.emb_d", "n.norm")} DESC, c.neighbor_id) AS BIGINT) AS rank
       |  FROM cand c
       |  JOIN e n ON n.vec_id = c.neighbor_id
       |  JOIN e q ON q.vec_id = c.query_id)
       |WHERE rank <= $TopK""".stripMargin
  }

  /** One k-means step of ALL M PQ codebooks in a single pass: each
    * subvector is assigned to its nearest codebook entry (in-row,
    * codebooks as plan literals), then ONE (subspace, code, dim)-keyed
    * map-side-combined agg emits the new per-dimension means + cluster
    * sizes — [[Dim]] rows per vector, exactly [[ivfTrainStep]]'s shape
    * generalized per-subspace. Feed the means back as codebooks to
    * iterate; empty codes keep their seed (driver-side, as in
    * [[ivfTrain]]).
    */
  /** The shared assign→explode frame behind [[pqTrainStep]] and
    * [[pqTrain]]: one (dist?, subspace, code, dim_idx, v) row per
    * (vector, subspace, dim) — parameterized by codebook so the
    * oracle-keyed step and the training loop CANNOT drift apart.
    * `dist` (the row's total min-distance distortion, replicated per
    * exploded row) is only materialized when the caller aggregates an
    * objective.
    */
  private def pqStepRows(e: DataFrame, cb: Array[Double],
      withDist: Boolean): DataFrame = {
    val subs = array((0 until PqSubspaces).map(m =>
      struct(lit(m.toLong).as("subspace"),
        element_at(col("codes"), m + 1).as("code"),
        slice(col("emb_d"), m * PqSubDim + 1, PqSubDim).as("sub"))): _*)
    val coded = e
      .select(col("emb_d"), pqDistsTab(col("emb_d"), cb).as("dtab"))
      .select(col("emb_d"), pqCodesOf(col("dtab")).as("codes"),
        (if (withDist)
          aggregate(transform(col("dtab"), d => array_min(d)),
            lit(0.0), (a, x) => a + x)
        else lit(0.0)).as("dist"))
    coded.select(col("dist"), explode(subs).as("s"))
      .select(col("dist"), col("s.subspace").as("subspace"),
        col("s.code").as("code"), posexplode(col("s.sub")))
      .toDF("dist", "subspace", "code", "dim_idx", "v")
      .withColumn("dim_idx", col("dim_idx").cast("long"))
  }

  def pqTrainStep(emb: DataFrame,
      codebook: Array[Double] = defaultPqCodebook): DataFrame =
    pqStepRows(withNorm(emb), codebook, withDist = false)
      .groupBy("subspace", "code", "dim_idx")
      .agg(avg(col("v")).as("mean_val"), count(lit(1)).as("n_vecs"))
      .select("subspace", "code", "dim_idx", "mean_val", "n_vecs")

  /** Mean total quantization distortion Σₘ min_j d²(x_m, c_mj) of `cb`
    * over `e` — one scan, one 1-row agg, no explode (cheaper than a
    * training pass). None on empty input.
    */
  private def pqMeanDistortion(e: DataFrame, cb: Array[Double])
      : Option[Double] = {
    val row = e
      .select(aggregate(
        transform(pqDistsTab(col("emb_d"), cb), d => array_min(d)),
        lit(0.0), (a, x) => a + x).as("dist"))
      .agg(sum("dist").as("s"), count(lit(1)).as("n")).collect()(0)
    if (row.getAs[Long]("n") == 0L) None
    else Some(row.getAs[Double]("s") / row.getAs[Long]("n"))
  }

  /** Iterative PQ codebook training: Lloyd k-means per subspace, ALL M
    * subspaces trained in one distributed pass per iteration (the
    * [[pqTrainStep]] shape: kernel-computed tables → argmin codes → one
    * (subspace, code, dim)-keyed map-side-combined agg), with only the
    * M×K×subDim codebook (8 KB) ever reaching the driver — the [[ivfTrain]]
    * discipline. Per-iteration objective is the mean total quantization
    * distortion Σₘ min_j d²(x_m, c_mj), counted once per vector via the
    * (subspace 0, dim 0) guard; Lloyd's alternation makes it
    * non-increasing, which the spec asserts. Empty codes keep their
    * previous entry.
    *
    * hist(i) for i < maxIter measures codebook_i BEFORE its Lloyd update;
    * a final cheap distortion pass ([[pqMeanDistortion]]) is appended so
    * `hist.last` always measures the RETURNED codebook — the tol-based
    * stop and the "trained beats seed" spec act on the real output, not
    * the penultimate iterate.
    *
    * @return (trained flat codebook — [[pqDistsTab]]/[[writeIvfPqIndex]]
    *         accept it directly, per-iteration mean distortion)
    */
  def pqTrain(emb: DataFrame, maxIter: Int = 5, tol: Double = 1e-9)
      : (Array[Double], Seq[Double]) = {
    val e = withNorm(emb).select("emb_d").cache()
    try {
      var cb = defaultPqCodebook.clone()
      val hist = scala.collection.mutable.ArrayBuffer.empty[Double]
      var iter = 0
      var improving = true
      while (iter < maxIter && improving) {
        val stats = pqStepRows(e, cb, withDist = true)
          .groupBy("subspace", "code", "dim_idx")
          .agg(sum("v").as("s"), count(lit(1)).as("n"),
            // each VECTOR's distortion counted once, not once per
            // (subspace, dim) row
            sum(when(col("subspace") === 0 && col("dim_idx") === 0,
              col("dist"))).as("obj"))
          .collect()
        val n = stats
          .filter(r => r.getAs[Long]("subspace") == 0L &&
            r.getAs[Long]("dim_idx") == 0L)
          .map(_.getAs[Long]("n")).sum
        if (n == 0) return (cb, hist.toSeq) // empty input: keep the seed
        val obj = stats.flatMap(r => Option(r.getAs[java.lang.Double]("obj")))
          .map(_.doubleValue).sum / n
        val next = cb.clone()
        for (r <- stats) {
          val base = (r.getAs[Long]("subspace").toInt * PqCodes +
            r.getAs[Long]("code").toInt) * PqSubDim
          next(base + r.getAs[Long]("dim_idx").toInt) =
            r.getAs[Double]("s") / r.getAs[Long]("n")
        }
        cb = next
        improving = hist.lastOption.forall(prev => prev - obj > tol)
        hist += obj
        iter += 1
      }
      // measure the codebook we actually return (one Lloyd step past the
      // last in-loop objective)
      pqMeanDistortion(e, cb).foreach(hist += _)
      (cb, hist.toSeq)
    } finally { e.unpersist(); () }
  }

  // -------------------------------------------------------- index compaction

  /** Compact a STREAMED index directory ([[graft.stream.IndexStream]])
    * into a fresh batch-layout index: the file sink appends one file per
    * (micro-batch × list) — after a year of daily batches each probe
    * touches hundreds of footer-sized files, and the small-files problem
    * IS the serving-index maintenance problem at scale. One
    * `repartition(centroid)` co-locates each inverted list into a single
    * task, so the rewrite emits ONE file per list directory; dynamic
    * partition pruning and both probe paths work unchanged over the
    * result ([[annIvfProbeIndexed]] / [[annIvfPqProbeIndexed]] —
    * flavor-agnostic, all columns preserved).
    *
    * Reads THROUGH the `_spark_metadata` log (exactly the committed
    * rows — an uncommitted replay file is invisible) and writes a NEW
    * directory: compacting in place under the metadata log would orphan
    * the log's file listing and is refused loudly. The streamed dir +
    * its checkpoint stay the live ingestion path; readers cut over to
    * the compacted dir, the next compaction run folds the delta — the
    * standard serve/compact cycle. Lists larger than one task's worth:
    * pass `filesPerList` > 1 to salt the repartition.
    */
  def compactIndex(spark: SparkSession, streamedDir: String, outDir: String,
      filesPerList: Int = 1): Unit = {
    val src = new org.apache.hadoop.fs.Path(streamedDir)
    val dst = new org.apache.hadoop.fs.Path(outDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // equality is not enough: Overwrite to an ANCESTOR of the streamed
    // dir recursively deletes it (index + metadata log) before writing,
    // and a DESCENDANT would be clobbered by the source's own listing —
    // refuse any containment either way
    val srcQ = fs.makeQualified(src).toString.stripSuffix("/") + "/"
    val dstQ = fs.makeQualified(dst).toString.stripSuffix("/") + "/"
    if (srcQ.startsWith(dstQ) || dstQ.startsWith(srcQ))
      throw new IllegalArgumentException(
        s"compactIndex must write a NEW directory outside $streamedDir: " +
          "in-place (or ancestor/descendant) compaction would delete or " +
          "orphan the _spark_metadata file listing under live readers. " +
          "Compact to a fresh dir and cut readers over.")
    val rows = spark.read.parquet(streamedDir)
    val keyed =
      if (filesPerList <= 1) rows.repartition(col("centroid"))
      else rows.repartition(col("centroid"),
        pmod(col("vec_id"), lit(filesPerList.toLong)))
    keyed.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("centroid").parquet(outDir)
  }

  // --------------------------------------------------------- cluster_sample

  /** Per-cluster prototype count kept by [[clusterSample]]. */
  val ClusterSampleN = 16

  /** Unit norm of coarse centroid `j` — a driver-side constant (the
    * centroids are plan literals; so are their norms).
    */
  private def centroidNorm(j: Int): Double =
    math.sqrt(centroid(j).map(x => x * x).sum)

  /** Cluster-balanced prototype sampling — the SemDeDup / SSL-prototypes
    * coreset selection step (Sorscher et al. 2022, Abbas et al. 2023):
    * assign every vector to its max-dot coarse centroid, score each by
    * cosine TO its centroid (prototypicality), and keep the
    * [[ClusterSampleN]] most prototypical per cluster. Published pruning
    * recipes then keep/drop slices of this ranking; the ranked per-cluster
    * table is the operator.
    *
    * Scale shape: assignment and the centroid cosine are one narrow
    * codegen'd projection (centroids AND their norms ride as plan
    * literals — no join against a centroid table). The per-cluster top-N
    * is a rank-limited window on `centroid`: Spark plans it as
    * WindowGroupLimit, so each map task keeps at most N rows per cluster
    * BEFORE the exchange — the shuffle carries O(K·N·tasks) rows, never
    * the corpus, and the K-partition final window sees only those. K
    * here is the literal centroid set; at 100 TB K comes from
    * [[ivfTrain]] and is thousands — K·N stays metadata-sized either way.
    */
  def clusterSample(emb: DataFrame, n: Int = ClusterSampleN): DataFrame =
    clusterSampleWith(emb, n, defaultCentroids)

  /** [[clusterSample]] under explicit coarse centroids — the face the
    * trained-quantizer pipeline uses (ivfTrain → prototypes of the
    * LEARNED cells, not the fixed ladder's).
    */
  def clusterSampleWith(emb: DataFrame, n: Int,
      centroids: Seq[IndexedSeq[Double]]): DataFrame = {
    val cnorms = array(centroids.map(c =>
      lit(math.sqrt(c.map(x => x * x).sum))): _*)
    // zero-norm vectors are degenerate ("near-dups of nothing" — the
    // cosine guard's own rationale): excluded up front, or their NULL
    // cosine would sort last yet still claim top-N slots in any cluster
    // with fewer than N real members
    val a = withNorm(emb)
      .filter(col("norm") > 0)
      .withColumn("dots", centDotsOf(centroids, col("emb_d")))
      .withColumn("centroid",
        (array_position(col("dots"), array_max(col("dots"))) - 1).cast("long"))
      .withColumn("cidx", (col("centroid") + 1).cast("int"))
      .select(col("centroid"), col("vec_id"),
        when(col("norm") > 0,
          element_at(col("dots"), col("cidx"))
            / (col("norm") * element_at(cnorms, col("cidx"))))
          .as("centroid_cos"))
    val w = Window.partitionBy(col("centroid"))
      .orderBy(col("centroid_cos").desc, col("vec_id"))
    a.withColumn("proto_rank", row_number().over(w).cast("long"))
      .filter(col("proto_rank") <= n)
      .select("centroid", "vec_id", "proto_rank", "centroid_cos")
  }

  def sqlClusterSample: String = {
    val cnormsLit = (0 until IvfCentroids).map(j => centroidNorm(j).toString)
      .mkString("([", ", ", "]::DOUBLE[])")
    s"""WITH a AS (
       |  SELECT vec_id, norm, dots,
       |    CAST(list_position(dots, list_max(dots)) - 1 AS BIGINT) AS centroid
       |  FROM (SELECT vec_id, norm, ${sqlCentDots("emb_d")} AS dots
       |        FROM (${sqlWithNorm("embeddings")}) WHERE norm > 0)),
       |s AS (
       |  SELECT centroid, vec_id,
       |    CASE WHEN norm > 0 THEN
       |      dots[CAST(centroid AS INT) + 1]
       |        / (norm * $cnormsLit[CAST(centroid AS INT) + 1]) END AS centroid_cos
       |  FROM a)
       |SELECT centroid, vec_id, proto_rank, centroid_cos FROM (
       |  SELECT centroid, vec_id, centroid_cos,
       |    CAST(row_number() OVER (PARTITION BY centroid
       |      ORDER BY centroid_cos DESC, vec_id) AS BIGINT) AS proto_rank
       |  FROM s)
       |WHERE proto_rank <= $ClusterSampleN""".stripMargin
  }

  def sqlPqTrainStep: String = {
    val dists = (0 until PqSubspaces)
      .map(m => s"${sqlPqDists(m, "emb_d")} AS d$m").mkString(",\n    ")
    val pieces = (0 until PqSubspaces).map { m =>
      s"""SELECT CAST($m AS BIGINT) AS subspace,
         |  CAST(list_position(d$m, list_min(d$m)) - 1 AS BIGINT) AS code,
         |  CAST(t.i AS BIGINT) AS dim_idx, emb_d[${m * PqSubDim} + t.i + 1] AS v
         |FROM b, (SELECT unnest(range($PqSubDim)) AS i) t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH b AS (
       |  SELECT vec_id, emb_d, $dists
       |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb_d
       |        FROM embeddings))
       |SELECT subspace, code, dim_idx, avg(v) AS mean_val, count(*) AS n_vecs
       |FROM ($pieces)
       |GROUP BY subspace, code, dim_idx""".stripMargin
  }
}
