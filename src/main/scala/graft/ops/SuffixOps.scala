package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.ArrayFunctions.common_prefix_len

/** Corpus SUFFIX ARRAY by distributed prefix doubling, and its first
  * consumer — the exact-repeat detector that underpins substring-level
  * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better": ExactSubstr builds a suffix array over the corpus
  * and removes long repeats). The [[PretrainOps]] span/winnow family is
  * the HASH approximation of this; the suffix array is the exact
  * instrument.
  *
  * Algorithm (Manber–Myers doubling, the standard distributed SA
  * construction): rank every position by its character, then repeatedly
  * re-rank by the pair (rank[i], rank[i+k]) with k doubling — after
  * ⌈log₂ maxlen⌉ rounds ranks order suffixes exactly. Each round is
  * TWO bounded shuffles (the shifted-rank self-join and the dense
  * re-rank) — no suffix STRING ever moves; the shuffled rows are
  * (doc_id, pos, rank) longs. The dense re-rank deliberately avoids an
  * unpartitioned window: distinct keys are range-SORTED as an RDD and
  * `zipWithIndex`'d (a distributed sort + O(partitions) offset pass),
  * which is also how the FINAL total order is emitted. A suffix array
  * IS a sorted order — the log-round sorts are the operator's honest
  * cost, and the literature's (at 100 TB, production ExactSubstr builds
  * per-shard arrays and merges, which this per-doc-corpus form
  * composes into).
  *
  * Parity: initial character ranks sort the alphabet by CODEPOINT
  * (NOT Java's UTF-16 code-unit order — they disagree above the BMP),
  * because DuckDB's binary collation is UTF-8 byte order = codepoint
  * order; every later comparison is integer ranks in both engines.
  * Shorter-prefix suffixes win ties via the −1 missing-rank sentinel;
  * IDENTICAL suffixes (identical docs exist in any real corpus) can
  * never be separated by content and take the (doc_id, pos) tiebreak
  * in both engines.
  */
object SuffixOps {

  /** Probe width (chars) for [[saLongestRepeat]]'s LCP — capped so both
    * engines pay O(cap) per adjacent pair instead of O(maxlen²) oracle
    * cost; a repeat reaching the cap reports `capped = true` (the
    * production setting mirrors the dedup span width of interest).
    */
  val SaLcpCap = 64

  /** Doubling seed width: initial ranks come from the [[SaSeedWidth]]-
    * char window at each position (string-sorted — a fixed window near
    * the doc end IS the true remaining suffix, so prefix-first string
    * order is exactly suffix order there), which removes log₂(width)
    * doubling rounds outright. Each round is job-overhead-bound at
    * interactive scale, so fewer rounds is the lever: 16 cuts 10 rounds
    * to 6 on ~600-char docs (measured 15 → ~9 s on the sf0.1 shard).
    */
  val SaSeedWidth = 16

  /** The global suffix array: one row per character position, ordered
    * by suffix string (byte order), ties by (doc_id, pos). Output:
    * (sa_rank, doc_id, pos) with 0-based pos.
    */
  def suffixArray(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // seed windows in ONE kernel pass per doc (char_windows) — the
    // per-position `substring(t, pos+1, w)` idiom re-scans the string
    // from byte 0 per position: O(n²) bytes per document
    val chars = DedupOps.fanout(docs)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
      .select(col("doc_id"),
        posexplode(org.apache.spark.sql.graftext.ArrayFunctions
          .char_windows(col("t"), SaSeedWidth)))
      .toDF("doc_id", "pos", "w")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w"))
    // per-round lineage truncation (the connectedComponents discipline):
    // elems feeds BOTH sides of the shift join AND the re-rank, so
    // without truncation the logical plan TRIPLES per round — ~3^10
    // nodes by convergence, which is an analysis-time/driver-heap
    // explosion long before any executor works (measured: rounds went
    // 1 s → 30+ s on the 150k-char fixture). localCheckpoint resets the
    // plan to computed blocks; CheckpointDirConf swaps in the durable
    // parquet round-trip on a real cluster.
    val runId = java.util.UUID.randomUUID().toString.take(8)
    def truncate(df: DataFrame, name: String): DataFrame =
      DedupOps.truncateIter(df, s"sa-$runId", name)
    // seed ranks: dense rank of the distinct windows in UTF-8 BYTE order
    // (Java String order is UTF-16 code-unit order — they disagree above
    // the BMP, and the oracle's binary collation is byte order)
    val byteOrd: Ordering[Array[Byte]] = new Ordering[Array[Byte]]
        with Serializable {
      override def compare(a: Array[Byte], b: Array[Byte]): Int = {
        val n = math.min(a.length, b.length)
        var i = 0
        var c = 0
        while (i < n && c == 0) {
          c = (a(i) & 0xff) - (b(i) & 0xff)
          i += 1
        }
        if (c != 0) c else a.length - b.length
      }
    }
    val seedRanks = chars.select("w").distinct().as[String].rdd
      .map(w => (w.getBytes(java.nio.charset.StandardCharsets.UTF_8), w))
      .sortBy(_._1)(byteOrd, implicitly[scala.reflect.ClassTag[Array[Byte]]])
      .zipWithIndex()
      .map { case ((_, w), i) => (w, i) }
      .toDF("w", "r0")
    var elems = truncate(
      chars.join(seedRanks, Seq("w"))
        .select(col("doc_id"), col("pos"), col("r0").as("r")),
      "sa_iter_0")
    var spent: DataFrame = null
    val total = elems.count()
    if (total == 0L) return spark.emptyDataFrame
      .sparkSession.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("sa_rank",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("pos",
            org.apache.spark.sql.types.LongType))))
    val maxLen = docs
      .agg(max(length(coalesce(col("text"), lit(""))))).head().getInt(0).toLong
    // fixed ⌈log₂(maxLen/seed)⌉ rounds — no per-round convergence count:
    // the early-exit check cost a job per round and only fires on
    // corpora with NO repeated structure (real text converges in the
    // last rounds; the fixture measured 147k/153k distinct at k=256)
    var k = SaSeedWidth.toLong
    while (k < maxLen) {
      val shifted = elems.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("r").as("r2"))
      val paired = elems.join(shifted, Seq("doc_id", "pos"), "left")
        .select(col("doc_id"), col("pos"), col("r"),
          coalesce(col("r2"), lit(-1L)).as("r2"))
      // dense re-rank of the (r, r2) keys: distinct → range sort →
      // zipWithIndex (deterministic: keys are unique) → join back
      val rankedKeys = paired.select("r", "r2").distinct()
        .as[(Long, Long)].rdd
        .sortBy(identity).zipWithIndex()
        .map { case ((a, b), i) => (a, b, i) }
        .toDF("r", "r2", "nr")
      val next = truncate(
        paired.join(rankedKeys, Seq("r", "r2"))
          .select(col("doc_id"), col("pos"), col("nr").as("r")),
        s"sa_iter_$k")
      // free the round that `next` no longer needs (the CC discipline:
      // localCheckpoint pins blocks for the JVM's life otherwise)
      if (spent != null)
        org.apache.spark.sql.graftext.CheckpointBlocks.unpersist(spent)
      spent = elems
      elems = next
      k *= 2
    }
    if (spent != null)
      org.apache.spark.sql.graftext.CheckpointBlocks.unpersist(spent)
    // final emit: ranks order suffix CONTENT; (doc_id, pos) breaks the
    // identical-suffix ties — a unique key, so the sort is deterministic
    elems.as[(Long, Long, Long)].rdd
      .map { case (d, p, r) => (r, d, p) }
      .sortBy(identity).zipWithIndex()
      .map { case ((_, d, p), i) => (i, d, p) }
      .toDF("sa_rank", "doc_id", "pos")
  }

  def sqlSuffixArray: String =
    s"""SELECT CAST(row_number() OVER (ORDER BY suf, doc_id, pos) - 1 AS BIGINT)
       |    AS sa_rank,
       |  doc_id, CAST(pos - 1 AS BIGINT) AS pos
       |FROM (
       |  SELECT doc_id, i AS pos, substr(text, i) AS suf
       |  FROM (SELECT doc_id, coalesce(text, '') AS text,
       |          unnest(range(1, length(coalesce(text, '')) + 1)) AS i
       |        FROM documents WHERE doc_id % 10 = 0))""".stripMargin

  /** The classic suffix-array application: the longest repeated
    * substring in the corpus (cross- or within-doc), found as the
    * maximal LCP of ADJACENT suffix-array entries — any repeat's two
    * occurrences sort adjacent-or-contiguous, so only N−1 pairs are
    * probed, each to [[SaLcpCap]] chars (`capped` says the repeat
    * reaches the probe width). Output: one row (lcp, capped, and the
    * two occurrences). This is ExactSubstr's detection half; the
    * REMOVAL half is [[PretrainOps.dedupSubstringApply]]'s span
    * surgery, which this feeds at the exact (not hashed) level.
    *
    * Scale shape: the pairing is a self-join on sa_rank = sa_rank+1
    * (one shuffle of (rank, doc, pos) longs); only then do the ≤cap-char
    * windows join in from the doc table (2 narrow joins), so suffix
    * strings never ride the big exchange; the argmax is
    * TakeOrderedAndProject.
    */
  def saLongestRepeat(docs: DataFrame): DataFrame =
    saLongestRepeatOn(suffixArray(docs), docs)

  /** [[saLongestRepeat]] over an ALREADY-BUILT suffix array — the face a
    * sweep uses so every SA consumer amortizes one build (the shared
    * token-table discipline; the oracle rebuilds per query, so hash
    * parity proves the sharing is semantics-free).
    */
  def saLongestRepeatOn(sa: DataFrame, docs: DataFrame): DataFrame =
    adjacentLcp(sa, docs)
      .orderBy(col("lcp").desc, col("sa_rank").asc)
      .limit(1)
      .select("lcp", "capped", "doc_a", "pos_a", "doc_b", "pos_b")

  /** Adjacent SA entries with their capped LCP — shared by the
    * longest-repeat argmax and the repeat-coverage union.
    */
  private def adjacentLcp(sa: DataFrame, docs: DataFrame): DataFrame = {
    // LCP windows built ONCE per doc by the char_windows kernel and
    // exploded to (doc, pos, w) rows — O(n·cap) bytes total. Joining the
    // text and substring-ing per SA row would re-scan O(n) bytes per
    // position (quadratic per doc); shipping the whole window ARRAY per
    // SA row would be quadratic in shuffle bytes instead.
    val wins = DedupOps.materialize(
      docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
        .select(col("doc_id"),
          posexplode(org.apache.spark.sql.graftext.ArrayFunctions
            .char_windows(col("t"), SaLcpCap)))
        .toDF("doc_id", "pos", "w")
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("w")),
      "sa_lcp_windows")
    def win(saDf: DataFrame, suffix: String): DataFrame =
      saDf.join(wins, Seq("doc_id", "pos"))
        .select(col("sa_rank"),
          col("doc_id").as(s"doc_$suffix"), col("pos").as(s"pos_$suffix"),
          col("w").as(s"w_$suffix"))
    val a = win(sa, "a")
    val b = win(sa.withColumn("sa_rank", col("sa_rank") - 1), "b")
    a.join(b, Seq("sa_rank"))
      .select(col("sa_rank"), col("doc_a"), col("pos_a"),
        col("doc_b"), col("pos_b"),
        common_prefix_len(col("w_a"), col("w_b")).cast("long").as("lcp"))
      .withColumn("capped", col("lcp") === SaLcpCap)
  }

  /** Minimum repeat length (chars) for [[saRepeatCoverage]] — the
    * ExactSubstr paper removes repeats ≥ 50 BPE tokens; 20 chars keeps
    * the synthetic corpus populated.
    */
  val SaRepeatMin = 20

  /** EXACT-repeat coverage per document — the corpus diagnostic behind
    * ExactSubstr dedup: what fraction of each doc's characters sits
    * inside an exact repeated substring of ≥ [[SaRepeatMin]] chars
    * (found as adjacent-SA LCP intervals; the probe caps at
    * [[SaLcpCap]], and a longer repeat is still fully covered because
    * EVERY position inside it heads its own adjacent pair — the
    * interval union closes over the chain). Zero-coverage docs are
    * present with 0 — a gate can assert "coverage < τ" corpus-wide.
    *
    * Scale shape: pairs as [[saLongestRepeat]]; qualifying intervals
    * explode into covered positions (bounded by total repeat VOLUME,
    * which is the quantity being measured — a corpus where this
    * explodes is a corpus that needed the dedup), then one distinct +
    * one per-doc agg.
    */
  def saRepeatCoverage(docs: DataFrame): DataFrame =
    saRepeatCoverageOn(suffixArray(docs), docs)

  def saRepeatCoverageOn(sa: DataFrame, docs: DataFrame): DataFrame = {
    val rep = adjacentLcp(sa, docs).filter(col("lcp") >= SaRepeatMin)
    val covered = rep.select(col("doc_a").as("doc_id"),
        explode(sequence(col("pos_a"), col("pos_a") + col("lcp") - 1))
          .as("p"))
      .union(rep.select(col("doc_b").as("doc_id"),
        explode(sequence(col("pos_b"), col("pos_b") + col("lcp") - 1))
          .as("p")))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_covered"))
    docs.select(col("doc_id"),
        length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"))
      .join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"))
      .withColumn("coverage",
        when(col("n_chars") > 0,
          col("n_covered").cast("double") / col("n_chars").cast("double")))
  }

  def sqlSaRepeatCoverage: String =
    s"""WITH sa AS (
       |  SELECT CAST(row_number() OVER (ORDER BY suf, doc_id, pos) - 1 AS BIGINT)
       |      AS sa_rank,
       |    doc_id, CAST(pos - 1 AS BIGINT) AS pos,
       |    substr(suf, 1, $SaLcpCap) AS w
       |  FROM (
       |    SELECT doc_id, i AS pos, substr(text, i) AS suf
       |    FROM (SELECT doc_id, coalesce(text, '') AS text,
       |            unnest(range(1, length(coalesce(text, '')) + 1)) AS i
       |          FROM documents WHERE doc_id % 10 = 0))),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, a.pos AS pos_a,
       |    b.doc_id AS doc_b, b.pos AS pos_b,
       |    CAST(list_max(list_prepend(0,
       |      list_filter(range(1, least(length(a.w), length(b.w)) + 1),
       |        i -> substr(a.w, 1, i) = substr(b.w, 1, i)))) AS BIGINT) AS lcp
       |  FROM sa a JOIN sa b ON b.sa_rank = a.sa_rank + 1),
       |rep AS (SELECT * FROM pairs WHERE lcp >= $SaRepeatMin),
       |covered AS (
       |  SELECT doc_id, count(*) AS n_covered FROM (
       |    SELECT DISTINCT doc_id, p FROM (
       |      SELECT doc_a AS doc_id, unnest(range(pos_a, pos_a + lcp)) AS p
       |      FROM rep
       |      UNION ALL
       |      SELECT doc_b AS doc_id, unnest(range(pos_b, pos_b + lcp)) AS p
       |      FROM rep))
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(length(coalesce(d.text, '')) AS BIGINT) AS n_chars,
       |  CAST(coalesce(c.n_covered, 0) AS BIGINT) AS n_covered,
       |  CASE WHEN length(coalesce(d.text, '')) > 0
       |    THEN CAST(coalesce(c.n_covered, 0) AS DOUBLE)
       |      / length(coalesce(d.text, '')) END AS coverage
       |FROM documents d LEFT JOIN covered c USING (doc_id)
       |WHERE d.doc_id % 10 = 0""".stripMargin

  def sqlSaLongestRepeat: String =
    s"""WITH sa AS (
       |  SELECT CAST(row_number() OVER (ORDER BY suf, doc_id, pos) - 1 AS BIGINT)
       |      AS sa_rank,
       |    doc_id, CAST(pos - 1 AS BIGINT) AS pos,
       |    substr(suf, 1, $SaLcpCap) AS w
       |  FROM (
       |    SELECT doc_id, i AS pos, substr(text, i) AS suf
       |    FROM (SELECT doc_id, coalesce(text, '') AS text,
       |            unnest(range(1, length(coalesce(text, '')) + 1)) AS i
       |          FROM documents WHERE doc_id % 10 = 0))),
       |pairs AS (
       |  SELECT a.sa_rank, a.doc_id AS doc_a, a.pos AS pos_a,
       |    b.doc_id AS doc_b, b.pos AS pos_b,
       |    CAST(list_max(list_prepend(0,
       |      list_filter(range(1, least(length(a.w), length(b.w)) + 1),
       |        i -> substr(a.w, 1, i) = substr(b.w, 1, i)))) AS BIGINT) AS lcp
       |  FROM sa a JOIN sa b ON b.sa_rank = a.sa_rank + 1)
       |SELECT lcp, lcp = $SaLcpCap AS capped,
       |  doc_a, pos_a, doc_b, pos_b
       |FROM pairs
       |ORDER BY lcp DESC, sa_rank ASC
       |LIMIT 1""".stripMargin
}
