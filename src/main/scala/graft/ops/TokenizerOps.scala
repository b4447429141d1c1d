package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training over the corpus — the step a training-data
  * pipeline runs BEFORE token counting/packing means anything: learn the
  * merge table from the data (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"). Spark-native shape:
  * the corpus collapses to its DISTINCT-WORD frequency table once (Zipf
  * makes it orders of magnitude smaller than the corpus — this is why
  * classic BPE trainers are feasible at all), then every merge iteration
  * is one pair-count aggregation over that small vocab table plus a
  * 1-row argmax to the driver — the same driver-decides/executors-count
  * loop as [[SimilarityOps]]' k-means (`ivfTrain`).
  *
  * Oracle surface: [[bpePairCounts]] (iteration #1's full pair-count
  * table — its argmax IS the first merge) has a DuckDB twin;
  * [[bpeTrain]] is the iterative driver loop, spec-keyed on the
  * canonical low/lower/newest/widest example.
  */
object TokenizerOps {
  import TextOps.{sqlTokens, tokens}
  import DedupOps.fanout

  /** Distinct-word frequency table (word, cnt) — one map-side-combined
    * agg; the '' token (empty/null docs) carries no pairs and is cut.
    */
  private def wordFreq(docs: DataFrame): DataFrame =
    fanout(docs).select(explode_outer(tokens(col("text"))).as("word"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs of a symbol-array column, zipped IN-ROW. */
  private def pairCol(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("p1"), b.as("p2")))

  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"), explode_outer(pairCol(col("syms"))).as("p"))
      .filter(col("p").isNotNull)
      .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
      .agg(sum(col("cnt")).as("cnt"))

  /** BPE iteration #1's pair statistics: adjacent CHARACTER-pair counts
    * over the char-split corpus vocabulary, weighted by word frequency.
    * The argmax of this table is the first merge; the full table is the
    * oracle-checkable face of the training loop. Single-char words carry
    * no pairs and are absent.
    */
  def bpePairCounts(docs: DataFrame): DataFrame =
    pairCounts(wordFreq(docs).withColumn("syms", split(col("word"), "")))

  def sqlBpePairCounts: String =
    s"""WITH w AS (
       |  SELECT word, count(*) AS cnt FROM (
       |    SELECT unnest(${sqlTokens("text")}) AS word FROM documents)
       |  WHERE word <> '' GROUP BY word),
       |s AS (SELECT cnt, string_split(word, '') AS c FROM w),
       |p AS (
       |  SELECT cnt,
       |    unnest(list_slice(c, 1, len(c) - 1)) AS p1,
       |    unnest(list_slice(c, 2, len(c))) AS p2
       |  FROM s WHERE len(c) >= 2)
       |SELECT p1, p2, CAST(sum(cnt) AS BIGINT) AS cnt
       |FROM p GROUP BY p1, p2""".stripMargin

  /** Greedy left-to-right merge of pair (a, b) inside a symbol array —
    * the canonical BPE application order ("aaa" + (a,a) → [aa, a]): a
    * left fold that either fuses the incoming symbol into the
    * accumulator's tail or appends it.
    */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, size(acc)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** One learned merge: (left symbol, right symbol, weighted count). */
  final case class BpeMerge(p1: String, p2: String, count: Long)

  /** Train `nMerges` BPE merges on the corpus. Each iteration: one
    * pair-count agg over the (cached, vocab-sized) word table, ONE row
    * collected to the driver (the argmax, ties broken lexicographically
    * for determinism), then a narrow in-row merge rewrite of the symbol
    * column, re-materialized per step so the plan stays flat (the table
    * is Zipf-small — this is metadata-scale, not corpus-scale, work).
    * Stops early when no adjacent pair remains.
    */
  def bpeTrain(docs: DataFrame, nMerges: Int): Seq[BpeMerge] = {
    var vocab = DedupOps.materialize(
      wordFreq(docs).withColumn("syms", split(col("word"), "")), "bpe_vocab")
    val merges = Seq.newBuilder[BpeMerge]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("p1"), col("p2")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(a, b, c)
        val prev = vocab
        vocab = DedupOps.materialize(
          vocab.withColumn("syms", mergePair(col("syms"), a, b)), s"bpe_vocab_$i")
        vocab.count() // force the new table before freeing its parent
        prev.unpersist()
        ()
      }
      i += 1
    }
    vocab.unpersist()
    merges.result()
  }
}
