package graft

import org.apache.spark.sql.functions._
import graft.ops.TokenizerOps
import graft.ops.TokenizerOps.UnigramPiece

/** Round-9 operator specs: the unigram-LM tokenizer family — the
  * bounded Viterbi fold against a naive DP reference, the EM-prune
  * trainer's invariants, and the BPE-vs-unigram fertility row.
  */
class Round9OpsSpec extends SparkSuite {
  import spark.implicits._

  /** Naive reference DP with the production cost model: minimize
    * Σ (10⁶ − ⌊log₂ score⌋), candidates scanned longest-first with
    * strict-improve (ties → longer piece), per-char UNK fallback.
    */
  private def naiveSegment(word: String,
      scores: Map[String, Long]): Seq[String] = {
    val INF = Long.MaxValue / 2
    def cost(p: String): Long =
      1000000L - (63 - java.lang.Long.numberOfLeadingZeros(
        math.max(scores.getOrElse(p, 1L), 1L)))
    val n = word.length
    val dp = Array.fill[(Long, List[String])](n + 1)((INF, Nil))
    dp(0) = (0L, Nil)
    for (i <- 1 to n) {
      var best: (Long, List[String]) = (INF, Nil)
      for (l <- TokenizerOps.UniMaxPieceLen to 1 by -1; if i >= l) {
        val piece = word.substring(i - l, i)
        val c =
          if (l == 1)
            if (scores.contains(piece)) cost(piece) else TokenizerOps.UniUnkCost
          else if (scores.contains(piece)) cost(piece)
          else INF
        if (c < INF && dp(i - l)._1 + c < best._1)
          best = (dp(i - l)._1 + c, dp(i - l)._2 :+ piece)
      }
      dp(i) = best
    }
    dp(n)._2
  }

  private val handVocab = Seq(
    UnigramPiece("a", 10), UnigramPiece("b", 8), UnigramPiece("c", 5),
    UnigramPiece("n", 9), UnigramPiece("ba", 20), UnigramPiece("na", 30),
    UnigramPiece("nan", 4), UnigramPiece("ana", 12))

  test("tokenizeUnigram ≡ naive Viterbi DP under a hand vocab") {
    val corpus = Seq(
      (1L, "banana cab", "s1"),
      (2L, "nan ana banana", "s1"),
      (3L, "", "s2"),
      (4L, null.asInstanceOf[String], "s2")
    ).toDF("doc_id", "text", "source")
    val scores = handVocab.map(u => u.piece -> u.score).toMap
    val got = TokenizerOps.tokenizeUnigram(corpus, handVocab)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    def expect(words: String*): (Long, Long) =
      (words.length.toLong,
        words.map(w => naiveSegment(w, scores).length.toLong).sum)
    assert(got(1L) == expect("banana", "cab"))
    assert(got(2L) == expect("nan", "ana", "banana"))
    assert(got(3L) == ((0L, 0L)), "empty doc survives with zero counts")
    assert(got(4L) == ((0L, 0L)), "null doc survives with zero counts")
    // and the hand-checkable classic: banana = [ba, na, na] (3 pieces,
    // not 6 chars) under these scores
    assert(naiveSegment("banana", scores) == Seq("ba", "na", "na"))
  }

  test("unigram segmentation: unknown chars fall back to per-char UNK pieces") {
    val corpus = Seq((1L, "zzz banana", "s")).toDF("doc_id", "text", "source")
    val scores = handVocab.map(u => u.piece -> u.score).toMap
    val got = TokenizerOps.tokenizeUnigram(corpus, handVocab).collect()(0)
    // "zzz" → 3 single-char UNKs (multi-char pieces outside the vocab
    // are inadmissible), banana → 3 pieces
    assert(got.getAs[Long]("n_tokens") == 3L + 3L)
  }

  test("byte fallback: planted OOV decomposes to UTF-8 bytes, rate surfaces") {
    // "zzß日" outside the hand vocab: z (1 byte), z, ß (2 bytes),
    // 日 (3 bytes) → 4 fallback chars, 7 fallback bytes; banana → 3
    // vocab pieces → n_tokens = 3 + 7
    val corpus = Seq((1L, "zzß日 banana", "s"), (2L, "banana", "s"))
      .toDF("doc_id", "text", "source")
    val got = TokenizerOps.tokenizeUnigramByteFb(corpus, handVocab)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_tokens") === 10L)
    assert(got(1L).getAs[Long]("n_fallback_chars") === 4L)
    assert(got(1L).getAs[Long]("n_fallback_bytes") === 7L)
    // rate = floor(7e6/10) = 700000 micros
    assert(got(1L).getAs[Long]("fb_rate_micro") === 700000L)
    // fully-covered doc: zero fallback, counts agree with tokenizeUnigram
    assert(got(2L).getAs[Long]("n_fallback_bytes") === 0L)
    assert(got(2L).getAs[Long]("n_tokens") === 3L)
    assert(got(2L).getAs[Long]("fb_rate_micro") === 0L)
    // with full coverage the bytefb and plain faces agree everywhere
    val plain = TokenizerOps.tokenizeUnigram(corpus.filter(col("doc_id") === 2L),
      handVocab).collect()(0).getAs[Long]("n_tokens")
    assert(plain === 3L)
  }

  test("unigramTrain: deterministic, covers every corpus char, respects prune caps") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val v1 = TokenizerOps.unigramTrain(docs)
    val v2 = TokenizerOps.unigramTrain(docs)
    assert(v1 == v2, "training must be deterministic")
    val pieces = v1.map(_.piece).toSet
    // every char of every tokenized word is in the vocab (coverage —
    // the reason chars are never pruned)
    val wordChars = graft.ops.TextOps.tokenize(docs)
      .select(explode(col("toks")).as("w")).filter(col("w") =!= "")
      .select(explode(split(col("w"), "")).as("c"))
      .distinct().as[String].collect().toSet
    assert(wordChars.nonEmpty) // fixture sanity
    assert(wordChars.subsetOf(pieces),
      s"missing chars: ${wordChars -- pieces}")
    val multi = v1.filter(_.piece.length > 1)
    assert(multi.nonEmpty, "the corpus must yield learned multi-char pieces")
    assert(multi.size <= TokenizerOps.UniPruneSizes.last)
    assert(v1.forall(_.piece.length <= TokenizerOps.UniMaxPieceLen))
  }

  test("unigramTrain learns a planted dominant piece and tokenizes with it") {
    // one word dominates the corpus → its 4-gram prefix must survive the
    // prune and the word must segment into ⌈len/4⌉ pieces, not chars
    val docs = (1L to 50L).map(i => (i, "abcdabcd extra", "s"))
      .toDF("doc_id", "text", "source")
    val vocab = TokenizerOps.unigramTrain(docs)
    assert(vocab.exists(u => u.piece == "abcd" && u.score > 0),
      s"expected 'abcd' in $vocab")
    val counts = TokenizerOps.tokenizeUnigram(docs, vocab).collect()(0)
    val scores = vocab.map(u => u.piece -> u.score).toMap
    assert(naiveSegment("abcdabcd", scores) == Seq("abcd", "abcd"))
    assert(counts.getAs[Long]("n_tokens") ==
      2L + naiveSegment("extra", scores).length)
  }

  test("unigramTrain degenerate: empty corpus → empty vocab") {
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(TokenizerOps.unigramTrain(empty).isEmpty)
    // tokenizing under an empty vocab still totals (per-char UNKs)
    val docs = Seq((1L, "ab", "s")).toDF("doc_id", "text", "source")
    val got = TokenizerOps.tokenizeUnigram(docs, Seq.empty).collect()(0)
    assert(got.getAs[Long]("n_tokens") == 2L)
  }

  test("tokenizer_fertility_compare: both tokenizers ≥ 1 token/word; unigram ≤ char-split") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = TokenizerOps.bpeTrain(docs, TokenizerOps.NumMerges)
    val vocab = TokenizerOps.unigramTrain(docs)
    val rows = TokenizerOps.tokenizerFertilityCompare(docs, merges, vocab)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      if (nWords > 0) {
        // every word is ≥ 1 piece under either tokenizer
        assert(r.getAs[Long]("bpe_fertility_micro") >= 1000000L)
        assert(r.getAs[Long]("unigram_fertility_micro") >= 1000000L)
        // each word is at least one piece under either tokenizer
        assert(r.getAs[Long]("bpe_tokens") >= nWords)
        assert(r.getAs[Long]("unigram_tokens") >= nWords)
      }
    }
  }
}
