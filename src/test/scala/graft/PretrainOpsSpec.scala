package graft

import org.apache.spark.sql.functions._
import graft.ops.PretrainOps

/** Specs for the round-3 pre-training corpus operators: planted fixtures
  * with hand-checkable outcomes, plus determinism/invariant checks on the
  * real documents/embeddings tables.
  */
class PretrainOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  // -------------------------------------------------------- decontaminate

  test("decontaminate flags the doc sharing a benchmark 5-gram, not others") {
    val benchText = "alpha beta gamma delta epsilon zeta eta"
    val leaked = "intro words then alpha beta gamma delta epsilon closing"
    val clean = "totally unrelated content with no overlap whatsoever here"
    val planted = Seq(
      (1L, benchText, PretrainOps.BenchmarkSource),
      (2L, leaked, "src1"),
      (3L, clean, "src2")
    ).toDF("doc_id", "text", "source")
    val out = PretrainOps.decontaminate(planted)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    // leaked shares exactly the 5-grams "alpha beta gamma delta epsilon"
    assert(out.keySet == Set(2L), s"only the leaked doc is contaminated: $out")
    assert(out(2L) == 1L)
  }

  test("decontaminate: benchmark docs never appear in the output") {
    val out = PretrainOps.decontaminate(docs)
    val benchIds = docs.filter($"source" === PretrainOps.BenchmarkSource)
      .select("doc_id").as[Long].collect().toSet
    val outIds = out.select("doc_id").as[Long].collect().toSet
    assert(outIds.intersect(benchIds).isEmpty)
    val bad = out.filter($"contamination" < 0 || $"contamination" > 1).count()
    assert(bad == 0)
  }

  test("decontaminate_bloom ≡ decontaminate: the bloom prune is lossless") {
    val benchText = "alpha beta gamma delta epsilon zeta eta"
    val leaked = "intro words then alpha beta gamma delta epsilon closing"
    val clean = "totally unrelated content with no overlap whatsoever here"
    val planted = Seq(
      (1L, benchText, PretrainOps.BenchmarkSource),
      (2L, leaked, "src1"),
      (3L, clean, "src2")
    ).toDF("doc_id", "text", "source")
    val viaBloom = PretrainOps.decontaminateBloom(planted)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    assert(viaBloom == Map(2L -> 1L))
    // and on the real table: row-for-row identical to the exact path
    val exact = PretrainOps.decontaminate(docs).collect().map(_.toSeq).toSet
    val bloom = PretrainOps.decontaminateBloom(docs).collect().map(_.toSeq).toSet
    assert(bloom == exact)
  }

  test("substring_coverage: shared span tokens counted once, unique docs score 0") {
    val span = (1 to PretrainOps.SpanWords).map(i => s"w$i").mkString(" ")
    val planted = Seq(
      (10L, s"a b c $span"),            // 11 tokens, span covers 4..11
      (20L, s"$span x y"),              // 10 tokens, span covers 1..8
      (30L, "no repeats in this entirely unique document text at all ok")
    ).toDF("doc_id", "text")
    val out = PretrainOps.substringCoverage(planted)
      .select("doc_id", "n_tokens", "covered_tokens", "coverage")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(10L) == ((11L, 8L, 8.0 / 11)))
    assert(out(20L) == ((10L, 8L, 0.8)))
    assert(out(30L) == ((11L, 0L, 0.0)))
  }

  test("substring_coverage: one row per doc, coverage within [0,1] on the real table") {
    val out = PretrainOps.substringCoverage(docs).cache()
    try {
      assert(out.count() == docs.count())
      assert(out.filter($"coverage" < 0 || $"coverage" > 1).count() == 0)
      // duplicated corpus: a full copy pushes every copied doc to coverage 1
      val doubled = docs.select($"doc_id", $"text")
        .unionByName(docs.select(($"doc_id" + 100000L).as("doc_id"), $"text"))
      val full = PretrainOps.substringCoverage(doubled)
        .filter($"n_tokens" >= PretrainOps.SpanWords)
      assert(full.filter($"coverage" < 1.0).count() == 0,
        "an exact corpus copy must drive every long-enough doc to full coverage")
    } finally { out.unpersist(); () }
  }

  test("dedup_substring_trim + apply: merged ranges, coalesced overlaps, surviving text") {
    val span = (1 to PretrainOps.SpanWords).map(i => s"w$i").mkString(" ")
    val span9 = (1 to PretrainOps.SpanWords + 1).map(i => s"v$i").mkString(" ")
    val planted = Seq(
      (10L, s"a b c $span"),   // span covers 4..11 of 11
      (20L, s"$span x y"),     // span covers 1..8 of 10
      (30L, "no repeats in this entirely unique document text at all ok"),
      (40L, s"$span9 tail qq"), // two overlapping 8-spans (pos 1, 2) → 1..9
      (50L, s"pre $span9")      // pos 2, 3 → 2..10
    ).toDF("doc_id", "text")
    val trim = PretrainOps.dedupSubstringTrim(planted)
      .select("doc_id", "n_tokens", "n_ranges", "trimmed_tokens",
        "surviving_tokens", "ranges")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(trim(10L) == ((11L, 1L, 8L, 3L, "4-11")))
    assert(trim(20L) == ((10L, 1L, 8L, 2L, "1-8")))
    assert(trim(30L) == ((11L, 0L, 0L, 11L, "")))
    // the two overlapping span occurrences coalesce into ONE range
    assert(trim(40L) == ((11L, 1L, 9L, 2L, "1-9")))
    assert(trim(50L) == ((10L, 1L, 9L, 1L, "2-10")))
    val applied = PretrainOps.dedupSubstringApply(planted)
      .select("doc_id", "n_tokens", "surviving_tokens", "surviving_text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(applied(10L) == ((11L, 3L, "a b c")))
    assert(applied(20L) == ((10L, 2L, "x y")))
    assert(applied(30L) == ((11L, 11L,
      "no repeats in this entirely unique document text at all ok")))
    assert(applied(40L) == ((11L, 2L, "tail qq")))
    assert(applied(50L) == ((10L, 1L, "pre")))
  }

  test("dedup_substring_apply: surviving token count is consistent with trim on the real table") {
    val trim = PretrainOps.dedupSubstringTrim(docs)
      .select("doc_id", "surviving_tokens")
    val app = PretrainOps.dedupSubstringApply(docs)
      .select($"doc_id", $"surviving_tokens".as("app_surviving"))
    val joined = trim.join(app, "doc_id").cache()
    try {
      assert(joined.count() == docs.count())
      assert(joined.filter($"surviving_tokens" =!= $"app_surviving").count() == 0,
        "apply must drop exactly the tokens trim says it trims")
    } finally { joined.unpersist(); () }
  }

  test("sequence_manifest: exact fill accounting across sequence boundaries") {
    def doc(n: Int) = Array.fill(n)("w").mkString(" ")
    // stream per source "s": doc1 [0,300) doc2 [300,400) doc3 [400,600)
    val planted = Seq(
      (1L, doc(300), "s"), (2L, doc(100), "s"), (3L, doc(200), "s")
    ).toDF("doc_id", "text", "source")
    val out = PretrainOps.sequenceManifest(planted)
      .select("seq_id", "n_docs", "filled_tokens", "doc_ids")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) == ((1L, 256L, "1")))
    assert(out(1L) == ((3L, 256L, "1,2,3"))) // 44 + 100 + 112
    assert(out(2L) == ((1L, 88L, "3")))      // the short tail sequence
    // conservation: filled tokens across sequences == stream tokens
    assert(out.values.map(_._2).sum == 600L)
  }

  test("shuffle_shards: deterministic, uniform-ranged, contiguous positions") {
    val a = PretrainOps.shuffleShards(docs)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = PretrainOps.shuffleShards(docs)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b), "shuffle must be reproducible across runs")
    assert(a.length == docs.count())
    assert(a.forall(r => r._2 >= 0 && r._2 < PretrainOps.ShuffleShards))
    // positions within each shard are exactly 0..count-1
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.sameElements(rows.indices.map(_.toLong)),
        s"shard $shard positions not contiguous")
    }
  }

  test("unigram_commonness: hand-checkable rational score") {
    val planted = Seq((1L, "aa aa aa"), (2L, "aa bb")).toDF("doc_id", "text")
    // vocab: aa→4, bb→1, N=5
    val out = PretrainOps.unigramCommonness(planted)
      .select("doc_id", "n_tokens", "sum_counts", "n_total", "commonness")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((3L, 12L, 5L, 12.0 / 15)))
    assert(out(2L) == ((2L, 5L, 5L, 5.0 / 10)))
  }

  test("bpe_train: learns the canonical low/lower/newest/widest merges") {
    import graft.ops.TokenizerOps
    // Sennrich et al.'s worked example: vocab {low:5, lower:2, newest:6,
    // widest:3} → merges (e,s):9, (es,t):9, (l,o):7
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TokenizerOps.bpeTrain(docs, 3)
    assert(merges == Seq(
      TokenizerOps.BpeMerge("e", "s", 9L),
      TokenizerOps.BpeMerge("es", "t", 9L),
      TokenizerOps.BpeMerge("l", "o", 7L)), s"got $merges")
    // pair_counts is iteration #1's table: its argmax is the first merge
    val first = TokenizerOps.bpePairCounts(docs)
      .orderBy(col("cnt").desc, col("p1"), col("p2")).limit(1)
      .as[(String, String, Long)].head()
    assert(first == (("e", "s", 9L)))
    // pair counts are per POSITION ("aaa" → (a,a) at two positions), but
    // the merge applies greedily left-to-right: "aaa" + (a,a) → [aa, a],
    // so the next round learns (aa,a) — never (a,aa)
    val aaa = Seq((1L, "aaa")).toDF("doc_id", "text")
    assert(TokenizerOps.bpeTrain(aaa, 2) == Seq(
      TokenizerOps.BpeMerge("a", "a", 2L),
      TokenizerOps.BpeMerge("aa", "a", 1L)))
    // exhaustion: training stops when no pairs remain
    assert(TokenizerOps.bpeTrain(Seq((1L, "ab")).toDF("doc_id", "text"), 5)
      .length == 1)
  }

  test("tokenize_bpe: learned merges applied per word, counts feed packing") {
    import graft.ops.TokenizerOps
    // Sennrich worked example, applied: after (e,s),(es,t),(l,o) the
    // vocab tokenizes low→[lo,w], lower→[lo,w,e,r], newest→[n,e,w,est],
    // widest→[w,i,d,est]
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, "web", text), (2L, "web", ""), (3L, "web", null))
      .toDF("doc_id", "source", "text")
    val merges = TokenizerOps.bpeTrain(docs, 3)
    val out = TokenizerOps.tokenizeBpe(docs, merges)
      .select("doc_id", "n_words", "n_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((16L, 5 * 2 + 2 * 4 + 6 * 4 + 3 * 4L)), s"got $out")
    // empty and null docs survive as zero-token rows (loader manifests
    // must see every doc), not vanish
    assert(out(2L) == ((0L, 0L)) && out(3L) == ((0L, 0L)))
    // no merges learned (degenerate corpus) → char tokenization
    val solo = Seq((1L, "s", "ab cd")).toDF("doc_id", "source", "text")
    assert(TokenizerOps.tokenizeBpe(solo, Nil)
      .select("n_tokens").as[Long].head() == 4L)
    // packing by BPE counts goes through packTokenCounts unchanged:
    // doc1's 54 tokens then doc2/doc3's empties → tok_start carries over
    val packed = TokenizerOps.packSequencesBpe(docs, merges)
      .select("doc_id", "tok_start", "n_tokens")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(packed(1L) == ((0L, 54L)) && packed(2L) == ((54L, 0L)))
  }

  test("quality_trigram_fluency: interpolated micros, hand-computed") {
    // corpus: doc1 = x y x y x, doc2 = a b (no trigrams → absent).
    // counts: c3(x,y,x)=2 d3(x,y)=2, c3(y,x,y)=1 d3(y,x)=1;
    // c2(x,y)=2 d2(x)=2, c2(y,x)=2 d2(y)=2, c2(a,b)=1; c1: x=3,y=2,a=1,b=1, N=7.
    // (x,y,x): (6*1000000 + 3*1000000 + 3000000//7) // 10 = 942857  (×2)
    // (y,x,y): (6*1000000 + 3*1000000 + 2000000//7) // 10 = 928571
    val planted = Seq((1L, "x y x y x"), (2L, "a b")).toDF("doc_id", "text")
    val out = PretrainOps.qualityTrigramFluency(planted)
      .select("doc_id", "n_trigrams", "sum_micro")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(1L -> ((3L, 942857L * 2 + 928571L))), s"got $out")
  }

  test("sample_reservoir: exact per-stratum count, deterministic, group-limited plan") {
    val planted = ((1 to 60).map(i => (i.toLong, "en", "web")) ++
      (61 to 70).map(i => (i.toLong, "fr", "web")))
      .toDF("doc_id", "lang", "source")
    val out = PretrainOps.sampleReservoir(planted)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // a stratum larger than N caps at N; a smaller one survives whole
    assert(counts == Map("en" -> PretrainOps.ReservoirN, "fr" -> 10L))
    // deterministic: the sampled ID set is a pure function of the data
    val ids1 = out.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = PretrainOps.sampleReservoir(planted)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // rank<=N over the keyed window must plan as WindowGroupLimit
    // (per-partition top-N before the shuffle — the 100 TB shape)
    assert(out.queryExecution.optimizedPlan.toString.contains("WindowGroupLimit"),
      out.queryExecution.optimizedPlan.toString)
  }

  test("quality_bigram_fluency: exact conditional-probability micros") {
    // corpus: doc1 = x y x y x (transitions deterministic given doc2's
    // additions: x→{y:2, q:1}, y→{x:2, r:1}); doc2 = x q y r
    val planted = Seq((1L, "x y x y x"), (2L, "x q y r")).toDF("doc_id", "text")
    val out = PretrainOps.qualityBigramFluency(planted)
      .select("doc_id", "n_bigrams", "sum_micro")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc1: 4 bigrams, each P = 2/3 → 666666 micro (integer div)
    assert(out(1L) == ((4L, 4 * 666666L)))
    // doc2: x→q 1/3, q→y 1/1, y→r 1/3 → 333333 + 1000000 + 333333
    assert(out(2L) == ((3L, 1666666L)))
    // single-token and empty docs have no bigrams and are absent
    val tiny = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(PretrainOps.qualityBigramFluency(tiny).count() == 0)
  }

  test("bigram rungs tolerate a 0-token pre-tokenized doc (guarded slice)") {
    // raw tokens("") is never empty (split yields [""]), but a shared
    // token table can legally carry a 0-token array (a filtered toks
    // column); slice(toks, 1, size-1) throws on the negative length
    // without the greatest(…, 0) clamp the trigram-local path had
    // before the r13 bigram-cache sharing (round-14 ADVICE)
    val planted = Seq((1L, Seq.empty[String]), (2L, Seq("x", "y", "x")))
      .toDF("doc_id", graft.ops.TextOps.ToksCol)
    val counts = PretrainOps.bigramCounts(planted)
      .as[(String, String, Long)].collect().toSet
    assert(counts === Set(("x", "y", 1L), ("y", "x", 1L)))
  }

  test("embed_covariance: hand-checkable moments, upper triangle only") {
    val planted = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val out = PretrainOps.embedCovariance(planted)
      .select("dim_i", "dim_j", "n", "sum_xy_micro", "cov")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // dims (1,2),(3,4): E[xy] moments 10/2, 14/2, 20/2; all covs = 1
    assert(out.keySet == Set((0L, 0L), (0L, 1L), (1L, 1L)))
    assert(out((0L, 0L)) == ((2L, 10000000L, 1.0)))
    assert(out((0L, 1L)) == ((2L, 14000000L, 1.0)))
    assert(out((1L, 1L)) == ((2L, 20000000L, 1.0)))
    // real table: exactly D(D+1)/2 rows, diagonal variance non-negative
    val real = PretrainOps.embedCovariance(emb).cache()
    try {
      val d = emb.select(size(col("embedding"))).as[Int].head().toLong
      assert(real.count() == d * (d + 1) / 2)
      assert(real.filter($"dim_i" === $"dim_j" && $"cov" < 0).count() == 0,
        "diagonal of a covariance matrix must be non-negative")
    } finally { real.unpersist(); () }
  }

  test("decontaminate_bloom: empty benchmark split → empty output, no failure") {
    val planted = Seq(
      (1L, "some ordinary training document with enough words here", "src1"),
      (2L, "another one with different content entirely for this", "src2")
    ).toDF("doc_id", "text", "source")
    assert(PretrainOps.decontaminateBloom(planted).count() == 0)
    assert(PretrainOps.decontaminate(planted).count() == 0)
  }

  // ------------------------------------------------------ dedup_substring

  test("dedup_substring finds the span shared by two docs") {
    val span = (1 to PretrainOps.SpanWords).map(i => s"w$i").mkString(" ")
    val planted = Seq(
      (10L, s"prefix one two three $span"),
      (20L, s"$span suffix tokens here"),
      (30L, "nothing shared with anyone in this document at all ok")
    ).toDF("doc_id", "text")
    val out = PretrainOps.dedupSubstring(planted)
      .select("n_docs", "rep_doc_id").as[(Long, Long)].collect()
    assert(out.nonEmpty, "the shared 8-word span must surface")
    assert(out.forall { case (n, rep) => n == 2L && rep == 10L })
  }

  test("dedup_substring: unique corpus → empty; duplicated corpus → hits") {
    val unique = (1 to 3).map(i =>
      (i.toLong, (0 until 20).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(PretrainOps.dedupSubstring(unique).count() == 0)
  }

  // ------------------------------------------------------------ pii_count

  test("pii_count counts each category and flags has_pii") {
    val planted = Seq(
      (1L, "contact me at alice@example.com or https://ex.com/x and +1 555-123-4567"),
      (2L, "server at 10.0.0.1 with id 1234567890"),
      (3L, "perfectly clean text with no sensitive payloads at all")
    ).toDF("doc_id", "text")
    val out = PretrainOps.piiCount(planted)
      .select("doc_id", "n_emails", "n_urls", "n_phones", "n_ips", "n_longnums", "has_pii")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1L, 0L, 0L, true)))
    assert(out(2L) == ((2L, 0L, 0L, 0L, 1L, 1L, true)))
    assert(out(3L) == ((3L, 0L, 0L, 0L, 0L, 0L, false)))
  }

  // --------------------------------------------------- quality_repetition

  test("quality_repetition: spam doc gates out, diverse doc passes") {
    val spam = (1 to 30).map(_ => "buy").mkString(" ")
    val diverse = (1 to 30).map(i => s"tok$i").mkString(" ")
    val planted = Seq((1L, spam), (2L, diverse)).toDF("doc_id", "text")
    val out = PretrainOps.qualityRepetition(planted)
      .select("doc_id", "top_token_ratio", "dup_2gram_ratio", "is_repetitive")
      .as[(Long, Double, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1.0 && out(1L)._4, "all-same-token doc is repetitive")
    assert(out(1L)._3 > 0.9, "spam 2-grams are all duplicates")
    assert(out(2L)._2 < 0.1 && !out(2L)._4, "all-distinct doc is not repetitive")
    assert(out(2L)._3 == 0.0)
  }

  // ---------------------------------------------------- sample_stratified

  test("sample_stratified is deterministic, respects per-lang rates") {
    val a = PretrainOps.sampleStratified(docs).select("doc_id").as[Long].collect().toSet
    val b = PretrainOps.sampleStratified(docs).select("doc_id").as[Long].collect().toSet
    assert(a == b, "no RNG: the sample is a pure function of doc_id")
    val out = PretrainOps.sampleStratified(docs)
    assert(out.filter($"bucket" >= $"keep_rate").count() == 0)
    // rate-100 stratum is kept in full
    val zhAll = docs.filter($"lang" === "zh").count()
    val zhKept = out.filter($"lang" === "zh").count()
    assert(zhKept == zhAll, s"zh keep-rate is 100%: $zhKept of $zhAll")
    // weights invert the keep rate
    assert(out.filter($"weight" =!= lit(100.0) / $"keep_rate").count() == 0)
    // the en stratum is actually downsampled on the real table
    val enAll = docs.filter($"lang" === "en").count()
    val enKept = out.filter($"lang" === "en").count()
    assert(enKept < enAll, s"en keep-rate 20% must drop docs: $enKept of $enAll")
  }

  // ------------------------------------------------------- pack_sequences

  test("pack_sequences: boundary-straddling doc spans two sequences") {
    val L = PretrainOps.SeqLen
    val planted = Seq(
      (1L, (1 to 300).map(i => s"t$i").mkString(" "), "sA"),
      (2L, (1 to 10).map(i => s"u$i").mkString(" "), "sA"),
      (3L, "five tokens in this doc", "sB")
    ).toDF("doc_id", "text", "source")
    val out = PretrainOps.packSequences(planted)
      .select("doc_id", "tok_start", "seq_start", "seq_end", "seq_offset")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 0L, 0L, (300 - 1) / L, 0L)))
    assert(out(2L) == ((2L, 300L, 300 / L, (309) / L, 300 % L)))
    assert(out(3L) == ((3L, 0L, 0L, 0L, 0L)))
  }

  test("pack_sequences invariants on the real table") {
    val out = PretrainOps.packSequences(docs)
    assert(out.count() == docs.count(), "every doc is packed")
    assert(out.filter($"seq_offset" =!= pmod($"tok_start", lit(PretrainOps.SeqLen)))
      .count() == 0)
    assert(out.filter($"seq_end" < $"seq_start").count() == 0)
    // per source the token stream is gapless: sum of lengths = max end
    val bySrc = out.groupBy("source")
      .agg(sum("n_tokens").as("total"), max($"tok_start" + $"n_tokens").as("hi"))
    assert(bySrc.filter($"total" =!= $"hi").count() == 0)
  }

  // ------------------------------------------------------- sample_mixture

  test("sample_mixture realizes the target token mixture") {
    // src1 targets 3× the weight of an unnamed source; planted totals make
    // src1 the binding constraint (rate exactly 1) and sX rate = 1/9
    val planted = Seq(
      (1L, (1 to 10).map(i => s"a$i").mkString(" "), "src1"),
      (2L, (1 to 30).map(i => s"b$i").mkString(" "), "sX")
    ).toDF("doc_id", "text", "source")
    val rates = PretrainOps.sampleMixture(planted)
      .select("source", "keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(math.abs(rates("src1") - 1.0) < 1e-9, s"binding source keeps all: $rates")
    // rate_sX = t_sX · min(T_u/t_u) / T_sX = 1 · (10/3) / 30 = 1/9
    assert(!rates.contains("sX") || math.abs(rates("sX") - 1.0 / 9) < 1e-9)
  }

  test("sample_mixture is deterministic and rate-consistent on the real table") {
    val a = PretrainOps.sampleMixture(docs).select("doc_id").as[Long].collect().toSet
    val b = PretrainOps.sampleMixture(docs).select("doc_id").as[Long].collect().toSet
    assert(a == b, "no RNG: the sample is a pure function of doc_id")
    val out = PretrainOps.sampleMixture(docs)
    assert(out.filter($"bucket" >= $"keep_rate" * 1000000.0).count() == 0)
    assert(out.filter($"keep_rate" > 1.0 || $"keep_rate" <= 0.0).count() == 0)
    assert(out.filter($"weight" =!= lit(1.0) / $"keep_rate").count() == 0)
    // at least one source is the binding constraint (keep-rate ~ 1)
    val maxRate = out.agg(max("keep_rate")).as[Double].head()
    assert(maxRate > 1.0 - 1e-9, s"binding source keeps (almost) all: $maxRate")
  }

  test("span_corruption: one span per full window, in-window, deterministic, 15% rate") {
    val planted = Seq(
      (1L, (1 to 45).map("w" + _).mkString(" ")), // 2 full windows + 5-token tail
      (2L, (1 to 19).map("w" + _).mkString(" ")), // < one window → no spans
      (3L, (1 to 40).map("w" + _).mkString(" "))  // exactly 2 windows
    ).toDF("doc_id", "text")
    val out = PretrainOps.spanCorruption(planted)
      .select("doc_id", "span_id", "span_start", "span_len", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    val byDoc = out.groupBy(_._1)
    assert(!byDoc.contains(2L), "sub-window doc must emit no spans")
    assert(byDoc(1L).map(_._2).sorted.toSeq == Seq(0L, 1L))
    assert(byDoc(3L).map(_._2).sorted.toSeq == Seq(0L, 1L))
    for ((_, spans) <- byDoc; (_, w, start, len, _) <- spans) {
      assert(len == PretrainOps.SpanLen)
      // the span sits fully inside its window → spans never overlap
      assert(start >= w * PretrainOps.SpanWindow)
      assert(start + len <= (w + 1) * PretrainOps.SpanWindow)
    }
    // deterministic: a second run emits identical masks
    val again = PretrainOps.spanCorruption(planted)
      .select("doc_id", "span_id", "span_start", "span_len", "n_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.toSet == again.toSet)
    // realized rate on full windows = SpanLen/SpanWindow = 15%
    assert(byDoc(3L).map(_._4).sum.toDouble / 40 == 0.15)
  }

  test("contamination_report: per-benchmark-item leakage, zero-leak items present with zeros") {
    val leaked = "alpha beta gamma delta epsilon zeta eta theta" // 8 words = one 8-gram
    val clean = "uno dos tres cuatro cinco seis siete ocho"
    val planted = Seq(
      (90L, leaked, PretrainOps.BenchmarkSource),  // burned: quoted by 2 train docs
      (91L, clean, PretrainOps.BenchmarkSource),   // never leaked
      (1L, s"intro words here then $leaked and a tail", "src1"),
      (2L, s"$leaked completely different continuation", "src2"),
      (3L, "unrelated training content entirely its own", "src1")
    ).toDF("doc_id", "text", "source")
    val out = PretrainOps.contaminationReport(planted)
      .select("doc_id", "n_grams", "n_leaked_grams", "n_train_docs", "leakage")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // one row per benchmark item, hit or not
    assert(out.keySet == Set(90L, 91L), s"got $out")
    // 90's single 8-gram appears in train docs 1 and 2 → fully burned
    assert(out(90L) == ((1L, 1L, 2L, 1.0)), s"got ${out(90L)}")
    // 91 is untouched but still reported
    assert(out(91L) == ((1L, 0L, 0L, 0.0)), s"got ${out(91L)}")
  }

  test("sample_temperature flattens shares: rate = sqrt(t_min/t_s), smallest source keeps all") {
    // planted totals 10 / 40 / 90 tokens → rates 1, 1/2, 1/3
    val planted = Seq(
      (1L, (1 to 10).map(i => s"a$i").mkString(" "), "small"),
      (2L, (1 to 40).map(i => s"b$i").mkString(" "), "mid"),
      (3L, (1 to 90).map(i => s"c$i").mkString(" "), "big")
    ).toDF("doc_id", "text", "source")
    val rates = PretrainOps.sampleTemperature(planted)
      .select("source", "keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(math.abs(rates("small") - 1.0) < 1e-12, s"smallest keeps all: $rates")
    assert(!rates.contains("mid") || math.abs(rates("mid") - 0.5) < 1e-12)
    assert(!rates.contains("big") || math.abs(rates("big") - 1.0 / 3) < 1e-12)
    // rate law on the real table: keep_rate is EXACTLY sqrt(t_min/t_s)
    // per source (the sf0.001 sources are near-uniform, so a realized-
    // share assertion would drown in bucket-sampling noise — the law
    // itself is the checkable thing; the planted case above covers the
    // flattening direction)
    val totals = PretrainOps.mixTokenTotals(docs).as[(String, Long)].collect().toMap
    val tmin = totals.values.min
    val realRates = PretrainOps.sampleTemperature(docs)
      .select("source", "keep_rate").distinct()
      .as[(String, Double)].collect().toMap
    assert(realRates.nonEmpty)
    for ((s, r) <- realRates)
      assert(r == math.sqrt(tmin.toDouble / totals(s).toDouble),
        s"rate law broken for $s")
    // determinism + bucket consistency (pure function of doc_id)
    val out = PretrainOps.sampleTemperature(docs)
    assert(out.filter($"bucket" >= $"keep_rate" * 1000000.0).count() == 0)
    assert(out.filter($"weight" =!= lit(1.0) / $"keep_rate").count() == 0)
  }

  // --------------------------------------------------------- domain_stats

  test("domain_stats aggregates per source with exact token totals") {
    val planted = Seq(
      (1L, "the of and to one two", "en", "sA"),
      (2L, "three four", "en", "sA"),
      (3L, "cinco seis siete", "es", "sA"),
      (4L, "eight nine ten", "en", "sB")
    ).toDF("doc_id", "text", "lang", "source")
    val out = PretrainOps.domainStats(planted)
      .select("source", "n_docs", "n_langs", "sum_tokens", "n_scored")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("sA") == (("sA", 3L, 2L, 11L, 3L)))
    assert(out("sB") == (("sB", 1L, 1L, 3L, 1L)))
    val mq = PretrainOps.domainStats(planted)
      .filter($"mean_quality" < 0 || $"mean_quality" > 1).count()
    assert(mq == 0)
  }

  test("domain_stats covers every source once on the real table") {
    val out = PretrainOps.domainStats(docs)
    assert(out.count() == docs.select("source").distinct().count())
    assert(out.agg(sum("n_docs")).as[Long].head() == docs.count())
  }

  // ------------------------------------------------------ embed_normalize

  test("embed_normalize yields unit vectors; zero vector → no rows") {
    val out = PretrainOps.embedNormalize(emb)
    val norms = out.groupBy("vec_id").agg(sqrt(sum($"u" * $"u")).as("unit_norm"))
    assert(norms.filter(abs($"unit_norm" - 1.0) > 1e-9).count() == 0,
      "every normalized vector has L2 norm 1")
    assert(out.groupBy("vec_id").count().filter($"count" =!= 64).count() == 0,
      "one row per dimension")
    val zeroVec = Seq((99L, Array.fill(4)(0.0f), 0)).toDF("vec_id", "embedding", "label")
    assert(PretrainOps.embedNormalize(zeroVec).count() == 0,
      "zero vector is filtered, never an Inf/NaN unit vector")
  }

  // ------------------------------------------------------- embed_quantize

  test("embed_quantize: |qv| ≤ 127, max hits 127, dequant error ≤ half step") {
    val out = PretrainOps.embedQuantize(emb).cache()
    try {
      assert(out.filter(abs($"qv") > 127).count() == 0)
      // the max-|x| element of every vector maps to ±127 exactly
      val tops = out.groupBy("vec_id").agg(max(abs($"qv")).as("m"))
      assert(tops.filter($"m" =!= 127).count() == 0)
      val orig = emb.select($"vec_id", posexplode(
          transform($"embedding", x => x.cast("double"))))
        .select($"vec_id", $"pos".cast("long").as("dim_idx"), $"col".as("x"))
      val err = out.join(orig, Seq("vec_id", "dim_idx"))
        .filter(abs($"x" * $"scale" - $"qv") > 0.5 + 1e-9)
      assert(err.count() == 0, "every element quantizes within half a step")
    } finally { out.unpersist(); () }
  }

  test("embed_quantize: zero vector → no rows") {
    val zeroVec = Seq((7L, Array.fill(4)(0.0f), 0)).toDF("vec_id", "embedding", "label")
    assert(PretrainOps.embedQuantize(zeroVec).count() == 0)
  }
}
