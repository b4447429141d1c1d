package graft

import graft.ops.{PostTrainOps, TextOps}
import org.apache.spark.sql.functions._

class PostTrainOpsSpec extends SparkSuite {
  import spark.implicits._

  private val H = 3600L * 1000000 // one hour in micros
  private def ev(id: Long, user: Long, tUs: Long, typ: String) =
    (id, new java.sql.Timestamp(tUs / 1000), user, typ, 1.0, "{}")

  private def eventsDf(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("chat_render: exact template bytes, spans cover exactly the assistant content+newline") {
    val t0 = 1700000000L * 1000000
    val rows = Seq( // one user, one session, 3 turns: user/assistant/user
      ev(1, 1, t0, "hello"), ev(2, 1, t0 + H, "reply"), ev(3, 1, t0 + 2 * H, "bye"))
    val got = PostTrainOps.chatRender(eventsDf(rows))
      .select("rendered", "mask_spans", "n_chars", "n_mask_chars", "n_turns", "n_dropped")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (rendered, spans, nChars, nMask, nTurns, nDropped) = got.head
    val expect = "<|user|>\nhello\n<|assistant|>\nreply\n<|user|>\nbye\n"
    assert(rendered == expect, s"got <$rendered>")
    assert(nChars == expect.length.toLong && nTurns == 3L && nDropped == 0L)
    // the single assistant turn: content 'reply' + trailing newline
    val Array(a, b) = spans.split(":").map(_.toInt)
    assert(rendered.substring(a, b) == "reply\n", s"span [$a:$b) = <${rendered.substring(a, b)}>")
    assert(nMask == 6L)
  }

  test("chat_render: a user-only session has empty mask; multi-assistant spans are disjoint and in order") {
    val t0 = 1700000000L * 1000000
    val solo = Seq(ev(1, 5, t0, "ping")) // 1 turn -> no assistant
    val four = (0 until 4).map(i => ev(10 + i, 6, t0 + i * 60L * 1000000, s"m$i"))
    val got = PostTrainOps.chatRender(eventsDf(solo ++ four))
      .select("user_id", "rendered", "mask_spans", "n_mask_chars")
      .as[(Long, String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(5L)._3 == "" && got(5L)._4 == 0L)
    val (_, rendered, spans, nMask) = got(6L)
    val parsed = spans.split(",").map { s =>
      val Array(a, b) = s.split(":").map(_.toInt); (a, b)
    }
    assert(parsed.length == 2) // turns 2 and 4 are assistant
    assert(parsed.map { case (a, b) => rendered.substring(a, b) }.toSeq ==
      Seq("m1\n", "m3\n"))
    assert(parsed.sliding(2).forall { case Array((_, b1), (a2, _)) => b1 <= a2; case _ => true })
    assert(nMask == parsed.map { case (a, b) => b - a }.sum.toLong)
  }

  // documents fixture for the preference ops: quality rises with text
  // richness; doc_ids chosen so groups (doc_id % NumPromptGroups) are known
  private def docsDf(rows: Seq[(Long, String)]) =
    TextOps.tokenize(rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long")))

  test("dpo_pairs: chosen=max reward, rejected=min, margin>0 enforced, singleton and tied groups dropped") {
    val G = PostTrainOps.NumPromptGroups
    val rich = "the quick brown fox jumps over the lazy dog and runs far away home"
    val poor = "zzz 123 !!!"
    val mid = "some plain words here that read fine"
    val rows = Seq(
      (0L * G + 1L, poor), (1L * G + 1L, rich), (2L * G + 1L, mid), // group 1: spread
      (0L * G + 2L, rich),                                          // group 2: singleton
      (0L * G + 3L, mid), (1L * G + 3L, mid))                       // group 3: exact tie
    val got = PostTrainOps.dpoPairs(docsDf(rows))
      .select("prompt_id", "chosen_id", "rejected_id", "n_candidates")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 1, s"got ${got.toSeq}")
    val (pid, chosen, rejected, n) = got.head
    assert(pid == 1L && n == 3L)
    assert(chosen == 1L * G + 1L, s"chosen should be the rich doc, got $chosen")
    assert(rejected == 0L * G + 1L, s"rejected should be the poor doc, got $rejected")
  }

  test("best_of_n: winner, exact integer-micros mean, non-negative lift") {
    val G = PostTrainOps.NumPromptGroups
    val rich = "the quick brown fox jumps over the lazy dog and runs far away home"
    val poor = "zzz 123 !!!"
    val rows = Seq((0L * G + 7L, poor), (1L * G + 7L, rich), (2L * G + 7L, poor))
    val got = PostTrainOps.bestOfN(docsDf(rows))
      .select("prompt_id", "doc_id", "n_candidates", "reward", "reward_mean", "lift_micros_x_n")
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(got.length == 1)
    val (pid, winner, n, reward, mean, liftXn) = got.head
    assert(pid == 7L && winner == 1L * G + 7L && n == 3L)
    assert(reward > mean && liftXn > 0L)
    // exact arithmetic: lift×n = winner_micros·n − Σ candidate_micros
    val micros = TextOps.qualityScore(docsDf(rows))
      .select(floor(col("quality") * 1e6).cast("long"))
      .as[Long].collect()
    assert(liftXn == micros.max * n - micros.sum)
    assert(mean == micros.sum.toDouble / n / 1e6)
  }

  test("chat_pack_spans: a straddling assistant span splits across the boundary; mask mass is conserved") {
    val t0 = 1700000000L * 1000000
    val L = graft.ops.PretrainOps.SeqLen
    // one user, one session: user turn, then an assistant turn whose
    // content pushes its span across the SeqLen boundary
    val longMsg = "x" * 300
    val rows = Seq(ev(1, 1, t0, "hi"), ev(2, 1, t0 + 60L * 1000000, longMsg))
    val packed = PostTrainOps.chatPackSpans(eventsDf(rows))
      .select("seq_id", "n_docs", "n_spans", "mask_chars", "mask_spans")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    // rendered = "<|user|>\nhi\n<|assistant|>\n" + 300x + "\n" = 326 chars -> 2 seqs
    assert(packed.map(_._1).toSeq == Seq(0L, 1L))
    val batch = PostTrainOps.chatRender(eventsDf(rows))
      .select("n_mask_chars").as[Long].collect().head
    assert(packed.map(_._4).sum == batch, "mask mass must be conserved by packing")
    // the straddling span: part in seq 0 ending at L, remainder opening seq 1 at 0
    val (a0, b0) = { val Array(a, b) = packed(0)._5.split(":").map(_.toLong); (a, b) }
    val (a1, b1) = { val Array(a, b) = packed(1)._5.split(":").map(_.toLong); (a, b) }
    assert(b0 == L && a1 == 0L, s"split must abut the boundary: got $b0 / $a1")
    assert((b0 - a0) + (b1 - a1) == batch)
  }

  test("chat_pack_spans: fixture invariants — spans in-bounds, sorted, disjoint; all-user sequences keep empty rows") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val L = graft.ops.PretrainOps.SeqLen
    val rows = PostTrainOps.chatPackSpans(events)
      .select("n_spans", "mask_chars", "mask_spans")
      .as[(Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nSpans, maskChars, csv) =>
      val spans = if (csv.isEmpty) Array.empty[(Long, Long)]
        else csv.split(",").map { s =>
          val Array(a, b) = s.split(":").map(_.toLong); (a, b)
        }
      assert(spans.length.toLong == nSpans)
      assert(spans.map { case (a, b) => b - a }.sum == maskChars)
      spans.foreach { case (a, b) =>
        assert(a >= 0 && b <= L && a < b, s"span out of bounds: $a:$b") }
      spans.sliding(2).foreach {
        case Array((_, b1), (a2, _)) => assert(b1 <= a2, "overlap/disorder")
        case _ => ()
      }
    }
    // mask conservation corpus-wide
    val total = PostTrainOps.chatRender(events)
      .agg(sum("n_mask_chars")).as[Long].collect().head
    assert(rows.map(_._2).sum == total)
  }

  test("dpo_pairs_nodup: a pair whose sides are near-duplicates is dropped; dissimilar pairs survive") {
    val G = PostTrainOps.NumPromptGroups
    val base = "the quick brown fox jumps over the lazy dog while rain falls on the quiet town and people walk home slowly past the old stone bridge near the river"
    val rows = Seq(
      // group 1: two near-identical candidates (one word dropped) —
      // different quality (token count), simhash-close -> pair filtered
      (0L * G + 1L, base),
      (1L * G + 1L, base.split(" ").dropRight(1).mkString(" ")),
      // group 2: genuinely different texts -> pair kept
      (0L * G + 2L, base),
      (1L * G + 2L, "zzz 123 !!! qqq"))
    val docs = docsDf(rows)
    val before = PostTrainOps.dpoPairs(docs)
      .select("prompt_id").as[Long].collect().toSet
    assert(before == Set(1L, 2L), s"both groups must pair pre-filter, got $before")
    // precondition: the two group-1 docs ARE a simhash near-dup pair
    val nd = graft.ops.DedupOps.dedupSimhash(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(nd.contains((1L, 1L * G + 1L)),
      s"fixture must make group 1 a near-dup pair, got $nd")
    val after = PostTrainOps.dpoPairsNodup(docs)
      .select("prompt_id").as[Long].collect().toSet
    assert(after == Set(2L), s"near-dup pair must be dropped, got $after")
  }

  test("majority_vote: modal answer wins; tie breaks to the lexicographically larger answer") {
    val G = PostTrainOps.NumPromptGroups
    val rows = Seq(
      // group 1: "yes" x2 vs "no" x1
      (0L * G + 1L, "i think yes"), (1L * G + 1L, "surely Yes"), (2L * G + 1L, "answer no"),
      // group 2: tie "a" vs "b" -> "b" (contract: larger answer)
      (0L * G + 2L, "a"), (1L * G + 2L, "b"),
      // group 3: only empty text -> excluded entirely
      (0L * G + 3L, ""))
    val got = PostTrainOps.majorityVote(docsDf(rows))
      .select("prompt_id", "answer", "n_votes", "n_candidates")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, "yes", 2L, 3L)), s"got ${got.get(1L)}")
    assert(got(2L) == ((2L, "b", 1L, 2L)), s"got ${got.get(2L)}")
    assert(!got.contains(3L))
  }

  test("grpo_advantage: zero-variance and singleton groups yield NULL; spread group sums to ~0 with correct signs") {
    val G = PostTrainOps.NumPromptGroups
    val rich = "the quick brown fox jumps over the lazy dog and runs far away home"
    val poor = "zzz 123 !!!"
    val mid = "some plain words here that read fine"
    val rows = Seq(
      (0L * G + 1L, poor), (1L * G + 1L, rich), (2L * G + 1L, mid), // spread
      (0L * G + 2L, mid), (1L * G + 2L, mid),                       // zero variance
      (0L * G + 3L, rich))                                          // singleton
    val got = PostTrainOps.grpoAdvantage(docsDf(rows))
      .select("prompt_id", "doc_id", "advantage")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((2L, 0L * G + 2L)).isEmpty && got((2L, 1L * G + 2L)).isEmpty)
    assert(got((3L, 0L * G + 3L)).isEmpty)
    val g1 = Seq(0L * G + 1L, 1L * G + 1L, 2L * G + 1L).map(d => got((1L, d)).get)
    assert(math.abs(g1.sum) < 1e-9, s"advantages must center at 0, got $g1")
    assert(got((1L, 1L * G + 1L)).get > 0 && got((1L, 0L * G + 1L)).get < 0,
      "rich doc above the mean, poor below")
  }

  test("quality_calibration: on a mixed corpus the bins spread and pass rate rises with the bin") {
    import graft.ops.TextOps
    val good = "the quick brown fox jumps over the lazy dog while it runs far away from the old town and the people walk home slowly past the stone bridge near the river bank in the evening light with their friends and family all around them talking about the fine day they spent together walking the long road through the green fields and the quiet woods beyond the hill"
    val bad = "zz9 @@ ## !! xx3 %% ^^ qq7 && ** yy1 (( )) kk2 [[ ]] ww8"
    val rows = (0 until 30).map(i => (i.toLong, if (i % 2 == 0) good + s" extra$i" else bad + s" $i"))
    val docs = docsDf(rows)
    val got = TextOps.qualityCalibration(docs)
      .select("bin", "n", "n_pass", "pass_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).sum == 30L)
    assert(got.length >= 2, s"bins must spread on a mixed corpus, got ${got.toSeq}")
    // reliability: the top bin's pass rate strictly exceeds the bottom's
    assert(got.last._4 > got.head._4,
      s"pass rate must rise with the bin, got ${got.toSeq}")
    // and the trained gate actually separates: top bin nearly all pass
    assert(got.last._4 >= 0.9 && got.head._4 <= 0.1, s"got ${got.toSeq}")
  }

  test("contrastive_triplets: planted geometry picks the hard negative; labels partition correctly") {
    import graft.ops.SimilarityOps
    // anchor 1 (label 0) at e1; positive 2 (label 0) very close;
    // hard negative 3 (label 1) close; easy negative 4 (label 1) far
    def v(x: Double, y: Double) =
      Array(x.toFloat, y.toFloat) ++ Array.fill(62)(0f) // centroid dim = 64
    val emb = Seq(
      (1L, v(1.0, 0.00), 0),
      (2L, v(1.0, 0.05), 0),
      (3L, v(1.0, 0.20), 1),
      (4L, v(-1.0, 0.0), 1))
      .toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.contrastiveTriplets(emb)
      .select("anchor_id", "positive_id", "negative_id", "margin")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, pos, neg, margin) = got(1L)
    assert(pos == 2L, s"positive must be the same-label nearest, got $pos")
    assert(neg == 3L, s"negative must be the HARD (nearest diff-label), got $neg")
    assert(margin > 0)
    // the production granularity-∝-N entry point finds the same triplet
    // (blocking granularity must not change WHAT is mined, only cost)
    val auto = SimilarityOps.contrastiveTripletsAuto(emb)
      .select("anchor_id", "positive_id", "negative_id")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(auto(1L) == ((1L, 2L, 3L)), s"auto path diverged: ${auto.get(1L)}")
    // fixture-wide invariants: labels partition, margin consistency
    val fixture = spark.read.parquet(s"$sf/embeddings.parquet")
    val labels = fixture.select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toMap
    val rows = SimilarityOps.contrastiveTriplets(fixture)
      .select("anchor_id", "label", "positive_id", "negative_id", "pos_cos", "neg_cos", "margin")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, lab, p, n2, pc, nc, m) =>
      assert(labels(a) == lab && labels(p) == lab && labels(n2) != lab)
      assert(math.abs(m - (pc - nc)) < 1e-12)
    }
  }

  test("fim_split: PSM segments reconstruct the original tokens; rate and determinism hold") {
    import graft.ops.{PretrainOps, TextOps}
    val docs = TextOps.tokenize(spark.read.parquet(s"$sf/documents.parquet"))
    val rows = PretrainOps.fimSplit(docs)
      .select("doc_id", "fim_applied", "fim_text")
      .as[(Long, Boolean, String)].collect()
    val toksOf = docs.select(col("doc_id"),
        concat_ws(" ", col("toks")).as("joined"))
      .as[(Long, String)].collect().toMap
    assert(rows.nonEmpty)
    val applied = rows.count(_._2)
    // md5 selection: expect ~70%; allow a generous band
    assert(applied > rows.length / 2 && applied < rows.length * 9 / 10,
      s"$applied of ${rows.length} selected")
    rows.foreach { case (id, fim, text) =>
      if (!fim) assert(text == toksOf(id))
      else {
        // <PRE> p <SUF> s <MID> m  ->  p ++ m ++ s == original
        val pre = text.substring(6, text.indexOf(" <SUF> "))
        val suf = text.substring(text.indexOf(" <SUF> ") + 7, text.indexOf(" <MID> "))
        val mid = text.substring(text.indexOf(" <MID> ") + 7)
        val rebuilt = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
        assert(rebuilt == toksOf(id), s"doc $id: <$rebuilt> != <${toksOf(id)}>")
      }
    }
    // determinism: a second run is byte-identical
    val again = PretrainOps.fimSplit(docs)
      .select("doc_id", "fim_applied", "fim_text")
      .as[(Long, Boolean, String)].collect()
    assert(again.toSet == rows.toSet)
  }

  test("validate_corpus: planted violations are counted per rule; clean fixture is all-zero") {
    import org.apache.spark.sql.functions.{col, length, lit, when}
    val planted = Seq(
      (java.lang.Long.valueOf(1L), "ok", "en"),
      (java.lang.Long.valueOf(1L), "dup key", "en"),      // pk_unique x1
      (java.lang.Long.valueOf(1L), "dup key again", "en"), // pk_unique x1 more
      (null.asInstanceOf[java.lang.Long], "no key", "en"), // pk_not_null
      (java.lang.Long.valueOf(2L), null, null))            // text+lang null
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars",
        when(col("doc_id") === 2L, lit(99L)) // also n_chars mismatch? text null -> comparison null, not counted
          .otherwise(length(col("text")).cast("long") + when(col("doc_id").isNull, 5L).otherwise(0L)))
    val got = graft.ops.ProfileOps.validateCorpus(planted)
      .as[(String, Long)].collect().toMap
    assert(got("pk_not_null") == 1L)
    assert(got("pk_unique") == 2L, s"3 rows share key 1 -> 2 extras, got $got")
    assert(got("text_not_null") == 1L)
    assert(got("lang_not_null") == 1L)
    assert(got("n_chars_consistent") == 1L,
      "the null-key row's n_chars is off by 5; the null-text row must NOT count (null comparison)")
    // the shipped fixture is clean
    val fixture = graft.ops.ProfileOps.validateCorpus(
      spark.read.parquet(s"$sf/documents.parquet"))
      .as[(String, Long)].collect().toMap
    assert(fixture.values.forall(_ == 0L), s"fixture violations: $fixture")
  }

  test("corpus_diff: added/removed/changed emitted, unchanged silent") {
    import org.apache.spark.sql.functions.{col, lit, length}
    def mk(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val a = mk(Seq((1L, "same"), (2L, "old"), (3L, "gone")))
    val b = mk(Seq((1L, "same"), (2L, "new"), (4L, "fresh")))
    val got = graft.ops.CorpusOps.corpusDiff(a, b)
      .select("doc_id", "status").as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added")), s"got $got")
  }

  test("chat_render totals: n_mask_chars equals the sum of span widths on the sf fixture") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val bad = PostTrainOps.chatRender(events)
      .withColumn("span_sum", coalesce(aggregate(
        transform(split(col("mask_spans"), ","),
          s => when(s === "", lit(0L)).otherwise(
            element_at(split(s, ":"), 2).cast("long") -
              element_at(split(s, ":"), 1).cast("long"))),
        lit(0L), (a, x) => a + x), lit(0L)))
      .filter(col("span_sum") =!= col("n_mask_chars") ||
        col("n_chars") =!= length(col("rendered")))
      .count()
    assert(bad == 0L)
  }
}
