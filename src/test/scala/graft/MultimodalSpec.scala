package graft

import org.apache.spark.sql.functions._
import graft.ops.{BinaryOps, TextOps}

/** Specs for the multimodal resize/frame-sample/feature ops and text-op
  * edges not covered elsewhere.
  */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("resize plan: output fits the box, aspect ratio preserved within integer truncation") {
    val out = BinaryOps.multimodalResize(spark, docs)
    assert(out.count() == docs.count())
    assert(out.filter($"out_w" > BinaryOps.ResizeBox || $"out_h" > BinaryOps.ResizeBox).count() == 0)
    // the long side always hits the box exactly
    assert(out.filter(greatest($"out_w", $"out_h") =!= BinaryOps.ResizeBox).count() == 0)
  }

  test("frame sample: stride indices, images contribute exactly one frame") {
    val out = BinaryOps.multimodalFrameSample(spark, docs)
    assert(out.filter($"frame_idx" % BinaryOps.FrameStride =!= 0).count() == 0)
    val imgCounts = out.filter($"media_type" === "image")
      .groupBy("doc_id").count().select("count").as[Long].collect()
    assert(imgCounts.nonEmpty && imgCounts.forall(_ == 1L))
  }

  test("byte features: histogram bins sum to payload length, mean in byte range") {
    val out = BinaryOps.multimodalFeatures(spark, docs)
    assert(out.filter($"h0" + $"h1" + $"h2" + $"h3" =!= $"payload_bytes").count() == 0)
    assert(out.filter($"mean_byte" < 0 || $"mean_byte" > 255).count() == 0)
  }

  test("token_count: ws tokens match a hand count; bpe >= ws on punctuated text") {
    val planted = Seq((1L, "hello world, how are you?"), (2L, "  a  b  ")).toDF("doc_id", "text")
    val got = TextOps.tokenCount(planted).as[(Long, Long, Long)].collect().toMap2
    assert(got(1L) == (5L, 7L)) // 5 words; bpe: 5 words + ',' + '?'
    assert(got(2L)._1 == 2L) // trim+collapse
  }

  implicit private class M(xs: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = xs.map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("fingerprint: short doc (< window) gets a single whole-doc window hash") {
    val planted = Seq((1L, "only three tokens"), (2L, "only three tokens")).toDF("doc_id", "text")
    val fps = TextOps.docFingerprint(planted)
      .select("doc_id", "fingerprint").as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    // window smaller than FpWindow still yields a valid [0, P) hash
    assert(fps(1L) >= 0 && fps(1L) < TextOps.P)
  }

  test("text_scrub: URLs, emails, digit runs redacted; whitespace collapsed") {
    val planted = Seq(
      (1L, "see https://example.com/x?y=1 or mail bob@example.co.uk  now"),
      (2L, "account 1234567890 balance")).toDF("doc_id", "text")
    val got = TextOps.textScrub(planted)
      .select("doc_id", "scrubbed").as[(Long, String)].collect().toMap
    assert(got(1L) == "see <URL> or mail <EMAIL> now")
    assert(got(2L) == "account <NUM> balance")
  }

  test("lang_id priority: tie on all-zero scores resolves to en (fixed order)") {
    val planted = Seq((1L, "xyzzy quux blorp")).toDF("doc_id", "text")
    val got = TextOps.langId(planted).select("detected_lang").as[String].head()
    assert(got == "en")
  }
}
