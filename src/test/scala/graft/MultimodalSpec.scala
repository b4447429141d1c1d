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

  test("real image decode (ImageIO): generated PNGs round-trip width/height/channels; junk survives as decoded=false") {
    // REAL bytes, generated in-test: JDK ImageIO writes the PNGs the JDK
    // decoder then reads back inside Spark — no external codec involved
    def png(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK PNG writer missing?")
      bos.toByteArray
    }
    import java.awt.image.BufferedImage._
    val rows = Seq(
      (1L, png(17, 9, TYPE_INT_RGB)),            // 3 channels
      (2L, png(64, 128, TYPE_INT_ARGB)),         // 4 channels (alpha)
      (3L, png(5, 5, TYPE_BYTE_GRAY)),           // 1 channel
      (4L, "not an image at all".getBytes("UTF-8")), // junk payload
      (5L, Array.empty[Byte])                    // empty payload
    ).toDF("doc_id", "payload")
    val got = BinaryOps.imageDecode(spark, rows)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 17L, 9L, 3L, got(1L)._5, true)))
    assert(got(2L) == ((2L, 64L, 128L, 4L, got(2L)._5, true)))
    assert(got(3L) == ((3L, 5L, 5L, 1L, got(3L)._5, true)))
    assert(got(1L)._5 > 0L) // payload_bytes carried through
    // decode failure is DATA, not an exception: zeros + decoded=false
    assert(got(4L) == ((4L, 0L, 0L, 0L, 19L, false)))
    assert(got(5L) == ((5L, 0L, 0L, 0L, 0L, false)))
  }

  test("real dHash: planted near-duplicate PNG pairs within MaxHamming; distinct image does not") {
    // base: horizontal gradient (every row's comparisons point one way);
    // near-dup: ONE sampled grid pixel brightened (flips ≤ 2 bits);
    // distinct: inverted gradient (flips every bit)
    def gradPng(invert: Boolean, bump: Boolean): Array[Byte] = {
      val w = 64; val h = 64
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach { x =>
        val g0 = (x * 3) & 0xff
        val g = if (invert) 255 - g0 else g0
        (0 until h).foreach(y => img.setRGB(x, y, (g << 16) | (g << 8) | g))
      }
      if (bump) {
        // sampled position (c=4, r=0): x = 4·64/9 = 28, y = 0
        val b = 255
        img.setRGB(28, 0, (b << 16) | (b << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val rows = Seq(
      (1L, gradPng(invert = false, bump = false)),
      (2L, gradPng(invert = false, bump = true)),  // near-dup of 1
      (3L, gradPng(invert = true, bump = false)),  // opposite of 1
      (4L, "junk".getBytes("UTF-8"))               // quarantined
    ).toDF("doc_id", "payload")
    val sigs = BinaryOps.imageDhash(spark, rows)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(sigs(1L)._3 && sigs(2L)._3 && sigs(3L)._3)
    assert(!sigs(4L)._3, "junk must be quarantined, not hashed")
    assert(java.lang.Long.bitCount(sigs(1L)._2 ^ sigs(2L)._2) <=
      graft.ops.DedupOps.MaxHamming, "near-dup must be within the radius")
    assert(java.lang.Long.bitCount(sigs(1L)._2 ^ sigs(3L)._2) >
      graft.ops.DedupOps.MaxHamming, "inverted image must be far")
    // determinism: re-hashing yields identical bits
    val again = BinaryOps.imageDhash(spark, rows)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(again(1L) == sigs(1L)._2 && again(3L) == sigs(3L)._2)
    // the pair join: exactly the planted near-dup, junk excluded
    val pairs = BinaryOps.dedupImageDhashReal(spark, rows)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
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

  test("scrub_boilerplate_lines: df-threshold removal, order kept, within-doc repeats count once toward df but all occurrences drop") {
    val bp = "accept our cookies to continue"
    val planted = Seq(
      (1L, s"intro one\n$bp\nbody one"),
      (2L, s"$bp\nbody two"),
      // doc 3 repeats the line — df contribution is ONE (in-row distinct),
      // but both occurrences are removed
      (3L, s"$bp\nmiddle three\n$bp"),
      (4L, bp), // fully boilerplate -> empty text, row kept
      (5L, "no boilerplate here\nsecond line")).toDF("doc_id", "text")
    val got = graft.ops.TextOps.scrubBoilerplateLines(planted)
      .select("doc_id", "n_lines", "n_dropped", "scrubbed")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 1L, "intro one\nbody one")))
    assert(got(2L) == ((2L, 2L, 1L, "body two")))
    assert(got(3L) == ((3L, 3L, 2L, "middle three")))
    assert(got(4L) == ((4L, 1L, 1L, "")), "fully-boilerplate doc stays, emptied")
    assert(got(5L) == ((5L, 2L, 0L, "no boilerplate here\nsecond line")))
    // threshold boundary: a line in only TWO docs survives (df < 3)
    val twoDf = Seq((1L, "shared twice\na"), (2L, "shared twice\nb"), (3L, "c"))
      .toDF("doc_id", "text")
    val kept = graft.ops.TextOps.scrubBoilerplateLines(twoDf)
      .agg(org.apache.spark.sql.functions.sum("n_dropped"))
      .as[Long].head()
    assert(kept == 0L, "df=2 must stay below the K=3 threshold")
  }

  test("lang_id priority: tie on all-zero scores resolves to en (fixed order)") {
    val planted = Seq((1L, "xyzzy quux blorp")).toDF("doc_id", "text")
    val got = TextOps.langId(planted).select("detected_lang").as[String].head()
    assert(got == "en")
  }
}
