package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{CorpusOps, DedupOps, TextOps}
import graft.stream.{CleanStream, DedupStream, EsHttpConfig, EsHttpSink,
  HaConnector, ResponseHandler}

/** Round-8 production composition e2e — every layer at once, the analog
  * of the reference's crown-jewel ack/resume integration test
  * (integration_test/connector_test.go:428-621) at this library's full
  * scope: WAL segment source (documents through the schema-driven DSv2
  * reader) → CleanStream gates + cross-batch exact dedup → EsHttpSink
  * `_bulk` POSTs against a live (loopback stub) Elasticsearch — wrapped
  * in HaConnector; the active instance is killed mid-stream and the
  * passive resumes from the SHARED checkpoint with no loss and no
  * re-delivery, and the stub's received `_bulk` stream equals the batch
  * pipeline's gate+dedup survivors over the same corpus.
  */
class E2eCompositionSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Minimal scriptable ES: records `_bulk` NDJSON bodies, 200s all. */
  private final class StubEs {
    val received = new ConcurrentLinkedQueue[String]()
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val port: Int = { server.start(); server.getAddress.getPort }
    def url = s"http://127.0.0.1:$port"
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val resp = ex.getRequestURI.getPath match {
        case "/_bulk" =>
          received.add(body)
          """{"took":1,"errors":false,"items":[]}"""
        case "/_nodes/http" =>
          s"""{"nodes":{"n1":{"http":{"publish_address":"127.0.0.1:$port"}}}}"""
        case _ => """{"name":"stub","version":{"number":"8.11.0"}}"""
      }
      val b = resp.getBytes(UTF_8)
      ex.sendResponseHeaders(200, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    })
    def stop(): Unit = server.stop(0)

    /** doc ids of all `index` actions received so far. */
    def indexedIds: Seq[Long] =
      received.toArray(Array.empty[String]).toSeq
        .flatMap(_.split('\n'))
        .filter(_.contains("\"index\""))
        .flatMap("\"_id\":\"(\\d+)\"".r
          .findFirstMatchIn(_).map(_.group(1).toLong))
  }

  private def waitUntil(ms: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(100)
    }
    cond
  }

  private def writeDocSegment(dir: String, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = rows.map { case (id, text) =>
      val n = m.createObjectNode()
      n.put("doc_id", id); n.put("text", text)
      m.writeValueAsString(n)
    }
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes(UTF_8))
    ()
  }

  /** The BATCH pipeline's gate+exact-dedup survivors (the CleanStream
    * equivalence oracle, same as CleanStreamSpec).
    */
  private def batchSurvivors(docs: Seq[(Long, String)]): Set[Long] = {
    val df = docs.toDF("doc_id", "text")
    val (_, quality) = TextOps.qualityCols(col("text"))
    val gated = df.filter(quality >= CorpusOps.QualityThreshold &&
      TextOps.detectLang(col("text")).isin(CorpusOps.AcceptedLangs: _*))
    gated.join(
        DedupOps.dedupExact(gated).select(col("rep_doc_id").as("doc_id")),
        "doc_id")
      .select("doc_id").as[Long].collect().toSet
  }

  test("WAL docs → CleanStream → EsHttpSink with HA takeover: no loss, no re-delivery, batch-equal") {
    val es = new StubEs()
    val walDir = tmp("e2e-wal")
    val outDir = tmp("e2e-out")
    val ckpt = tmp("e2e-ckpt")
    val leaseDir = tmp("e2e-lease")

    // real corpus texts pass/fail the REAL gates; ids keep arrival order
    val material = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").select("text").as[String].collect().toSeq
    val seg0 = (1L to 8L).map(i => i -> material((i - 1).toInt)) ++ Seq(
      9L -> material(0), // in-batch exact duplicate of doc 1
      10L -> "zz zz zz") // fails the quality gate
    val seg1 = Seq(
      11L -> material(2), // CROSS-batch duplicate (of doc 3, batch 0)
      12L -> material(10), // new survivor
      13L -> material(11))
    writeDocSegment(walDir, "seg-000", seg0)

    val http = EsHttpConfig(Seq(es.url), discoverNodesOnStart = false,
      retryBackoffBaseMs = 1)
    def startQuery() = CleanStream.runFrom(spark,
      spark.readStream
        .format(classOf[graft.sources.WalReplayProvider].getName)
        .schema(DedupStream.docSchema)
        .option("path", walDir)
        .option("maxSegmentsPerTrigger", "1")
        .load(),
      outDir, ckpt, benchGrams = None,
      trigger = Trigger.ProcessingTime(100L),
      onSurvivors = (surv, bid) => {
        val actions = surv.select(
          col("doc_id").as("event_id"),
          lit("index").as("action_type"),
          col("doc_id").cast("string").as("doc_id"),
          lit("docs_clean").as("index_name"),
          to_json(struct(col("doc_id"), col("text"))).as("source"))
        EsHttpSink.postBatch(actions, bid, http,
          ResponseHandler.deadLetter(s"$outDir/_dlq"), concurrentRequest = 1)
      })

    val a = HaConnector.start(spark, leaseDir, "A",
      leaseMs = 1500, pollMs = 100)(startQuery)
    val b = HaConnector.start(spark, leaseDir, "B",
      leaseMs = 1500, pollMs = 100)(startQuery)
    try {
      val expect0 = batchSurvivors(seg0)
      assert(waitUntil(60000)(es.indexedIds.toSet == expect0),
        s"active must index batch-0 survivors $expect0, got ${es.indexedIds}")
      // wait for batch 0's COMMIT: the bulk POST happens inside the
      // micro-batch, before the offset commit — killing in that window
      // legitimately replays the batch (the idempotent-batch contract,
      // absorbed by ES index-by-id). The strict no-re-delivery claim
      // below is about a POST-commit takeover, like the reference's
      // ack/resume e2e.
      assert(waitUntil(60000)(
          Files.exists(Paths.get(ckpt, "commits", "0"))),
        "batch 0 must commit before the crash")
      val active = if (a.isActive) a else b
      val passive = if (active eq a) b else a
      assert(active.isActive && !passive.isActive)

      // crash the active (lease NOT released), land the next WAL segment
      active.kill()
      writeDocSegment(walDir, "seg-001", seg1)
      assert(waitUntil(60000)(passive.isActive),
        "passive must capture the expired lease")

      // the takeover resumes from the SHARED checkpoint AND the shared
      // dedup state: 11 is a cross-batch duplicate (filtered against
      // batch 0's hash delta), 12/13 index — equal to the batch pipeline
      // over the whole corpus
      val expectAll = batchSurvivors(seg0 ++ seg1)
      assert(waitUntil(60000)(es.indexedIds.toSet == expectAll),
        s"takeover must resume cleanly: want $expectAll got ${es.indexedIds}")
      val all = es.indexedIds
      assert(all.size == all.toSet.size,
        s"no re-delivery across the takeover: $all")
      // and the streamed parquet corpus agrees with the posted stream
      val parquetIds = spark.read.parquet(s"$outDir/batch_*")
        .select("doc_id").as[Long].collect().toSet
      assert(parquetIds == expectAll)
    } finally { a.stop(); b.stop(); es.stop() }
  }
}
