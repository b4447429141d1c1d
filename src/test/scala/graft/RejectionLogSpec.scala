package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.stream.{EsBulkSink, ResponseHandler}

/** RejectionLog parity (≙ config.RejectionLog, config/config.go:27-31):
  * rejected actions route as INDEX actions into the configured ES index
  * through the normal NDJSON encode path — the failed doc's identity, the
  * server's per-item error text and (IncludeSource) the original source —
  * while the file dead-letter record stays exactly what it was.
  */
class RejectionLogSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def actionsFixture = Seq(
    (1L, "index", "a", "users_idx", """{"v":1}"""),
    (2L, "index", "b", "users_idx", """{"v":2}"""),
    (3L, "index", "c", "orders_idx", """{"v":3}""")
  ).toDF("event_id", "action_type", "doc_id", "index_name", "source")

  private def rejectionLines(bulkDir: String, batchId: Long): Seq[String] = {
    val d = Paths.get(s"$bulkDir/rejection_$batchId")
    assert(Files.isDirectory(d), s"no rejection payload under $d")
    import scala.jdk.CollectionConverters._
    Files.list(d).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq.filter(_.nonEmpty)
  }

  test("failed item lands in the rejection index with the server's error text") {
    val bulkDir = tmp("rej-bulk")
    val dlq = tmp("rej-dlq")
    val rh = ResponseHandler.withRejectionLog(
      ResponseHandler.deadLetter(dlq),
      graft.conf.RejectionLogConfig("cdc_rejects", includeSource = true),
      bulkDir)
    EsBulkSink.handleResponse(actionsFixture,
      Map("b:users_idx" -> "mapper_parsing_exception: failed to parse"),
      rh, 7L)

    // the inner file dead-letter is unchanged by the route
    val dl = spark.read.parquet(dlq)
    assert(dl.select("doc_id").as[String].collect().toSet == Set("b"))
    assert(dl.columns.contains("_bulk_error"))

    // the rejection payload: one NDJSON action pair targeting the
    // configured index, body carrying original target + server error +
    // source (includeSource = true)
    val lines = rejectionLines(bulkDir, 7L)
    assert(lines.size == 2, s"meta+source expected, got: $lines")
    assert(lines(0) ==
      """{"index":{"_index":"cdc_rejects","_id":"b"}}""", lines(0))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val body = om.readTree(lines(1))
    assert(body.get("rejected_index").asText() == "users_idx")
    assert(body.get("error").asText().contains("mapper_parsing_exception"))
    assert(body.get("source").asText() == """{"v":2}""",
      "includeSource must carry the original document")
  }

  test("includeSource=false omits the source; key-less rejects get a deterministic id and a reason") {
    val bulkDir = tmp("rej2-bulk")
    val dlq = tmp("rej2-dlq")
    val rh = ResponseHandler.withRejectionLog(
      ResponseHandler.deadLetter(dlq),
      graft.conf.RejectionLogConfig("cdc_rejects"), bulkDir)
    // the bad-split class: a key-less action (no doc_id) arrives at
    // onError WITHOUT _bulk_error — the invalid-action reason is stamped
    val badSplit = Seq((9L, "index", null.asInstanceOf[String],
      "users_idx", """{"v":9}"""))
      .toDF("event_id", "action_type", "doc_id", "index_name", "source")
    rh.onError(badSplit, 3L)
    val lines = rejectionLines(bulkDir, 3L)
    assert(lines(0) ==
      """{"index":{"_index":"cdc_rejects","_id":"event-9"}}""", lines(0))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val body = om.readTree(lines(1))
    assert(body.get("error").asText().contains("invalid action"))
    assert(!body.has("source"), "includeSource=false must omit the source")
  }

  test("forConfig: unset rejectionLog = plain dead-letter, set = wrapped route") {
    val bulkDir = tmp("rej3-bulk")
    val dlq = tmp("rej3-dlq")
    val cfgNone = graft.conf.GraftConfig(graft.conf.EsSinkConfig(
      tableIndexMapping = Map("public.users" -> "users_idx")))
    val rhNone = ResponseHandler.forConfig(cfgNone, None, dlq, bulkDir)
    rhNone.onError(actionsFixture.withColumn("_bulk_error", lit("x")), 1L)
    assert(!Files.isDirectory(Paths.get(s"$bulkDir/rejection_1")),
      "no rejection payload when the config declares none")
    assert(spark.read.parquet(dlq).count() == 3,
      "file dead-letter unchanged when unset")

    val cfgSome = cfgNone.copy(es = cfgNone.es.copy(
      rejectionLog = Some(graft.conf.RejectionLogConfig("rj"))))
    val rhSome = ResponseHandler.forConfig(cfgSome, None, dlq, bulkDir)
    rhSome.onError(actionsFixture.withColumn("_bulk_error", lit("x")), 2L)
    assert(rejectionLines(bulkDir, 2L).size == 6,
      "three rejects -> three meta+source pairs")
  }

  test("httpShip: a batch-wide payload spills to the file transport, never the driver") {
    import spark.implicits._
    // 5 lines against a 2-line driver bound — the batch-wide-outage
    // shape: the payload must route through the spill transport, and no
    // HTTP attempt happens (the target URL is unroutable; a connect
    // would slow-fail and a throw would fail this spec)
    var spilled: Option[Long] = None
    val ship = ResponseHandler.httpShip(
      graft.stream.EsHttpConfig(Seq("http://127.0.0.1:1"), maxRetries = 0),
      (payload, batchId) => { spilled = Some(payload.count()); () },
      maxDriverLines = 2)
    ship((1 to 5).map(i => s"line$i").toDF("value"), 42L)
    assert(spilled.contains(5L),
      "payload above the driver bound must ship via the spill transport")
  }

  test("httpShip: a failed rejection-index post is swallowed and spilled, not thrown") {
    import spark.implicits._
    // small payload, dead endpoint (port 1 refuses), zero retries: the
    // ship must NOT propagate — the file dead-letter is the durable
    // record and an unhealthy rejection index must not wedge the stream
    var spilledRows = -1L
    val ship = ResponseHandler.httpShip(
      graft.stream.EsHttpConfig(Seq("http://127.0.0.1:1"),
        maxRetries = 0, connectTimeoutMs = 500, requestTimeoutMs = 500),
      (payload, _) => { spilledRows = payload.count(); () })
    ship(Seq("only-line").toDF("value"), 7L) // must not throw
    assert(spilledRows == 1L,
      "the failed payload must land on the fallback file transport")
  }
}
