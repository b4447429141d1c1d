package graft

import java.nio.file.Files

import graft.conf._
import graft.stream.{Connector, Metrics, MetricsEndpoint, QueryNames}

/** R3 transport + identity: the Prometheus `/metrics` endpoint
  * (≙ README.md:247-274 API table), per-connector gauge keying
  * (metric.go defines the gauges per-connector), and stable
  * checkpoint-derived query-name suffixes.
  */
class MetricsEndpointSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("QueryNames: spellings of one dir agree on a stable 48-bit suffix") {
    val a = QueryNames.suffix("/ckpt/pipeline")
    assert(a.length == 12)
    assert(QueryNames.suffix("/ckpt/pipeline/") == a, "trailing slash")
    assert(QueryNames.suffix("/ckpt/./pipeline") == a, "dot segment")
    assert(QueryNames.suffix("/ckpt//pipeline") == a, "doubled slash")
    assert(QueryNames.suffix("/ckpt/other") != a)
    // relative spelling resolves against the cwd — agrees with absolute
    // (pure path arithmetic, NO symlink resolution: the name must not
    // depend on live filesystem state)
    val cwd = java.nio.file.Paths.get("").toAbsolutePath.toString
    assert(QueryNames.suffix("some-ckpt") == QueryNames.suffix(s"$cwd/some-ckpt"))
    // URI checkpoints normalize without touching any filesystem
    assert(QueryNames.suffix("hdfs://nn:8020/ckpt/")
      == QueryNames.suffix("hdfs://nn:8020/ckpt"))
  }

  test("terminated query's gauges are pruned; counters survive") {
    Metrics.reset()
    Metrics.recordProgress("graft-cdc-pipeline-dead", Some(42L), Some(7L))
    assert(Metrics.snapshot().contains("process_latency_current_ms{query=graft-cdc-pipeline-dead}"))
    Metrics.removeQuery("graft-cdc-pipeline-dead")
    val snap = Metrics.snapshot()
    assert(!snap.exists(_._1.contains("graft-cdc-pipeline-dead")),
      "a dead connector must not be scraped at its last latency forever")
    // unlabeled per-connector view degrades to 0, not a stale value
    assert(Metrics.processLatencyMs("graft-cdc-pipeline-dead") == 0L)
  }

  test("latency gauges are per-connector: two pipelines never overwrite each other") {
    Metrics.reset()
    Metrics.recordProgress("graft-cdc-pipeline-aaa", Some(11L), Some(5L))
    Metrics.recordProgress("graft-cdc-pipeline-bbb", Some(99L), Some(77L))
    assert(Metrics.processLatencyMs("graft-cdc-pipeline-aaa") == 11L)
    assert(Metrics.processLatencyMs("graft-cdc-pipeline-bbb") == 99L)
    assert(Metrics.bulkRequestLatencyMs("graft-cdc-pipeline-aaa") == 5L)
    val mine = Metrics.snapshotFor("graft-cdc-pipeline-aaa")
    assert(mine("process_latency_current_ms") == 11L)
    assert(mine("bulk_request_process_latency_current_ms") == 5L)
    val all = Metrics.snapshot()
    assert(all("process_latency_current_ms{query=graft-cdc-pipeline-aaa}") == 11L)
    assert(all("process_latency_current_ms{query=graft-cdc-pipeline-bbb}") == 99L)
  }

  test("Prometheus text rendering: TYPE lines, label quoting, counter/gauge split") {
    val text = MetricsEndpoint.render(Map(
      "index_total{index=users_idx}" -> 6L,
      "delete_total{index=users_idx}" -> 1L,
      "process_latency_current_ms{query=graft-cdc-pipeline-ab12}" -> 42L))
    assert(text.contains("# TYPE graft_index_total counter"))
    assert(text.contains("""graft_index_total{index="users_idx"} 6"""))
    assert(text.contains("# TYPE graft_delete_total counter"))
    assert(text.contains("# TYPE graft_process_latency_current_ms gauge"))
    assert(text.contains(
      """graft_process_latency_current_ms{query="graft-cdc-pipeline-ab12"} 42"""))
  }

  private def httpGet(port: Int, path: String): (Int, String) = {
    val c = new java.net.URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      val code = c.getResponseCode
      val body = scala.io.Source.fromInputStream(c.getInputStream, "UTF-8").mkString
      (code, body)
    } finally c.disconnect()
  }

  test("GET /metrics and /status over HTTP (≙ the reference API table)") {
    Metrics.reset()
    Metrics.recordProgress("graft-cdc-pipeline-web1", Some(7L), None)
    val ep = MetricsEndpoint.start(0) // ephemeral port
    try {
      val (mc, mb) = httpGet(ep.port, "/metrics")
      assert(mc == 200)
      assert(mb.contains(
        """graft_process_latency_current_ms{query="graft-cdc-pipeline-web1"} 7"""), mb)
      val (sc, sb) = httpGet(ep.port, "/status")
      assert(sc == 200 && sb.startsWith("OK"))
    } finally ep.stop()
  }

  test("loopback bind + concurrent scrapes: pooled executor serves /status alongside /metrics") {
    Metrics.reset()
    Metrics.recordProgress("graft-cdc-pipeline-conc", Some(3L), None)
    // explicit loopback bind (the configurable-host path Connector uses
    // via GraftConfig.metricsHost); the 2-thread daemon pool replaces the
    // JDK default null executor, so a busy /metrics scrape no longer
    // serializes /status (the liveness probe) behind it
    val ep = MetricsEndpoint.start(0, "127.0.0.1")
    try {
      import java.util.concurrent.{CountDownLatch, TimeUnit}
      val done = new CountDownLatch(8)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (1 to 8).map { i =>
        val t = new Thread(() =>
          try {
            val (code, _) = httpGet(ep.port, if (i % 2 == 0) "/metrics" else "/status")
            if (code != 200) failures.add(new AssertionError(s"code $code"))
          } catch { case e: Throwable => failures.add(e) }
          finally done.countDown())
        t.start(); t
      }
      assert(done.await(20, TimeUnit.SECONDS), "concurrent scrapes timed out")
      threads.foreach(_.join(1000))
      assert(failures.isEmpty, failures.toString)
    } finally ep.stop()
  }

  test("connector lifecycle owns the endpoint: up after start (snapshot scrapeable), down after close") {
    Metrics.reset()
    val bulkDir = tmp("mep-bulk")
    val c = Connector.newConnector(spark,
      GraftConfig(
        es = EsSinkConfig(tableIndexMapping = Map("public.users" -> "users_idx")),
        snapshot = SnapshotConfig(enabled = true, mode = SnapshotOnlyMode),
        metricsPort = Some(0)),
      Connector.Io(tmp("mep-noev"), bulkDir, tmp("mep-dlq"), tmp("mep-ckpt"),
        snapshotTable = Some((
          (1 to 5).map(i => (i.toLong, s"u$i")).toDF("id", "name"),
          "public", "users", "id"))))
    c.start()
    val port = c.metricsPort.getOrElse(fail("endpoint not started"))
    val (code, body) = httpGet(port, "/metrics")
    assert(code == 200)
    assert(body.contains("""graft_index_total{index="users_idx"} 5"""), body)
    c.close()
    assert(c.metricsPort.isEmpty)
    intercept[java.io.IOException] { httpGet(port, "/status") }
  }
}
