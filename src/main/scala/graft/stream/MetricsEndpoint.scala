package graft.stream

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** ≙ the reference's HTTP API surface (README.md:247-274 "API" table):
  * `GET /metrics` serves the Prometheus text exposition of
  * [[Metrics.snapshot]]; `GET /status` answers 200 OK while the server
  * runs (the reference pings Postgres — here it is liveness of the
  * in-process connector). metric.go:13-112 defines the instruments;
  * this class is only the scrape TRANSPORT (JDK HttpServer, namespace
  * `graft` in place of `go_pq_cdc_elasticsearch`). Started by
  * [[Connector]] when `GraftConfig.metricsPort` is set; port 0 binds an
  * ephemeral port (read it back via [[MetricsEndpoint.port]]).
  */
object MetricsEndpoint {

  private val Namespace = "graft"
  private val Key = """([A-Za-z_][A-Za-z0-9_]*)(?:\{([A-Za-z_]+)=(.*)\})?""".r

  /** Render a [[Metrics.snapshot]] map (`name` / `name{label=value}`
    * keys) as Prometheus text format v0.0.4: one `# TYPE` line per
    * metric family (`_total` ⇒ counter, else gauge), label values
    * quoted and escaped, rows sorted for deterministic scrapes.
    */
  def render(snap: Map[String, Long]): String = {
    val rows = snap.toSeq.collect { case (Key(name, label, value), v) =>
      (name, Option(label).map((_, value)), v)
    }.sortBy { case (n, l, _) => (n, l.map(_._2).getOrElse("")) }
    val sb = new StringBuilder
    var seen = Set.empty[String]
    rows.foreach { case (name, label, v) =>
      val full = s"${Namespace}_$name"
      if (!seen(name)) {
        sb.append(s"# TYPE $full ${if (name.endsWith("_total")) "counter" else "gauge"}\n")
        seen += name
      }
      val lbl = label.map { case (k, value) =>
        val esc = value.replace("\\", "\\\\").replace("\"", "\\\"")
        s"""{$k="$esc"}"""
      }.getOrElse("")
      sb.append(s"$full$lbl $v\n")
    }
    sb.toString
  }

  def start(port: Int, host: String = "0.0.0.0"): MetricsEndpoint = {
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    // A dedicated small pool instead of HttpServer's default null executor
    // (which serializes ALL requests on the single dispatch thread): one
    // stalled scraper connection must not block /status — the liveness
    // probe — for everyone else. Daemon threads so a forgotten stop()
    // never pins JVM shutdown.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      2,
      (r: Runnable) => {
        val t = new Thread(r, "graft-metrics-http")
        t.setDaemon(true)
        t
      })
    server.setExecutor(pool)
    def respond(ex: HttpExchange, body: String, ctype: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", ctype)
      ex.sendResponseHeaders(200, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    server.createContext("/metrics", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, render(Metrics.snapshot()),
          "text/plain; version=0.0.4; charset=utf-8")
    })
    server.createContext("/status", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, "OK\n", "text/plain")
    })
    server.start()
    new MetricsEndpoint(server, pool)
  }
}

final class MetricsEndpoint private[stream] (server: HttpServer,
    pool: java.util.concurrent.ExecutorService) {
  /** The bound port (meaningful with configured port 0 = ephemeral). */
  def port: Int = server.getAddress.getPort
  // shut the pool down too: the threads are daemon (they can't pin JVM
  // exit) but a long-lived session that starts/stops many endpoints
  // must not accumulate two parked threads per stop
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}
