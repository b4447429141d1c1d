package graft

import scala.concurrent.duration._

/** Config parity with the reference (config/config.go, README.md:204-243):
  * a user of the reference can port their YAML knob-for-knob.
  * `tableIndexMapping` routes events, `batchTickerDuration` becomes the
  * processing-time trigger, `concurrentRequest` the flush partition split,
  * `version`/`typeName` gate `_type` in the bulk metadata, and
  * `snapshot.chunkSize` bounds snapshot task chunks. Connection/transport
  * knobs (urls, auth, maxConnsPerHost, gzip, node discovery) are
  * sink-implementation details of the HTTP client with no analog in the
  * zero-egress file sink.
  */
object conf {

  /** ≙ config.RejectionLog (config/config.go:28-31): route REJECTED
    * actions (per-item `_bulk` failures, invalid actions) as INDEX
    * actions into a dedicated ES index through the normal bulk encode
    * path — the rejection document carries the failed doc's identity,
    * the original target index and the server's error text, plus the
    * original `source` when `includeSource`. The reference DECLARES the
    * struct but never consumes it (no reference outside config.go), so
    * the routing semantics here follow the struct's evident intent; the
    * file dead-letter stays the durable local record either way.
    */
  case class RejectionLogConfig(
      index: String,
      includeSource: Boolean = false)

  /** ≙ config.Elasticsearch (config/config.go:9-26) with SetDefault
    * semantics (config/config.go:37-58): ticker 10s, batch 1000 actions,
    * 10mb, 1 concurrent request, 5-minute node rediscovery.
    */
  case class EsSinkConfig(
      tableIndexMapping: Map[String, String],
      batchSizeLimit: Int = 1000,
      batchTickerDuration: FiniteDuration = 10.seconds,
      batchByteSizeLimit: String = "10mb",
      concurrentRequest: Int = 1,
      typeName: String = "", // ≙ TypeName; only emitted when esMajor < 8
      version: String = "8.0.0", // ≙ ES version. "" requests auto-detect
      // at connector construction (see [[detectVersion]] — Info-API probe
      // with the reference's "7.0.0" detection-failure fallback,
      // client.go:37-74). The zero-egress default is modern ES (no
      // `_type` emitted).
      rejectionLog: Option[RejectionLogConfig] = None,
      // ≙ config.go:27-31; None = file dead-letter only (the default the
      // reference effectively ships, since it never reads the struct).
      maxIdleConnDuration: Option[FiniteDuration] = None,
      // ≙ MaxIdleConnDuration (config/config.go:15, fasthttp's idle-conn
      // eviction): a transport connection idle longer than this is
      // dropped before the next request (EsHttpClient rebuilds its
      // pooled JDK client — same effect: no request rides a stale
      // keep-alive through a dead NAT/LB mapping). None = JDK default.
      disableDiscoverNodesOnStart: Boolean = false,
      // ≙ DisableDiscoverNodesOnStart (config/config.go:24). Start-time
      // only: periodic rediscovery is governed by discoverNodesInterval,
      // exactly as in the reference where the two knobs are independent.
      discoverNodesInterval: FiniteDuration = 5.minutes,
      // ≙ DiscoverNodesInterval (config/config.go:16; default at
      // SetDefault config/config.go:54-57).
      maxBytesPerTrigger: Option[String] = None
      // Spark-side ADMISSION knob (no reference analog): bounds the bytes
      // a micro-batch ingests, for executor-memory control. Deliberately
      // separate from batchByteSizeLimit, which is a FLUSH knob (the
      // reference flushes EARLIER when the accumulated batch exceeds it —
      // bulk.go:164-173; here the per-request byte SPLIT in
      // EsBulkSink.writeBatch carries that semantic). Deriving admission
      // from the flush limit would cap throughput at limit/tickerDuration
      // — ~1 MB/s at the 10mb/10s defaults — and grow backlog without
      // bound on any faster producer.
  ) {
    /** Parsed byte limit (≙ bulk.go:81-84 ParseSize call). */
    def batchByteSizeLimitBytes: Long = ops.CdcOps.parseSize(batchByteSizeLimit)
    def maxBytesPerTriggerBytes: Option[Long] =
      maxBytesPerTrigger.map(ops.CdcOps.parseSize)
    def esMajorVersion: Int = version.takeWhile(_ != '.').toIntOption.getOrElse(
      throw new IllegalStateException(
        s"es.version '$version' has no numeric major — run conf.resolveVersion " +
          "first (\"\" requests auto-detect with the 7.0.0 fallback)"))
    def typeNameOrDefault: String = if (typeName.nonEmpty) typeName else "_doc"
  }

  sealed trait SnapshotMode
  /** Snapshot first, then CDC from the recorded position (README.md:32-38). */
  case object InitialMode extends SnapshotMode
  /** Snapshot only, no CDC (README.md:39-45). */
  case object SnapshotOnlyMode extends SnapshotMode

  /** ≙ SnapshotConfig (README.md:221-228). ChunkSize default 8000; the
    * claim-timeout/heartbeat worker-pool knobs map onto Spark task
    * scheduling + speculative retry and are accepted for parity.
    */
  case class SnapshotConfig(
      enabled: Boolean = false,
      mode: SnapshotMode = InitialMode,
      chunkSize: Int = 8000
  )

  case class GraftConfig(
      es: EsSinkConfig,
      snapshot: SnapshotConfig = SnapshotConfig(),
      metricsPort: Option[Int] = None,
      // ≙ the reference's HTTP API listener (README.md:247-274: GET
      // /metrics Prometheus endpoint, GET /status). None = no server
      // (metrics stay programmatic via Connector.metrics); Some(0)
      // binds an ephemeral port. Served by [[graft.stream.MetricsEndpoint]].
      metricsHost: String = "0.0.0.0"
      // Bind address for the metrics listener. The wildcard default matches
      // the reference's api server; set "127.0.0.1" to keep the unauthd
      // scrape endpoint off external interfaces.
  )

  /** ES version auto-detect with the reference's exact failure semantics
    * (client.go:37-74): an explicitly configured version skips detection
    * entirely; otherwise the Info-API probe runs and ANY failure —
    * transport error, unparsable body, missing `version.number` — falls
    * back to "7.0.0" (the conservative choice: `_type` is emitted again).
    * The probe is abstract (≙ `client.Info()` returning the response
    * body): a real deployment wires an HTTP GET; the zero-egress harness
    * supplies a literal/file-backed JSON.
    */
  val FallbackVersion = "7.0.0"

  /** Parse `version.number` out of an Info-API response body
    * (detectElasticsearchVersion, client.go:52-74). Jackson ships with
    * Spark, so no extra dependency.
    */
  def parseInfoVersion(infoJson: String): String = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(infoJson).path("version").path("number")
    if (!node.isTextual)
      throw new IllegalArgumentException(
        "version number not found in Elasticsearch response")
    val v = node.asText()
    // a textual-but-unparsable number ("8.x-snapshot") must count as a
    // detection FAILURE (→ 7.0.0 fallback in resolveVersion), not escape
    // here and blow up later in esMajorVersion mid-stream
    if (v.takeWhile(_ != '.').toIntOption.isEmpty)
      throw new IllegalArgumentException(s"unparsable version number: '$v'")
    v
  }

  /** Resolve the config's ES version (NewConnector-time, client.go:37-46):
    * explicit version wins; empty version runs the probe with the
    * "7.0.0" fallback on any failure (including no probe to run).
    */
  def resolveVersion(cfg: GraftConfig,
      infoProbe: Option[() => String]): GraftConfig =
    if (cfg.es.version.nonEmpty) cfg
    else {
      val v =
        try infoProbe.map(p => parseInfoVersion(p()))
          .getOrElse(FallbackVersion)
        catch { case scala.util.control.NonFatal(_) => FallbackVersion }
      cfg.copy(es = cfg.es.copy(version = v))
    }
}
