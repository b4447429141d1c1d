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

  /** ≙ config.Elasticsearch (config/config.go:9-26) with SetDefault
    * semantics (config/config.go:37-58): ticker 10s, batch 1000 actions,
    * 10mb, 1 concurrent request.
    */
  case class EsSinkConfig(
      tableIndexMapping: Map[String, String],
      batchSizeLimit: Int = 1000,
      batchTickerDuration: FiniteDuration = 10.seconds,
      batchByteSizeLimit: String = "10mb",
      concurrentRequest: Int = 1,
      typeName: String = "", // ≙ TypeName; only emitted when esMajor < 8
      version: String = "8.0.0" // ≙ detected ES version. The reference
      // auto-detects via the Info API with "7.0.0" as a DETECTION-FAILURE
      // fallback (client.go:51-74); with no cluster to probe this is an
      // explicit knob, defaulting to modern ES (no `_type` emitted).
  ) {
    /** Parsed byte limit (≙ bulk.go:81-84 ParseSize call). */
    def batchByteSizeLimitBytes: Long = ops.CdcOps.parseSize(batchByteSizeLimit)
    def esMajorVersion: Int = version.takeWhile(_ != '.').toInt
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
      snapshot: SnapshotConfig = SnapshotConfig()
  )
}
