package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.Trigger

import graft.conf._
import graft.stream.{Connector, Handlers}

/** Lifecycle parity spec: NewConnector → Start → WaitUntilReady → Close,
  * across snapshot modes and both handler paths (§3.3).
  */
class ConnectorSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def cfg(snapshot: SnapshotConfig = SnapshotConfig()) = GraftConfig(
    es = EsSinkConfig(tableIndexMapping = Map("public.users" -> "users_idx")),
    snapshot = snapshot)

  private def stageEvents(dir: String, ids: Seq[Long]): Unit =
    ids.map(i => (i, 1706000000000000000L + i, Option(i), "signup", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)

  private def bulkLines(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
      .flatMap(b => Option(b.listFiles()).getOrElse(Array.empty))
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".txt"))
      .toSeq.flatMap(f => scala.io.Source.fromFile(f).getLines())
  }

  test("lifecycle: start → ready → drain → close; typed handler path") {
    val eventsDir = tmp("conn-events")
    val bulkDir = tmp("conn-bulk")
    stageEvents(eventsDir, 1L to 3L)
    val c = Connector.newConnector(spark, cfg(),
      Connector.Io(eventsDir, bulkDir, tmp("conn-dlq"), tmp("conn-ckpt")),
      handler = Some(Handlers.simpleHandler),
      trigger = Some(Trigger.ProcessingTime(50)))
    c.start()
    c.waitUntilReady(30000)
    assert(c.isActive)
    c.processAllAvailable()
    c.close()
    assert(!c.isActive)
    assert(bulkLines(bulkDir).count(_.contains("\"_id\"")) == 3)
  }

  test("version auto-detect (client.go:37-74): explicit skips probe; probe parses; failure falls back to 7.0.0") {
    // explicit version: probe must never run
    var probed = 0
    val explicitCfg = cfg()
    assert(resolveVersion(explicitCfg, Some(() => { probed += 1; "{}" }))
      .es.version == "8.0.0")
    assert(probed == 0)
    // empty version + healthy Info response → detected number
    val auto = explicitCfg.copy(es = explicitCfg.es.copy(version = ""))
    val info = """{"name":"node-1","version":{"number":"7.17.9","build_flavor":"default"}}"""
    assert(resolveVersion(auto, Some(() => info)).es.version == "7.17.9")
    // failures: transport error, junk body, missing version.number
    assert(resolveVersion(auto, Some(() => throw new RuntimeException("boom")))
      .es.version == FallbackVersion)
    assert(resolveVersion(auto, Some(() => "not json")).es.version == FallbackVersion)
    assert(resolveVersion(auto, Some(() => """{"version":{}}""")).es.version == FallbackVersion)
    assert(resolveVersion(auto, None).es.version == FallbackVersion)
    // textual-but-unparsable number (no numeric major) is a detection
    // FAILURE, not a version that crashes esMajorVersion mid-stream later;
    // a parsable major with a loose tail ("8.x-snapshot") is accepted
    assert(resolveVersion(auto,
      Some(() => """{"version":{"number":"snapshot-build"}}""")).es.version == FallbackVersion)
    assert(resolveVersion(auto,
      Some(() => """{"version":{"number":"8.x-snapshot"}}""")).es.esMajorVersion == 8)
  }

  test("initial mode snapshots ONCE per checkpoint lineage: restart resumes CDC without re-scanning") {
    val eventsDir = tmp("conn-init-events")
    val bulkDir = tmp("conn-init-bulk")
    val ckpt = tmp("conn-init-ckpt")
    val dlq = tmp("conn-init-dlq")
    val users = (1 to 4).map(i => (i.toLong, s"u$i")).toDF("id", "name")
    def connector() = Connector.newConnector(spark,
      cfg(SnapshotConfig(enabled = true, mode = InitialMode)),
      Connector.Io(eventsDir, bulkDir, dlq, ckpt, snapshotTable = Some((
        users, "public", "users", "id"))),
      trigger = Some(Trigger.AvailableNow()))
    stageEvents(eventsDir, 1L to 2L)
    val c1 = connector()
    c1.start()
    c1.drainAndClose()
    assert(bulkLines(bulkDir).count(_.contains("SNAPSHOT")) == 4)
    // restart with the SAME checkpoint (≙ same replication slot): the
    // completion marker must suppress a second full table scan
    stageEvents(eventsDir, 3L to 4L)
    val c2 = connector()
    c2.start()
    c2.drainAndClose()
    assert(bulkLines(bulkDir).count(_.contains("SNAPSHOT")) == 4,
      "restart re-ran the snapshot — the whole table re-scanned and re-written")
    assert(bulkLines(bulkDir).count(_.contains("\"op\":\"INSERT\"")) == 4,
      "CDC events from both runs must still flow")
  }

  test("detection-failure fallback drives the encoder: fallback 7.0.0 emits _type end-to-end") {
    val eventsDir = tmp("conn-v7-events")
    val bulkDir = tmp("conn-v7-bulk")
    stageEvents(eventsDir, 1L to 2L)
    val auto = cfg().copy(es = cfg().es.copy(version = "")) // request detect
    val c = Connector.newConnector(spark, auto,
      Connector.Io(eventsDir, bulkDir, tmp("conn-v7-dlq"), tmp("conn-v7-ckpt")),
      trigger = Some(Trigger.AvailableNow()),
      infoProbe = Some(() => throw new RuntimeException("no cluster")))
    c.start()
    c.waitUntilReady(30000)
    c.drainAndClose()
    val metas = bulkLines(bulkDir).filter(_.contains("\"_id\""))
    assert(metas.nonEmpty)
    assert(metas.forall(_.contains("\"_type\":\"_doc\"")),
      s"fallback 7.0.0 must re-enable _type: $metas")
  }

  test("snapshot_only mode: start returns after snapshot, no stream (connector.go:84-96)") {
    val bulkDir = tmp("conn-snap-bulk")
    val c = Connector.newConnector(spark,
      cfg(SnapshotConfig(enabled = true, mode = SnapshotOnlyMode)),
      Connector.Io(tmp("conn-noev"), bulkDir, tmp("conn-snap-dlq"), tmp("conn-snap-ckpt"),
        snapshotTable = Some((
          (1 to 6).map(i => (i.toLong, s"u$i")).toDF("id", "name"),
          "public", "users", "id"))))
    c.start()
    c.waitUntilReady(1000) // immediate: no stream in snapshot-only mode
    assert(!c.isActive)
    assert(bulkLines(bulkDir).count(_.contains("SNAPSHOT")) == 6)
    assert(c.metrics.getOrElse("index_total{index=users_idx}", 0L) >= 6L)
  }
}
