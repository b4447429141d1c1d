package graft

import java.nio.file.Files
import org.apache.spark.sql.SaveMode
import graft.stream.StateMerge

/** X1 streaming: version counters accumulate across micro-batches AND
  * across restarts (checkpointed state), and the emitted bytes are the
  * reference's scripted-upsert `_bulk` encoding (bulk.go:237-241).
  */
class StateMergeSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Stage purchase (UPDATE) events for (userId, value) pairs. */
  private def stage(dir: String, rows: Seq[(Long, Long, Double)]): Unit =
    rows.map { case (eid, uid, v) =>
      (eid, 1706000000000000000L + eid * 1000000000L, Option(uid), "purchase", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)

  private def lines(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
      .flatMap(b => Option(b.listFiles()).getOrElse(Array.empty))
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".txt"))
      .toSeq.flatMap(f => scala.io.Source.fromFile(f).getLines())
  }

  test("stateful scripted upsert: versions accumulate across restart, bytes match the reference encoding") {
    val eventsDir = tmp("sm-events")
    val bulkDir = tmp("sm-bulk")
    val ckpt = tmp("sm-ckpt")

    // batch 1: user 7 updated twice, user 8 once
    stage(eventsDir, Seq((1L, 7L, 1.5), (2L, 7L, 2.5), (3L, 8L, 9.0)))
    val q1 = StateMerge.run(spark, eventsDir, bulkDir, ckpt)
    awaitDone(q1)
    val out1 = lines(bulkDir)
    assert(out1.exists(l => l.contains("\"_id\":\"7\"")))
    val v7 = out1.find(_.contains("\"version\":2")).getOrElse("")
    assert(v7.contains("\"last_value\":2.5"), s"batch1 lines: $out1")

    // batch 2 after restart: one more update for user 7 → version 3
    stage(eventsDir, Seq((4L, 7L, 4.0)))
    val q2 = StateMerge.run(spark, eventsDir, bulkDir, ckpt)
    awaitDone(q2)
    val out2 = lines(bulkDir)
    assert(out2.exists(l => l.contains("\"version\":3") && l.contains("\"last_value\":4.0")),
      s"state did not survive restart: $out2")

    // exact reference byte shape: meta line + scripted_upsert source line
    val meta = out2.find(_.contains("\"update\":{")).get
    assert(meta.contains("""{"update":{"_index":"users_idx","_id":""""))
    assert(out2.exists(_.contains(""""scripted_upsert":true""")))
  }

  test("RocksDB state store: versions accumulate across restart on the scale-path provider") {
    val eventsDir = tmp("smr-events")
    val bulkDir = tmp("smr-bulk")
    val ckpt = tmp("smr-ckpt")
    try {
      stage(eventsDir, Seq((1L, 7L, 1.5), (2L, 7L, 2.5)))
      awaitDone(StateMerge.run(spark, eventsDir, bulkDir, ckpt, rocksDb = Some(true)))
      assert(lines(bulkDir).exists(_.contains("\"version\":2")))
      // restart against the same checkpoint: RocksDB state must restore
      stage(eventsDir, Seq((3L, 7L, 4.0)))
      awaitDone(StateMerge.run(spark, eventsDir, bulkDir, ckpt, rocksDb = Some(true)))
      assert(lines(bulkDir).exists(l =>
        l.contains("\"version\":3") && l.contains("\"last_value\":4.0")),
        s"RocksDB state did not survive restart: ${lines(bulkDir)}")
    } finally StateMerge.useDefaultStateStore(spark)
  }
}
