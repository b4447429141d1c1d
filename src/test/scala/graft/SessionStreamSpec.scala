package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.ops.SessionOps

class SessionStreamSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private val H = 3600L * 1000000 // one hour in micros
  private val t0 = 1700000000L * 1000000

  /** One event row in the Pipeline.eventSchema layout (ts = NANOS). */
  private def ev(id: Long, user: Long, tUs: Long, typ: String) =
    (id, tUs * 1000, user, typ, 1.0, "{}")

  private def stage(dir: String, rows: Seq[(Long, Long, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Append).parquet(dir)

  test("closed sessions: explicit gap closes in-data; watermark timeout closes the silent user; open frontier stays in state; ordinals continue across restart") {
    val eventsDir = tmp("sess-in")
    val outDir = tmp("sess-out")
    val ckpt = tmp("sess-ckpt")
    // batch 1: user 1 two events inside one gap; user 2 one event
    stage(eventsDir, Seq(
      ev(1, 1, t0, "view"), ev(2, 1, t0 + H, "click"), ev(3, 2, t0, "signup")))
    // batch 2: user 1 jumps 20h -> closes their session 1 IN DATA and
    // opens session 2; the file also drags the watermark to t0+20h,
    // which passes user 2's (t0 + gap) deadline -> timeout close
    stage(eventsDir, Seq(ev(4, 1, t0 + 20 * H, "view")))
    awaitDone(graft.stream.SessionStream.run(spark, eventsDir, outDir, ckpt))
    val got = spark.read.parquet(outDir)
      .select("user_id", "session_seq", "n_events", "duration_us", "convo")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 1L, 2L, H, "view click"),
      (2L, 1L, 1L, 0L, "signup")), s"got $got")

    // restart on the same checkpoint: user 1's OPEN session 2 was state,
    // not output; a 48h event closes it with the continued ordinal
    stage(eventsDir, Seq(ev(5, 1, t0 + 48 * H, "buy")))
    awaitDone(graft.stream.SessionStream.run(spark, eventsDir, outDir, ckpt))
    val got2 = spark.read.parquet(outDir)
      .select("user_id", "session_seq", "n_events", "convo")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got2.contains((1L, 2L, 1L, "view")),
      s"restored state must close session 2 with its ordinal, got $got2")
  }

  test("turn cap: a marathon session emits n_turns=MaxTurns, n_dropped set, earliest turns kept") {
    val eventsDir = tmp("sesscap-in")
    val outDir = tmp("sesscap-out")
    val ckpt = tmp("sesscap-ckpt")
    val n = SessionOps.MaxTurns + 3
    stage(eventsDir, (0 until n).map(i =>
      ev(10 + i, 5, t0 + i * 60L * 1000000, s"t$i")))
    // closing event far in the future (new session; also advances watermark)
    stage(eventsDir, Seq(ev(999, 5, t0 + 100 * H, "end")))
    awaitDone(graft.stream.SessionStream.run(spark, eventsDir, outDir, ckpt))
    val got = spark.read.parquet(outDir)
      .filter($"session_seq" === 1L)
      .select("n_events", "n_turns", "n_dropped", "convo")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((n.toLong, SessionOps.MaxTurns.toLong, 3L,
      (0 until SessionOps.MaxTurns).map(i => s"t$i").mkString(" "))), s"got $got")
  }
}
