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
    // not output; a 48h event closes it with the continued ordinal.
    // user 2 was closed BY TIMEOUT — their new event must reopen at
    // session_seq 2 (the tombstone), not restart the ordinals at 1
    stage(eventsDir, Seq(ev(5, 1, t0 + 48 * H, "buy"), ev(6, 2, t0 + 30 * H, "view")))
    stage(eventsDir, Seq(ev(7, 2, t0 + 60 * H, "click"))) // closes user 2's reopened session by gap
    awaitDone(graft.stream.SessionStream.run(spark, eventsDir, outDir, ckpt))
    val got2 = spark.read.parquet(outDir)
      .select("user_id", "session_seq", "n_events", "convo")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got2.contains((1L, 2L, 1L, "view")),
      s"restored state must close session 2 with its ordinal, got $got2")
    assert(got2.contains((2L, 2L, 1L, "view")),
      s"a timeout-closed user must reopen at the NEXT ordinal (tombstone), got $got2")
    assert(!got2.exists(r => r._1 == 2L && r._2 == 1L && r._4 == "view"),
      s"no duplicate (user 2, session 1) key, got $got2")
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

  test("streamed chat rendering is byte-identical to batch chatRender on every closed session") {
    val eventsDir = tmp("sessrender-in")
    val outDir = tmp("sessrender-out")
    val ckpt = tmp("sessrender-ckpt")
    // users with 1..4-turn sessions (mix of user-only and multi-assistant),
    // then a far-future sentinel per user so the watermark closes everything
    val rows = (1L to 4L).flatMap { u =>
      (0 until u.toInt).map(i =>
        ev(u * 100 + i, u, t0 + i * 60L * 1000000, s"m${u}_$i"))
    } ++ Seq(ev(9999, 99, t0 + 100 * H, "sentinel"))
    stage(eventsDir, rows)
    awaitDone(graft.stream.SessionStream.run(spark, eventsDir, outDir, ckpt))
    val streamed = spark.read.parquet(outDir)
      .select("user_id", "session_seq", "rendered", "mask_spans", "n_mask_chars")
      .as[(Long, Long, String, String, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val batchDf = graft.ops.PostTrainOps.chatRender(
      rows.map { case (id, tsNs, user, typ, v, p) =>
        (id, new java.sql.Timestamp(tsNs / 1000000), user, typ, v, p)
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      .select("user_id", "session_seq", "rendered", "mask_spans", "n_mask_chars")
      .as[(Long, Long, String, String, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // every streamed close must match the batch face exactly (streamed
    // keys are a subset: the sentinel user's own session is still open)
    assert(streamed.nonEmpty && streamed.size >= 4)
    streamed.foreach { case (k, v) =>
      assert(batchDf(k) == v, s"session $k: streamed=$v batch=${batchDf(k)}")
    }
  }
}
