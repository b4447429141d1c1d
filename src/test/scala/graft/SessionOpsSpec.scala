package graft

import graft.ops.SessionOps
import org.apache.spark.sql.functions._

class SessionOpsSpec extends SparkSuite {
  import spark.implicits._

  private val H = 3600L * 1000000 // one hour in micros
  private def ev(id: Long, user: Long, tUs: Long, typ: String) =
    (id, new java.sql.Timestamp(tUs / 1000), user, typ, 1.0, "{}")

  private def eventsDf(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("sessionize: gap splits sessions per user; ordinals and bounds are deterministic") {
    val t0 = 1700000000L * 1000000
    val rows = Seq(
      // user 1: three events inside one gap, then a 10h jump -> 2 sessions
      ev(1, 1, t0, "view"), ev(2, 1, t0 + H, "click"), ev(3, 1, t0 + 2 * H, "buy"),
      ev(4, 1, t0 + 12 * H, "view"), ev(5, 1, t0 + 13 * H, "view"),
      // user 2: one event -> 1 session
      ev(6, 2, t0, "signup"))
    val got = SessionOps.sessionize(eventsDf(rows))
      .select("user_id", "session_seq", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L, 2 * H),
      (1L, 2L, 2L, H),
      (2L, 1L, 1L, 0L)), s"got $got")
  }

  test("conversation_flatten: time-ordered rendering; MaxTurns cap is deterministic with n_dropped observability") {
    val t0 = 1700000000L * 1000000
    val big = (0 until SessionOps.MaxTurns + 5).map(i =>
      ev(100 + i, 7, t0 + i * 60L * 1000000, s"t$i")) // 1-min cadence, one session
    val small = Seq(ev(1, 8, t0, "a"), ev(2, 8, t0 + H, "b"))
    val got = SessionOps.conversationFlatten(eventsDf(big ++ small))
      .select("user_id", "n_turns", "n_dropped", "convo")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(7L)._2 == SessionOps.MaxTurns.toLong)
    assert(got(7L)._3 == 5L)
    assert(got(7L)._4 == (0 until SessionOps.MaxTurns).map(i => s"t$i").mkString(" "),
      "earliest MaxTurns events, time order")
    assert(got(8L) == ((8L, 2L, 0L, "a b")))
  }

  test("scale shape: both session plans reuse the single user_id exchange (windows + groupBy, no second shuffle)") {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    Seq(SessionOps.sessionize(raw), SessionOps.conversationFlatten(raw)).foreach { df =>
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      val n = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(n == 1, s"expected exactly 1 exchange, got $n:\n$plan")
    }
  }
}
