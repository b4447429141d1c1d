package graft

import org.apache.spark.sql.SparkSession
import graft.model.{EsAction, MsgType}
import graft.stream.Handlers
import graft.ops.CdcOps

/** Specs for the typed Handler surface (handler.go:7 shape): canonical
  * handler parity with the column-expression fast path, custom-handler
  * enrichment, drop semantics, index stamping.
  */
class HandlersSpec extends SparkSuite {
  import spark.implicits._
  implicit private val s: SparkSession = spark

  private def typed = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    CdcOps.typedMessages(spark.read.parquet(s"$sf/events.parquet"))
  }

  test("typed simpleHandler produces the same actions as the column fast path") {
    val viaColumns = CdcOps.handlerActions(typed)
      .select("event_id", "action_type", "doc_id", "index_name", "source")
      .as[(Long, String, String, String, Option[String])].collect().toSet
    val viaTyped = Handlers.applyHandler(typed, Handlers.simpleHandler)
      .select("event_id", "action_type", "doc_id", "index_name", "source")
      .as[(Long, String, String, String, Option[String])].collect().toSet
    assert(viaTyped == viaColumns)
    assert(viaTyped.nonEmpty)
  }

  test("handler returning empty drops the event (connector.go:155-160)") {
    val dropAll: Handlers.Handler = _ => Seq.empty
    assert(Handlers.applyHandler(typed, dropAll).count() == 0)
  }

  test("intra-event ordering: two same-key actions from one event → the later one survives dedup") {
    val twice: Handlers.Handler = msg => msg.msgType match {
      case MsgType.Insert =>
        val id = msg.newDocId.get
        Seq(Handlers.indexAction(id, """{"v":"first"}"""),
          Handlers.indexAction(id, """{"v":"second"}"""))
      case _ => Seq.empty
    }
    val out = CdcOps.dedupLastWriteWins(Handlers.applyHandler(typed, twice))
    assert(out.filter($"source".contains("first")).count() == 0)
    assert(out.count() == out.select("doc_id", "index_name").distinct().count())
    assert(out.count() > 0)
  }

  test("custom handler: 1→N fan-out and old/new enrichment land in the sink layout") {
    val audit: Handlers.Handler = msg => msg.msgType match {
      case MsgType.Update =>
        val id = msg.newDocId.get
        Seq(
          Handlers.indexAction(id, msg.docJson.get),
          // 2nd action: audit doc into an explicitly-chosen index
          Handlers.indexAction(s"audit-$id",
            s"""{"audited":$id,"old_id":"${msg.oldDocId.get}"}""")
            .copy(indexName = "audit_idx")
        )
      case _ => Seq.empty
    }
    val out = Handlers.applyHandler(typed, audit)
    val updates = typed.filter($"msg_type" === "UPDATE").count()
    assert(out.count() == 2 * updates)
    // handler-chosen index wins over the resolved one (connector.go:176-178)
    assert(out.filter($"index_name" === "audit_idx").count() == updates)
    assert(out.filter($"doc_id".startsWith("audit-")).count() == updates)
  }
}
