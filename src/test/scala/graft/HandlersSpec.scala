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

  test("ScriptUpdate handler end-to-end: update action reaches the bulk file with the reference byte shape") {
    // a script-update handler port (example/script-update/main.go:132-182):
    // UPDATE → scripted upsert carrying params; everything else dropped
    val scripted: Handlers.Handler = msg => msg.msgType match {
      case MsgType.Update =>
        Seq(Handlers.scriptUpdateAction(msg.newDocId.get,
          graft.model.Script("ctx._source.v = params.v",
            Map("v" -> msg.eventId.toString))))
      case _ => Seq.empty
    }
    val actions = Handlers.applyHandler(typed, scripted)
    assert(actions.count() == typed.filter($"msg_type" === "UPDATE").count())
    // drive the real sink: meta + wrapped script body land in the bulk file
    val dir = java.nio.file.Files.createTempDirectory("graft-su").toString
    graft.stream.EsBulkSink.writeBatch(actions, 0L, s"$dir/bulk",
      graft.stream.ResponseHandler.deadLetter(s"$dir/dlq"), 1)
    val lines = spark.read.text(s"$dir/bulk/batch_0").as[String].collect()
    val metas = lines.filter(_.startsWith("{\"update\":"))
    assert(metas.nonEmpty)
    assert(metas.forall(_.matches("""\{"update":\{"_index":"\w+","_id":"\d+"\}\}""")))
    val bodies = lines.filter(_.startsWith("{\"script\":"))
    assert(bodies.nonEmpty)
    // Go marshal order: params, then source; wrap per bulk.go:237-241
    assert(bodies.forall(_.matches(
      """\{"script":\{"params":\{"v":\d+\},"source":"ctx\._source\.v = params\.v"\},"scripted_upsert":true\}""")))
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
