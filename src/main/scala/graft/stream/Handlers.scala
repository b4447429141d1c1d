package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{CdcMessage, EsAction, MsgType}
import graft.ops.CdcOps

/** The user-extension surface: `Handler = CdcMessage => Seq[EsAction]` —
  * the exact shape of the reference's `Handler func(msg Message)
  * []elasticsearch.Action` (handler.go:7): arbitrary user code, 1 → 0..N
  * actions, returning empty drops (and acks) the event
  * (connector.go:155-160).
  *
  * Execution contract mirrors the reference's connector loop
  * (connector.go:129-171): the pipeline resolves table→index routing FIRST
  * (unmapped events skipped before user code), then invokes the handler,
  * then stamps each returned action with the resolved index unless the
  * handler set one itself, and with the event's arrival sequence for LWW
  * dedup ordering.
  *
  * Performance note: this is the typed `flatMap` escape hatch — one
  * deserialization per event, outside whole-stage codegen. The canonical
  * insert/update/delete/snapshot projection ([[CdcOps.handlerActions]])
  * expresses the same logic as columns and is the fast path; use a typed
  * Handler only for logic Columns can't express. Both paths feed the same
  * sink.
  */
object Handlers {

  type Handler = CdcMessage => Seq[EsAction]

  /** Action constructors mirroring elasticsearch/action.go:26-51 — no
    * index/seq; the pipeline stamps those (connector.go:174-199).
    */
  def indexAction(docId: String, source: String, routing: Option[String] = None): EsAction =
    EsAction(0L, graft.model.ActionType.Index, docId, "", routing, Some(source))

  def deleteAction(docId: String, routing: Option[String] = None): EsAction =
    EsAction(0L, graft.model.ActionType.Delete, docId, "", routing, None)

  /** ScriptUpdate constructor (action.go:43-51): the action's source is
    * the marshaled Script. Mirrors Go json.Marshal: fields in struct
    * declaration order (`params` first, omitted when empty — omitempty),
    * map keys sorted. Param values are raw JSON fragments (the Go analog
    * is `map[string]interface{}`), so numbers pass unquoted. The canonical
    * encoder then wraps the body as
    * `{"script":<source>,"scripted_upsert":true}` (bulk.go:237-241).
    */
  def scriptUpdateAction(docId: String, script: graft.model.Script,
      routing: Option[String] = None): EsAction =
    EsAction(0L, graft.model.ActionType.ScriptUpdate, docId, "", routing,
      Some(marshalScript(script)))

  private[graft] def marshalScript(s: graft.model.Script): String = {
    val params =
      if (s.params.isEmpty) ""
      else s.params.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }
        .mkString("\"params\":{", ",", "},")
    s"""{$params"source":"${s.source}"}"""
  }

  /** The reference's simple-example handler (example/simple/main.go:109-130):
    * INSERT/SNAPSHOT → index new image keyed by id; DELETE → delete keyed
    * by old id; UPDATE → index new image; unknown → drop.
    */
  val simpleHandler: Handler = msg => msg.msgType match {
    case MsgType.Insert | MsgType.Snapshot | MsgType.Update =>
      (msg.newDocId, msg.docJson) match {
        case (Some(id), Some(doc)) => Seq(indexAction(id, doc))
        case _ => Seq.empty
      }
    case MsgType.Delete =>
      msg.oldDocId.map(deleteAction(_)).toSeq
    case _ => Seq.empty
  }

  /** typed-DF bridge: the routed event columns → Dataset[CdcMessage].
    * Routing runs BEFORE handler code, as in the reference (skip+ack for
    * unmapped tables, connector.go:146-152); the resolved index rides
    * along for post-handler stamping.
    */
  def toMessages(typed: DataFrame,
      mapping: Map[String, String] = CdcOps.tableIndexMapping)(
      implicit spark: SparkSession): Dataset[(CdcMessage, String)] = {
    import spark.implicits._
    val routed = CdcOps.serializeDoc(CdcOps.extractKey(CdcOps.resolveParentTable(typed, mapping)))
    routed.select(
      col("event_id"), timestamp_micros(col("event_time_us")).as("event_time"),
      col("table_namespace"), col("table_name"), col("msg_type"),
      col("doc_id"), col("source"), col("index_name")
    ).as[(Long, Timestamp, String, String, String, String, String, String)]
      .map { case (eid, ts, ns, tbl, mt, docId, doc, idx) =>
        val isDelete = mt == MsgType.Delete
        (CdcMessage(
          eventId = eid, eventTime = ts, tableNamespace = ns, tableName = tbl,
          msgType = mt,
          oldDocId = if (isDelete || mt == MsgType.Update) Some(docId) else None,
          newDocId = if (isDelete) None else Some(docId),
          docJson = if (isDelete) None else Some(doc)
        ), idx)
      }
  }

  /** Run a typed Handler over routed events → action DataFrame in the
    * sink's column layout (event_id, action_type, doc_id, index_name,
    * routing, action_ord, source). Index and sequence stamping ≙
    * connector.go:162-199; `action_ord` preserves the handler's output
    * order so LWW dedup keeps the LATER action when one event emits
    * multiple actions for the same key (the reference preserves slice
    * order inside the batch, bulk.go:141-157); `routing` joins the dedup
    * key and the bulk meta like the reference's `id:index[:routing]`.
    */
  def applyHandler(typed: DataFrame, handler: Handler,
      mapping: Map[String, String] = CdcOps.tableIndexMapping)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    toMessages(typed, mapping)
      .flatMap { case (msg, resolvedIndex) =>
        handler(msg).zipWithIndex.map { case (a, i) =>
          (a.copy(
            seq = msg.eventId,
            indexName = if (a.indexName.nonEmpty) a.indexName else resolvedIndex), i)
        }
      }
      .map { case (a, i) =>
        (a.seq, a.actionType, a.docId, a.indexName, a.routing, i, a.source)
      }
      .toDF("event_id", "action_type", "doc_id", "index_name", "routing",
        "action_ord", "source")
  }
}
