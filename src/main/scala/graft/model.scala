package graft

import java.sql.Timestamp

/** Core data model — Spark-native re-expression of the reference's
  * row-change-event envelope and Elasticsearch bulk-action types.
  *
  * Reference: /root/reference/message.go:11-21 (`Message`),
  * /root/reference/elasticsearch/action.go:5-24 (`Action`, `Script`).
  *
  * The reference carries row images as `map[string]any`; we carry them as a
  * typed struct per table (testdata schemas are fixed) with a JSON escape
  * hatch (`docJson`) for handler-added fields, mirroring SURVEY.md §1.4.
  */
object model {

  /** One change event for one row of one table (message.go:11-21).
    * `msgType` ∈ INSERT | UPDATE | DELETE | SNAPSHOT (message.go:71-78).
    */
  case class CdcMessage(
      eventId: Long, // monotonic arrival sequence (≙ LSN order)
      eventTime: Timestamp, // commit/server timestamp (message.go:14)
      tableNamespace: String, // Postgres schema (message.go:16)
      tableName: String,
      msgType: String,
      oldDocId: Option[String], // pre-image key (UPDATE/DELETE)
      newDocId: Option[String], // post-image key (INSERT/UPDATE/SNAPSHOT)
      docJson: Option[String] // post-image document as JSON
  ) {
    def isInsert: Boolean = msgType == MsgType.Insert
    def isUpdate: Boolean = msgType == MsgType.Update
    def isDelete: Boolean = msgType == MsgType.Delete
    def isSnapshot: Boolean = msgType == MsgType.Snapshot
  }

  object MsgType {
    val Insert = "INSERT"
    val Update = "UPDATE"
    val Delete = "DELETE"
    val Snapshot = "SNAPSHOT"
    val all: Seq[String] = Seq(Insert, Update, Delete, Snapshot)
  }

  /** Elasticsearch bulk action (elasticsearch/action.go:13-19).
    * `actionType` ∈ index | delete | update (action.go:5-11).
    */
  case class EsAction(
      seq: Long, // original batch position (bulk.go:141-157 preserves it)
      actionType: String,
      docId: String,
      indexName: String,
      routing: Option[String],
      source: Option[String] // raw JSON; None for deletes
  )

  object ActionType {
    val Index = "index"
    val Delete = "delete"
    val ScriptUpdate = "update"
  }

  /** Painless-script analog for server-side partial updates
    * (elasticsearch/action.go:21-24). We model the *semantics* (merge into
    * existing doc, version increment) as Spark merge logic; the script text
    * is sink passthrough.
    */
  case class Script(source: String, params: Map[String, String])
}
