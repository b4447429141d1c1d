package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.PgOutputFunctions.pg_output_decode

import graft.sources.PgWire

/** The pgoutput capture pipeline as declarative DataFrame stages — the
  * reference's go-pq-cdc message layer (connector.go:54-58: pgoutput
  * messages arrive as typed Insert/Update/Delete with the relation's
  * column names resolved) re-expressed over CAPTURED replication frames:
  *
  *   1. [[decode]]: binary frame → typed message struct (one codegen'd
  *      expression, [[graft.sources.PgWire]]);
  *   2. [[relationalize]]: resolve each DML row against the LATEST
  *      preceding Relation message (pgoutput sends schema metadata
  *      in-band, before the first DML touching a table — the protocol's
  *      own schema registry) and the enclosing Begin's transaction
  *      metadata;
  *   3. [[actions]]: route through the SAME three-tier table→index
  *      resolution every other leg uses ([[CdcOps.resolveParentTable]])
  *      and emit the engine's action schema — from here the existing
  *      LWW dedup, NDJSON encode and bulk sink apply verbatim.
  *
  * Ordering/scale contract: a replication slot is ONE totally ordered
  * WAL stream, and the metadata resolution below honours that order —
  * WITHOUT ordered windows: metadata frames (Relation per table per
  * session/schema-change, Begin per transaction) aggregate into sorted
  * version lists that broadcast onto the DML side, and every DML row
  * picks its as-of-`seq` version in-row. The DML side never shuffles
  * and never sorts (4M-frame capture at local[32]: 3.0M ev/s decode,
  * 423k ev/s decode→actions; the window rendition ran 123k ev/s
  * through one partition). pgoutput re-sends Relation messages per
  * walsender session and on any schema change, so capture segments are
  * self-describing; the streaming face
  * ([[graft.stream.PgCaptureStream]]) carries the registry across
  * segment boundaries as explicit versioned state.
  */
object PgOutputOps {

  /** Frames (seq, frame binary) → (seq, pg struct). `seq` is the capture
    * order — the file/offset order a capture tool preserves; the WAL
    * positions inside the envelope ride along as `pg.wal_start`.
    */
  def decode(frames: DataFrame, frameCol: String = "frame",
      seqCol: String = "seq"): DataFrame =
    frames.select(col(seqCol).cast("long").as("seq"),
      pg_output_decode(col(frameCol)).as("pg"))

  /** Decoded messages → one row per DML (insert/update/delete) with the
    * relation's column metadata and the transaction's Begin metadata
    * resolved. Output columns: seq, wal_start, msg_type
    * (INSERT/UPDATE/DELETE — the engine's convention), xid,
    * event_time_us (commit timestamp of the enclosing Begin),
    * table_namespace, table_name, doc_id (replica-identity key values
    * joined with ':'), key_values, new_doc / old_doc
    * (column-name → text-value maps; null where the message carries no
    * tuple).
    */
  def relationalize(decoded: DataFrame): DataFrame =
    relationalizeFlat(decoded.select(col("seq"), col("pg.*")))

  /** [[relationalize]] over the flattened frame (seq, <PgWire fields>) —
    * the streaming face unions its persisted registry seed rows into
    * this shape before the carry windows run.
    */
  private[graft] def relationalizeFlat(d: DataFrame): DataFrame = {
    // Carry WITHOUT ordered windows (round 12, measured): the naive
    // rendition — a global last-non-null window for the Begin metadata
    // and a per-oid window for the Relation metadata — moves EVERY
    // frame through one (or one-per-table) partition: 123k ev/s on a
    // 4M-frame capture, the single-partition scale-killer. Metadata
    // frames are RARE by construction (one Relation per table per
    // session/schema-change, one Begin per transaction), so instead the
    // metadata aggregates into per-oid sorted VERSION LISTS that
    // broadcast onto the DML side, and each DML row picks its
    // as-of-`seq` version with an in-row array probe — the DML side
    // never shuffles, never sorts, and the chain stays embarrassingly
    // parallel (423k ev/s decode-to-actions on the same capture;
    // decode alone 3.0M ev/s). The in-row probe is
    // O(versions in the segment) per row; a capture segment is a
    // micro-batch, so both lists are segment-bounded (the streaming
    // face folds them into one row per table across segments).
    val rels = d.filter(col("msg_type") === "relation")
      .groupBy(col("relation_oid"))
      .agg(sort_array(collect_list(struct(col("seq").as("rseq"),
        col("namespace"), col("rel_name"), col("col_names"),
        col("col_key_flags")))).as("_versions"))
    val begins = d.filter(col("msg_type") === "begin")
      .agg(sort_array(collect_list(struct(col("seq").as("bseq"),
        col("xid"), col("commit_ts_micros")))).as("_txs"))
    val asOfRel = expr(
      "element_at(filter(_versions, v -> v.rseq < seq), -1)")
    val asOfTx = expr(
      "element_at(filter(_txs, t -> t.bseq < seq), -1)")
    val carried = d
      .filter(col("msg_type").isin("insert", "update", "delete"))
      .join(broadcast(rels), Seq("relation_oid"), "left")
      .crossJoin(broadcast(begins))
      // ANSI guard: element_at(-1) on an empty filter result must yield
      // null (a DML frame before any Relation/Begin — a torn capture —
      // relationalizes with null metadata and drops at routing, the
      // same outcome the window rendition produced)
      .withColumn("_rv",
        when(size(expr("filter(_versions, v -> v.rseq < seq)")) > 0, asOfRel))
      .withColumn("_tx",
        when(size(expr("filter(_txs, t -> t.bseq < seq)")) > 0, asOfTx))
      .withColumn("r_namespace", col("_rv.namespace"))
      .withColumn("r_name", col("_rv.rel_name"))
      .withColumn("r_cols", col("_rv.col_names"))
      .withColumn("r_keys", col("_rv.col_key_flags"))
      .withColumn("tx_xid", col("_tx.xid"))
      .withColumn("tx_commit_ts", col("_tx.commit_ts_micros"))
    // doc-key source follows the reference handler's keying
    // (example/simple/main.go:109-130): INSERT and UPDATE key by the NEW
    // image — a key-changing UPDATE indexes under the new key — and only
    // DELETE keys by the old image (the only image a delete carries).
    // Key columns are then selected by the relation's key flags.
    val keySource = when(col("msg_type") === "delete",
      coalesce(col("old_values"), col("new_values")))
      .otherwise(coalesce(col("new_values"), col("old_values")))
    val keyVals = expr(
      "transform(filter(arrays_zip(r_cols, r_keys, _key_src), " +
        "x -> x.r_keys), x -> x._key_src)")
    carried
      .withColumn("_key_src", keySource)
      .withColumn("key_values", keyVals)
      .select(
        col("seq"),
        col("wal_start"),
        upper(col("msg_type")).as("msg_type"),
        col("tx_xid").as("xid"),
        col("tx_commit_ts").as("event_time_us"),
        col("r_namespace").as("table_namespace"),
        col("r_name").as("table_name"),
        array_join(col("key_values"), ":").as("doc_id"),
        col("key_values"),
        when(col("new_values").isNotNull,
          map_from_arrays(col("r_cols"), col("new_values"))).as("new_doc"),
        when(col("old_values").isNotNull,
          map_from_arrays(col("r_cols"), col("old_values"))).as("old_doc"))
  }

  /** Relationalized DML → the engine's action schema (event_id,
    * action_type, doc_id, index_name, source): the reference handler's
    * default shape (DELETE → delete action keyed by the old image,
    * INSERT/UPDATE → index action carrying the serialized new image,
    * example/simple/main.go:109-130), routed through the shared
    * three-tier table→index resolution. From here
    * [[CdcOps.dedupLastWriteWins]] / [[CdcOps.ndjsonEncode]] /
    * [[graft.stream.EsBulkSink]] apply unchanged.
    */
  /** Oracle-bearing round trip over the `events` fixture: each event
    * encodes as one pgoutput Insert frame (behind a Begin + Relation
    * preamble, exactly the wire sequence a server emits), the frames
    * decode and relationalize back, and the projected result must
    * hash-match an oracle that derives the same table DIRECTLY from
    * `events` — encode ∘ decode ∘ relationalize proven lossless by an
    * independent engine, not by our own inverse. Text-mode tuples only
    * (longs/strings — float text forms differ across engines by
    * design, so the fixture's numeric payload column stays out).
    */
  val RoundtripRelOid = 51234L
  val RoundtripXid = 77
  val RoundtripTs = 1700000000000000L

  def roundtrip(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftext.PgOutputFunctions.pg_encode_dml
    val spark = events.sparkSession
    import spark.implicits._
    val cols = Seq(("event_id", true, 20L), ("event_type", false, 25L),
      ("user_id", false, 20L), ("props", false, 25L))
    val preamble = Seq(
      (0L, PgWire.encodeXLogData(10L, 999L, RoundtripTs,
        PgWire.encodeBegin(999L, RoundtripTs, RoundtripXid))),
      (1L, PgWire.encodeXLogData(11L, 999L, RoundtripTs,
        PgWire.encodeRelation(RoundtripRelOid, "public", "events", cols)))
    ).toDF("seq", "frame")
    val dml = events.select(
      (col("event_id") + lit(2L)).as("seq"),
      pg_encode_dml("insert", lit(RoundtripRelOid),
        lit(null).cast("array<string>"),
        array(col("event_id").cast("string"), col("event_type"),
          col("user_id").cast("string"), col("props"))).as("frame"))
    relationalize(decode(preamble.unionByName(dml)))
      .select(
        (col("seq") - lit(2L)).as("event_id"),
        col("msg_type").as("op"),
        col("table_namespace"), col("table_name"),
        col("doc_id"), col("xid"), col("event_time_us"),
        element_at(col("new_doc"), "event_type").as("event_type"),
        element_at(col("new_doc"), "user_id").as("user_id_str"),
        element_at(col("new_doc"), "props").as("props"))
  }

  /** DuckDB twin of [[roundtrip]]: the expected relational output
    * straight off the source table — no bytes involved, which is the
    * point.
    */
  def sqlRoundtrip: String =
    s"""SELECT event_id, 'INSERT' AS op,
       |  'public' AS table_namespace, 'events' AS table_name,
       |  CAST(event_id AS VARCHAR) AS doc_id,
       |  CAST($RoundtripXid AS BIGINT) AS xid,
       |  CAST($RoundtripTs AS BIGINT) AS event_time_us,
       |  event_type,
       |  CAST(user_id AS VARCHAR) AS user_id_str,
       |  props
       |FROM events""".stripMargin

  def actions(relationalized: DataFrame,
      mapping: Map[String, String]): DataFrame =
    CdcOps.resolveParentTable(relationalized, mapping).select(
      col("seq").as("event_id"),
      when(col("msg_type") === "DELETE", "delete")
        .otherwise("index").as("action_type"),
      col("doc_id"),
      col("index_name"),
      when(col("msg_type") === "DELETE", lit(null).cast("string"))
        .otherwise(to_json(col("new_doc"))).as("source"))
}
