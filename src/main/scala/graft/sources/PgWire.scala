package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Decoder for PostgreSQL's `pgoutput` logical-replication wire format —
  * the byte stream the reference consumes through go-pq-cdc (go.mod:6,
  * connector.go:54-58). Message layouts follow the PUBLIC protocol
  * documentation: "Logical Streaming Replication Protocol" +
  * "Logical Replication Message Formats" (PostgreSQL docs §55.5/§55.10;
  * protocol version 1, the non-streaming layout every supported server
  * emits for `proto_version '1'`).
  *
  * Scope: this is the PROTOCOL half of the reference's source — the
  * part that is pure computation and therefore testable in this
  * zero-egress harness. Frames are decoded from CAPTURED bytes (a
  * replication-slot capture written to files: each row one XLogData or
  * keepalive frame, or a bare pgoutput message). The SOCKET half —
  * START_REPLICATION over a walsender connection — remains the one
  * production integration a user supplies (SURVEY.md §7.3); everything
  * from the first byte onward exists here: envelope LSN bookkeeping,
  * the full message family, relation-schema carry, tuple decode, and
  * the mapping onto the engine's action pipeline
  * ([[graft.ops.PgOutputOps]]).
  *
  * Two layers:
  *   - [[decodeRow]]: one frame → one [[InternalRow]] of [[sparkSchema]]
  *     (called from the codegen'd [[org.apache.spark.sql.graftext
  *     .PgOutputFunctions.pg_output_decode]] expression — the
  *     HashKernels static-call discipline). Malformed bytes yield a
  *     `msg_type = "malformed"` row carrying the error text, NOT an
  *     exception: the R1 dead-letter route handles them like any other
  *     bad-split action, and one corrupt frame must not fail a batch.
  *   - everything else: private byte-walking helpers.
  *
  * All integers are BIG-ENDIAN (network order) per the protocol; text
  * tuple values arrive in PostgreSQL text representation (pgoutput
  * default); binary ('b') values surface as lowercase hex. PostgreSQL
  * timestamps count microseconds from 2000-01-01 and convert to unix
  * epoch micros here ([[PgEpochOffsetMicros]]).
  */
object PgWire {

  /** Unix micros of 2000-01-01T00:00:00Z — the PostgreSQL timestamp epoch. */
  val PgEpochOffsetMicros: Long = 946684800000000L

  val sparkSchema: StructType = StructType(Seq(
    StructField("msg_type", StringType),
    StructField("wal_start", LongType),
    StructField("wal_end", LongType),
    StructField("send_ts_micros", LongType),
    StructField("xid", LongType),
    StructField("lsn", LongType),
    StructField("end_lsn", LongType),
    StructField("commit_ts_micros", LongType),
    StructField("relation_oid", LongType),
    StructField("namespace", StringType),
    StructField("rel_name", StringType),
    StructField("replica_identity", StringType),
    StructField("col_names", ArrayType(StringType)),
    StructField("col_key_flags", ArrayType(BooleanType)),
    StructField("col_type_oids", ArrayType(LongType)),
    StructField("old_kind", StringType),
    StructField("old_values", ArrayType(StringType)),
    StructField("old_value_kinds", ArrayType(StringType)),
    StructField("new_values", ArrayType(StringType)),
    StructField("new_value_kinds", ArrayType(StringType)),
    StructField("truncate_oids", ArrayType(LongType)),
    StructField("truncate_cascade", BooleanType),
    StructField("truncate_restart", BooleanType),
    StructField("msg_prefix", StringType),
    StructField("msg_content", StringType),
    StructField("origin_name", StringType),
    StructField("reply_requested", BooleanType)))

  private val NFields = sparkSchema.length
  private val idx: Map[String, Int] =
    sparkSchema.fieldNames.zipWithIndex.toMap

  // ---------------------------------------------------------- byte walkers

  private def cstring(b: ByteBuffer): String = {
    val start = b.position()
    var end = start
    while (b.get(end) != 0) end += 1
    val bytes = new Array[Byte](end - start)
    b.position(start)
    b.get(bytes)
    b.get() // consume the NUL
    new String(bytes, StandardCharsets.UTF_8)
  }

  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  /** Validate a wire length/count prefix against the bytes actually
    * remaining BEFORE allocating. A corrupt Int32 prefix (up to ~2 GB)
    * must become a 'malformed' dead-letter row like any other bad frame;
    * allocating first would raise OutOfMemoryError — an Error, not an
    * Exception — which escapes [[decodeRow]]'s never-throws contract and
    * kills the executor. `unitBytes` is the minimum wire bytes one
    * counted element occupies (1 for raw payload bytes, 4 for an OID
    * list, etc.), so `count * unitBytes > remaining` is provably corrupt.
    */
  private def checked(count: Int, unitBytes: Int, b: ByteBuffer,
      what: String): Int = {
    if (count < 0 || count.toLong * unitBytes > b.remaining())
      throw new IllegalArgumentException(
        s"$what $count exceeds ${b.remaining()} remaining bytes")
    count
  }

  /** TupleData: Int16 ncols, then per column one of
    * 'n' (null) | 'u' (unchanged TOAST) | 't' Int32 len + bytes (text) |
    * 'b' Int32 len + bytes (binary, surfaced as hex).
    * Returns (values, kinds) — values null for 'n'/'u'.
    */
  private def tupleData(b: ByteBuffer): (GenericArrayData, GenericArrayData) = {
    val n = checked(b.getShort().toInt, 1, b, "TupleData column count")
    val values = new Array[Any](n)
    val kinds = new Array[Any](n)
    var i = 0
    while (i < n) {
      val kind = b.get().toChar
      kinds(i) = utf8(kind.toString)
      kind match {
        case 'n' | 'u' => values(i) = null
        case 't' =>
          val len = checked(b.getInt(), 1, b, "text column length")
          val bytes = new Array[Byte](len)
          b.get(bytes)
          values(i) = UTF8String.fromBytes(bytes)
        case 'b' =>
          val len = checked(b.getInt(), 1, b, "binary column length")
          val bytes = new Array[Byte](len)
          b.get(bytes)
          values(i) = utf8(hex(bytes))
        case other =>
          throw new IllegalArgumentException(
            s"unknown TupleData column kind '$other'")
      }
      i += 1
    }
    (new GenericArrayData(values), new GenericArrayData(kinds))
  }

  private def pgTsToUnixMicros(pgMicros: Long): Long =
    pgMicros + PgEpochOffsetMicros

  // ------------------------------------------------------------- decoding

  /** Decode ONE captured frame: an XLogData ('w') or keepalive ('k')
    * replication envelope, or a bare pgoutput message. Never throws —
    * malformed input yields a `msg_type = "malformed"` row with the
    * error text in `msg_prefix` (dead-letter routing's contract).
    */
  def decodeRow(bytes: Array[Byte]): InternalRow =
    try decodeRowStrict(bytes)
    catch {
      case e: Exception =>
        val r = empty()
        r.update(idx("msg_type"), utf8("malformed"))
        r.update(idx("msg_prefix"),
          utf8(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}"))
        r
    }

  private def empty(): GenericInternalRow = new GenericInternalRow(NFields)

  private def decodeRowStrict(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.isEmpty)
      throw new IllegalArgumentException("empty frame")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val r = empty()
    b.get().toChar match {
      case 'w' => // XLogData envelope: walStart, walEnd, sendTime, payload
        r.update(idx("wal_start"), b.getLong())
        r.update(idx("wal_end"), b.getLong())
        r.update(idx("send_ts_micros"), pgTsToUnixMicros(b.getLong()))
        message(b, r)
      case 'k' => // Primary keepalive: walEnd, sendTime, replyRequested
        r.update(idx("msg_type"), utf8("keepalive"))
        r.update(idx("wal_end"), b.getLong())
        r.update(idx("send_ts_micros"), pgTsToUnixMicros(b.getLong()))
        r.update(idx("reply_requested"), b.get() != 0)
      case _ => // bare pgoutput message (captures that strip the envelope)
        b.position(0)
        message(b, r)
    }
    r
  }

  private def message(b: ByteBuffer, r: GenericInternalRow): Unit =
    b.get().toChar match {
      case 'B' => // Begin: finalLSN, commitTimestamp, xid
        r.update(idx("msg_type"), utf8("begin"))
        r.update(idx("lsn"), b.getLong())
        r.update(idx("commit_ts_micros"), pgTsToUnixMicros(b.getLong()))
        r.update(idx("xid"), b.getInt().toLong)
      case 'C' => // Commit: flags(0), commitLSN, endLSN, commitTimestamp
        r.update(idx("msg_type"), utf8("commit"))
        b.get() // flags, unused (always 0 in v1)
        r.update(idx("lsn"), b.getLong())
        r.update(idx("end_lsn"), b.getLong())
        r.update(idx("commit_ts_micros"), pgTsToUnixMicros(b.getLong()))
      case 'O' => // Origin: commit LSN on origin, origin name
        r.update(idx("msg_type"), utf8("origin"))
        r.update(idx("lsn"), b.getLong())
        r.update(idx("origin_name"), utf8(cstring(b)))
      case 'R' => // Relation: oid, namespace, name, replident, columns
        r.update(idx("msg_type"), utf8("relation"))
        r.update(idx("relation_oid"), b.getInt().toLong & 0xffffffffL)
        r.update(idx("namespace"), utf8(cstring(b)))
        r.update(idx("rel_name"), utf8(cstring(b)))
        val ident = b.get().toChar match {
          case 'd' => "default"
          case 'n' => "nothing"
          case 'f' => "full"
          case 'i' => "index"
          case other => other.toString
        }
        r.update(idx("replica_identity"), utf8(ident))
        // each column occupies ≥ 10 wire bytes: flag(1) + name NUL(≥1)
        // + type oid(4) + atttypmod(4)
        val ncols = checked(b.getShort().toInt, 10, b, "Relation column count")
        val names = new Array[Any](ncols)
        val keys = new Array[Any](ncols)
        val oids = new Array[Any](ncols)
        var i = 0
        while (i < ncols) {
          val flags = b.get()
          names(i) = utf8(cstring(b))
          keys(i) = (flags & 1) != 0
          oids(i) = b.getInt().toLong & 0xffffffffL
          b.getInt() // type modifier (atttypmod) — not surfaced
          i += 1
        }
        r.update(idx("col_names"), new GenericArrayData(names))
        r.update(idx("col_key_flags"), new GenericArrayData(keys))
        r.update(idx("col_type_oids"), new GenericArrayData(oids))
      case 'Y' => // Type: oid, namespace, name
        r.update(idx("msg_type"), utf8("type"))
        r.update(idx("relation_oid"), b.getInt().toLong & 0xffffffffL)
        r.update(idx("namespace"), utf8(cstring(b)))
        r.update(idx("rel_name"), utf8(cstring(b)))
      case 'I' => // Insert: relation oid, 'N', new tuple
        r.update(idx("msg_type"), utf8("insert"))
        r.update(idx("relation_oid"), b.getInt().toLong & 0xffffffffL)
        val marker = b.get().toChar
        if (marker != 'N')
          throw new IllegalArgumentException(
            s"Insert expects 'N' tuple marker, got '$marker'")
        val (vals, kinds) = tupleData(b)
        r.update(idx("new_values"), vals)
        r.update(idx("new_value_kinds"), kinds)
      case 'U' => // Update: relation oid, optional K/O old tuple, N new
        r.update(idx("msg_type"), utf8("update"))
        r.update(idx("relation_oid"), b.getInt().toLong & 0xffffffffL)
        var marker = b.get().toChar
        if (marker == 'K' || marker == 'O') {
          r.update(idx("old_kind"),
            utf8(if (marker == 'K') "key" else "old"))
          val (ov, ok) = tupleData(b)
          r.update(idx("old_values"), ov)
          r.update(idx("old_value_kinds"), ok)
          marker = b.get().toChar
        }
        if (marker != 'N')
          throw new IllegalArgumentException(
            s"Update expects 'N' tuple marker, got '$marker'")
        val (nv, nk) = tupleData(b)
        r.update(idx("new_values"), nv)
        r.update(idx("new_value_kinds"), nk)
      case 'D' => // Delete: relation oid, K/O old tuple
        r.update(idx("msg_type"), utf8("delete"))
        r.update(idx("relation_oid"), b.getInt().toLong & 0xffffffffL)
        val marker = b.get().toChar
        if (marker != 'K' && marker != 'O')
          throw new IllegalArgumentException(
            s"Delete expects 'K' or 'O' tuple marker, got '$marker'")
        r.update(idx("old_kind"),
          utf8(if (marker == 'K') "key" else "old"))
        val (ov, ok) = tupleData(b)
        r.update(idx("old_values"), ov)
        r.update(idx("old_value_kinds"), ok)
      case 'T' => // Truncate: nRelations, options, oids
        r.update(idx("msg_type"), utf8("truncate"))
        val n = checked(b.getInt(), 4, b, "Truncate relation count")
        val options = b.get()
        val oids = new Array[Any](n)
        var i = 0
        while (i < n) { oids(i) = b.getInt().toLong & 0xffffffffL; i += 1 }
        r.update(idx("truncate_oids"), new GenericArrayData(oids))
        r.update(idx("truncate_cascade"), (options & 1) != 0)
        r.update(idx("truncate_restart"), (options & 2) != 0)
      case 'M' => // Message: flags, lsn, prefix, length, content
        r.update(idx("msg_type"), utf8("message"))
        b.get() // flags (1 = transactional) — not surfaced
        r.update(idx("lsn"), b.getLong())
        r.update(idx("msg_prefix"), utf8(cstring(b)))
        val len = checked(b.getInt(), 1, b, "Message content length")
        val content = new Array[Byte](len)
        b.get(content)
        r.update(idx("msg_content"), utf8(hex(content)))
      case other =>
        throw new IllegalArgumentException(
          s"unknown pgoutput message type '$other'")
    }

  // ------------------------------------------------------------- encoding

  /** Message/envelope ENCODERS — the write half of the wire: capture
    * fixtures for tests, synthetic replication streams for drills, and
    * the one frame a CLIENT sends upstream — the Standby Status Update
    * that acks a flushed LSN (protocol §55.4 `r` message: the byte-level
    * form of the reference's ack-after-flush, bulk.go:271-276). Byte
    * layouts mirror [[decodeRow]] exactly; `decode(encode(m)) == m` is
    * spec-pinned per family, and the oracle-bearing round-trip key
    * ([[graft.ops.PgOutputOps.roundtrip]]) proves encode → decode →
    * relationalize lossless against an independent engine.
    */
  private def out(f: java.io.DataOutputStream => Unit): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val o = new java.io.DataOutputStream(bos)
    f(o)
    o.flush()
    bos.toByteArray
  }
  private def wcstr(o: java.io.DataOutputStream, s: String): Unit = {
    o.write(s.getBytes(StandardCharsets.UTF_8)); o.writeByte(0)
  }

  def encodeXLogData(walStart: Long, walEnd: Long, sendUnixMicros: Long,
      payload: Array[Byte]): Array[Byte] = out { o =>
    o.writeByte('w'); o.writeLong(walStart); o.writeLong(walEnd)
    o.writeLong(sendUnixMicros - PgEpochOffsetMicros); o.write(payload)
  }

  def encodeKeepalive(walEnd: Long, sendUnixMicros: Long,
      replyRequested: Boolean): Array[Byte] = out { o =>
    o.writeByte('k'); o.writeLong(walEnd)
    o.writeLong(sendUnixMicros - PgEpochOffsetMicros)
    o.writeByte(if (replyRequested) 1 else 0)
  }

  /** Standby Status Update — the client→server ack ('r'): WAL written /
    * flushed / applied positions, client clock, reply flag. Sending
    * `flushed` past a commit's end LSN is the replication-slot advance
    * the reference performs on `lastAckCtx.Ack()`.
    */
  def encodeStandbyStatusUpdate(written: Long, flushed: Long, applied: Long,
      clockUnixMicros: Long, replyRequested: Boolean): Array[Byte] = out { o =>
    o.writeByte('r'); o.writeLong(written); o.writeLong(flushed)
    o.writeLong(applied); o.writeLong(clockUnixMicros - PgEpochOffsetMicros)
    o.writeByte(if (replyRequested) 1 else 0)
  }

  def encodeBegin(finalLsn: Long, commitUnixMicros: Long, xid: Int): Array[Byte] =
    out { o =>
      o.writeByte('B'); o.writeLong(finalLsn)
      o.writeLong(commitUnixMicros - PgEpochOffsetMicros); o.writeInt(xid)
    }

  def encodeCommit(commitLsn: Long, endLsn: Long,
      commitUnixMicros: Long): Array[Byte] = out { o =>
    o.writeByte('C'); o.writeByte(0); o.writeLong(commitLsn)
    o.writeLong(endLsn); o.writeLong(commitUnixMicros - PgEpochOffsetMicros)
  }

  /** cols: (name, isKey, typeOid). Replica identity 'd' (default). */
  def encodeRelation(oid: Long, namespace: String, name: String,
      cols: Seq[(String, Boolean, Long)]): Array[Byte] = out { o =>
    o.writeByte('R'); o.writeInt(oid.toInt); wcstr(o, namespace)
    wcstr(o, name); o.writeByte('d'); o.writeShort(cols.size)
    cols.foreach { case (cn, key, typeOid) =>
      o.writeByte(if (key) 1 else 0); wcstr(o, cn)
      o.writeInt(typeOid.toInt); o.writeInt(-1)
    }
  }

  private def writeTuple(o: java.io.DataOutputStream, values: ArrayData): Unit = {
    val n = values.numElements()
    o.writeShort(n)
    var i = 0
    while (i < n) {
      if (values.isNullAt(i)) o.writeByte('n')
      else {
        val b = values.getUTF8String(i).getBytes
        o.writeByte('t'); o.writeInt(b.length); o.write(b)
      }
      i += 1
    }
  }

  /** DML encoder kernel (codegen'd through [[org.apache.spark.sql
    * .graftext.PgOutputFunctions.pg_encode_dml]]): op ∈
    * insert|update|delete, text-mode tuples (null column → 'n').
    * Updates carry the old tuple as 'O' when present; deletes emit 'K'.
    */
  def encodeDml(op: UTF8String, relOid: Long, oldValues: ArrayData,
      newValues: ArrayData): Array[Byte] = out { o =>
    op.toString match {
      case "insert" =>
        o.writeByte('I'); o.writeInt(relOid.toInt)
        o.writeByte('N'); writeTuple(o, newValues)
      case "update" =>
        o.writeByte('U'); o.writeInt(relOid.toInt)
        if (oldValues != null) { o.writeByte('O'); writeTuple(o, oldValues) }
        o.writeByte('N'); writeTuple(o, newValues)
      case "delete" =>
        o.writeByte('D'); o.writeInt(relOid.toInt)
        o.writeByte('K'); writeTuple(o, oldValues)
      case other =>
        throw new IllegalArgumentException(s"encodeDml: unknown op '$other'")
    }
  }
}
