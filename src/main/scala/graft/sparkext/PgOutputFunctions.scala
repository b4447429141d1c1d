package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** Native Catalyst expression: one captured PostgreSQL replication frame
  * (XLogData / keepalive envelope or bare pgoutput message, binary) →
  * the decoded message struct ([[graft.sources.PgWire.sparkSchema]]).
  *
  * The decode is the per-event hot path of a CDC ingest, so it follows
  * the HashKernels discipline: the byte walking lives in a static
  * kernel ([[graft.sources.PgWire.decodeRow]]) and codegen emits ONE
  * static call — the expression stays inside whole-stage codegen
  * rather than dropping the stage to CodegenFallback interpretation.
  * Malformed frames decode to `msg_type = "malformed"` rows (kernel
  * contract), so the expression itself never raises on bad bytes.
  */
case class PgOutputDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  override def dataType: DataType = graft.sources.PgWire.sparkSchema

  override def prettyName: String = "pg_output_decode"

  override def nullSafeEval(input: Any): Any =
    graft.sources.PgWire.decodeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.sources.PgWire.decodeRow($b);")

  override protected def withNewChildInternal(newChild: Expression): PgOutputDecode =
    copy(child = newChild)
}

object PgOutputFunctions {
  def pg_output_decode(frame: Column): Column =
    ExpressionUtils.column(PgOutputDecode(ExpressionUtils.expression(frame)))
}
