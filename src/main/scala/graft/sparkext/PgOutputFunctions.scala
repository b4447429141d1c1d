package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType, StringType}

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

/** Encode half: (relOid long, oldValues array<string>, newValues
  * array<string>) → one pgoutput DML frame (binary); `op` is a
  * call-site constant (insert/update/delete), so it rides the
  * expression as a parameter, not a child. Same static-kernel codegen
  * as the decoder.
  */
case class PgDmlEncode(op: String, relOid: Expression, oldValues: Expression,
    newValues: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def first: Expression = relOid
  override def second: Expression = oldValues
  override def third: Expression = newValues

  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = BinaryType

  override def prettyName: String = "pg_encode_dml"

  // old/new tuples are legitimately absent per op (insert has no old,
  // delete no new) — null children must reach the kernel, not null the
  // result, so evaluation is manual rather than nullSafe
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val oid = relOid.eval(input)
    if (oid == null) return null
    val o = oldValues.eval(input)
    val n = newValues.eval(input)
    graft.sources.PgWire.encodeDml(
      org.apache.spark.unsafe.types.UTF8String.fromString(op),
      oid.asInstanceOf[Long],
      o.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      n.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val oidG = relOid.genCode(ctx)
    val oldG = oldValues.genCode(ctx)
    val newG = newValues.genCode(ctx)
    val opLit = ctx.addReferenceObj("pgOp",
      org.apache.spark.unsafe.types.UTF8String.fromString(op),
      "org.apache.spark.unsafe.types.UTF8String")
    ev.copy(code =
      code"""
        |${oidG.code}
        |${oldG.code}
        |${newG.code}
        |boolean ${ev.isNull} = ${oidG.isNull};
        |byte[] ${ev.value} = null;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.sources.PgWire.encodeDml($opLit, ${oidG.value},
        |    ${oldG.isNull} ? null : ${oldG.value},
        |    ${newG.isNull} ? null : ${newG.value});
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PgDmlEncode =
    copy(relOid = newFirst, oldValues = newSecond, newValues = newThird)
}

object PgOutputFunctions {
  def pg_output_decode(frame: Column): Column =
    ExpressionUtils.column(PgOutputDecode(ExpressionUtils.expression(frame)))

  def pg_encode_dml(op: String, relOid: Column, oldValues: Column,
      newValues: Column): Column =
    ExpressionUtils.column(PgDmlEncode(op,
      ExpressionUtils.expression(relOid),
      ExpressionUtils.expression(oldValues),
      ExpressionUtils.expression(newValues)))
}
