package graft.etl

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Truncate a string to at most `maxBytes` UTF-8 BYTES without
  * splitting a codepoint — Redshift's TRUNCATECOLUMNS semantics
  * (varchar lengths are byte lengths; the reference COPY always sets
  * TRUNCATECOLUMNS, /root/reference/python/etl/dialect/redshift.py:348).
  *
  * A native Catalyst expression, not a UDF: `UTF8String` is already
  * the engine's byte representation, so the fast path (string fits)
  * is a single length compare, and codegen keeps it inside
  * whole-stage codegen. */
case class TruncateUtf8Bytes(child: Expression, maxBytes: Int)
    extends UnaryExpression {

  require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"trunc_utf8_bytes expects a string, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "trunc_utf8_bytes"

  override protected def nullSafeEval(input: Any): Any =
    TruncateUtf8Bytes.truncate(input.asInstanceOf[UTF8String], maxBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.etl.TruncateUtf8Bytes.truncate($c, $maxBytes)")

  override protected def withNewChildInternal(newChild: Expression): TruncateUtf8Bytes =
    copy(child = newChild)
}

object TruncateUtf8Bytes {

  /** Static entry shared by eval and generated code. Walks back from
    * the byte limit past any UTF-8 continuation bytes (10xxxxxx) so
    * the cut never lands inside a codepoint. */
  def truncate(s: UTF8String, maxBytes: Int): UTF8String = {
    if (s.numBytes <= maxBytes) s
    else {
      val bytes = s.getBytes
      var end = maxBytes
      while (end > 0 && (bytes(end) & 0xC0) == 0x80) end -= 1
      UTF8String.fromBytes(bytes, 0, end)
    }
  }
}
