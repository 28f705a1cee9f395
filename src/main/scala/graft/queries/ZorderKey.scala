package graft.queries

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Morton (Z-order) interleave of k pre-normalized long values —
  * `zorder_key(array(n0, n1, …))` — the sort key behind
  * `attributes.interleaved_sort` (the Redshift INTERLEAVED SORTKEY
  * analog, reference table_design.schema:206 + dialect/redshift
  * .py:136-137).
  *
  * Bit j of input c lands at output bit `j*k + (k-1-c)`, so the
  * inputs' bits alternate (input 0 most significant within each
  * group): sorting by the result clusters rows that are close in ALL
  * k dimensions at once. A table clustered this way gives EVERY
  * interleaved column tight per-file min/max ranges, so a filter on
  * any one of them prunes files/row-groups — the property compound
  * (lexicographic) sort only gives its leading column. The engine
  * normalizes each column to `[0, 2^min(64/k, 21))` from its min/max
  * before interleaving ([[graft.etl.Warehouse]]), so the key fits a
  * long for any k and resolution is identical per column.
  *
  * Null elements yield a null key (the write path coalesces nulls to
  * the column minimum first, keeping them clustered, not scattered).
  */
case class ZorderKey(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    ZorderKey.interleave(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("zBoxed")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |java.lang.Long $boxed = graft.queries.ZorderKey.interleave($v);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ZorderKey =
    copy(child = newChild)
}

object ZorderKey {

  /** Bits interleaved per input: all k inputs must fit 64 output
    * bits; 21 bits (2M distinct cells per dimension) is plenty of
    * clustering resolution, so single-digit k never wastes work on
    * sub-ULP bits. */
  def bitsPerInput(k: Int): Int = math.min(64 / k, 21)

  /** Static kernel shared by eval and generated code. Inputs beyond
    * the per-input bit budget are truncated (the engine's
    * normalization never produces such values). */
  def interleave(vals: ArrayData): java.lang.Long = {
    val k = vals.numElements()
    if (k == 0) return java.lang.Long.valueOf(0L)
    val bits = bitsPerInput(k)
    var out = 0L
    var c = 0
    while (c < k) {
      if (vals.isNullAt(c)) return null
      val v = vals.getLong(c)
      var j = 0
      while (j < bits) {
        out |= ((v >>> j) & 1L) << (j * k + (k - 1 - c))
        j += 1
      }
      c += 1
    }
    java.lang.Long.valueOf(out)
  }

  def builder(children: Seq[Expression]): Expression = {
    require(children.size == 1,
      s"zorder_key(array(...)) takes 1 argument, got ${children.size}")
    ZorderKey(children.head)
  }
}
