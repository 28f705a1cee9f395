package graft.queries

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native float-array dot product — the hot inner loop of the whole
  * ANN family (brute-force scoring is n × |queries| evaluations, IVF
  * assignment n × √n), previously expressed as
  * `aggregate(zip_with(a, b, (p, q) => p * q), 0.0, _ + _)`: Spark's
  * higher-order functions allocate a zipped intermediate array and
  * evaluate the lambda per element through `CodegenFallback` — an
  * interpreted call chain in the middle of the scan stage. This
  * expression is one tight codegen'd loop over the two `ArrayData`
  * buffers: no intermediate array, no lambda dispatch, and the
  * surrounding projection stays inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the fold it replaces (and to the DuckDB
  * oracle's `list_sum` comprehension): left-to-right accumulation of
  * `(double) x[i] * (double) y[i]` — float→double widening per
  * element, sequential double adds, so results are bit-equal and the
  * oracle hashes are unaffected. A null element yields null (as the
  * fold's `acc + null` did); length mismatch dots the common prefix
  * (embeddings are fixed-width, so this never fires in practice).
  */
case class DotF(left: Expression, right: Expression) extends BinaryExpression {

  // each side may be array<float> or array<double> (the LSH hyperplane
  // constants are double literals); elements widen to double exactly
  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f expects array<float>/array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"
  // a null ELEMENT makes the result null even though both arrays are
  // non-null, so the expression is nullable regardless of children
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotF.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("dotBoxed")
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $boxed = graft.queries.DotF.dot($a, $b, $lf, $rf);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF =
    copy(left = newLeft, right = newRight)
}

object DotF {

  /** Static kernel shared by eval and generated code: one pass, no
    * allocation. Boxed return so the null-element case has a channel
    * (the JIT unboxes the hot non-null path). `xFloat`/`yFloat` pick
    * the element accessor per side (compile-time constants in the
    * generated code, so the JIT sees straight-line loops). */
  def dot(x: ArrayData, y: ArrayData,
          xFloat: Boolean, yFloat: Boolean): java.lang.Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def builder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"dot_f(a, b) takes 2 arguments, got ${children.size}")
    DotF(children.head, children(1))
  }

  /** Idempotent per-session registration (the [[BoundedTopK.register]]
    * pattern), so `call_function("dot_f", ...)` resolves without the
    * extensions conf. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f", builder, "built-in")
}
