package graft.etl

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CurrentTimestamp, Expression, ExpressionInfo, Literal, Sha2}

/** Session-extension entry point: `--conf
  * spark.sql.extensions=graft.etl.GraftExtensions` makes the
  * Redshift-dialect functions available in EVERY session (including
  * thrift/connect ones) as NATIVE Catalyst expressions — they resolve
  * at analysis time and stay inside whole-stage codegen, unlike a UDF.
  *
  * `f_sha256` (the one warehouse UDF the reference ships,
  * sql/001_ETL_create_f_sha256.sql:4-11) maps to `Sha2(e, 256)`;
  * `getdate` to `CurrentTimestamp`. The SQL-bodied shims in
  * [[DialectShims]] cover per-session registration without the conf.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("f_sha256"),
      new ExpressionInfo(classOf[Sha2].getName, "f_sha256"),
      (children: Seq[Expression]) => Sha2(children.head, Literal(256))))
    ext.injectFunction((
      FunctionIdentifier("getdate"),
      new ExpressionInfo(classOf[CurrentTimestamp].getName, "getdate"),
      (_: Seq[Expression]) => CurrentTimestamp()))
    ext.injectFunction((
      FunctionIdentifier("trunc_utf8_bytes"),
      new ExpressionInfo(classOf[TruncateUtf8Bytes].getName, "trunc_utf8_bytes"),
      (children: Seq[Expression]) => TruncateUtf8Bytes(children.head,
        children(1).eval().asInstanceOf[Number].intValue)))
    ext.injectFunction((
      FunctionIdentifier("bounded_topk"),
      new ExpressionInfo(classOf[graft.queries.BoundedTopK].getName, "bounded_topk"),
      graft.queries.BoundedTopK.builder))
    ext.injectFunction((
      FunctionIdentifier("dot_f"),
      new ExpressionInfo(classOf[graft.queries.DotF].getName, "dot_f"),
      graft.queries.DotF.builder))
    ext.injectFunction((
      FunctionIdentifier("sq8_quantize"),
      new ExpressionInfo(classOf[graft.queries.Sq8Quantize].getName, "sq8_quantize"),
      graft.queries.Sq8Quantize.builder))
    ext.injectFunction((
      FunctionIdentifier("dot_i8"),
      new ExpressionInfo(classOf[graft.queries.DotI8].getName, "dot_i8"),
      graft.queries.DotI8.builder))
    // whole-operator extension: the native as-of join's planner
    // strategy (AsofJoin.register covers conf-less sessions)
    ext.injectPlannerStrategy(_ => new graft.plans.AsofJoinStrategy)
    // automatic materialized-view query rewrite (MvRewrite.register
    // covers conf-less sessions); no-op until a view is registered
    ext.injectOptimizerRule(session => new graft.plans.MvRewriteRule(session))
  }
}
