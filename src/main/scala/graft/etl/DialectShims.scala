package graft.etl

import org.apache.spark.sql.SparkSession

/** Redshift-dialect compatibility shims (SURVEY §7.2): transform SQL
  * written for the reference warehouse uses a handful of functions
  * Spark names differently. Registered as thin SQL aliases so
  * existing `.sql` files run unmodified; each maps to a codegen'd
  * built-in (no UDF in the hot path).
  *
  * | Redshift | Spark mapping |
  * |---|---|
  * | GETDATE() | current_timestamp() |
  * | DATEADD(unit, n, ts) | ts + make_interval/n unit |
  * | DATEDIFF(unit, a, b) | timestampdiff(unit, a, b) |
  * | LISTAGG(x, sep) | array_join(collect_list(x), sep) |
  * | NVL(a, b) | coalesce — already a Spark builtin |
  * | f_sha256(s) | sha2(s, 256) (Commands.registerUdfs) |
  */
object DialectShims {

  def registerAll(spark: SparkSession): Unit = {
    // SQL-bodied temp functions resolve to built-ins at plan time —
    // they inline into the analyzed plan, keeping codegen intact.
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION getdate() RETURNS TIMESTAMP RETURN current_timestamp()")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION dateadd_days(n INT, ts TIMESTAMP)
        |RETURNS TIMESTAMP RETURN timestampadd(DAY, n, ts)""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION datediff_days(a TIMESTAMP, b TIMESTAMP)
        |RETURNS BIGINT RETURN timestampdiff(DAY, a, b)""".stripMargin)
    Commands.registerUdfs(spark)
    // LISTAGG has no scalar-function shim (it is an aggregate):
    // rewrite `LISTAGG(x, ',') WITHIN GROUP (ORDER BY x)` to
    // `array_join(array_sort(collect_list(x)), ',')` — see
    // rewriteListagg below for query-text level compat.
  }

  private val ListaggRe =
    raw"(?i)LISTAGG\s*\(\s*([^,()]+)\s*,\s*('[^']*')\s*\)\s*WITHIN\s+GROUP\s*\(\s*ORDER\s+BY\s+([^()]+?)\s*\)".r

  /** Text-level rewrite of the LISTAGG aggregate (ordered variant) to
    * Spark's array_join(array_sort(collect_list(...))). The reference
    * ships queries in .sql files (relation.py:279-293); this runs as
    * part of loading them. Only the common `ORDER BY <same column>`
    * shape is rewritten — anything else surfaces to the dry-run
    * validator (C5) as unsupported syntax. */
  def rewriteListagg(sql: String): String =
    ListaggRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"array_join(array_sort(collect_list(${m.group(1).trim})), ${m.group(2)})"))
}
