package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class DialectShimsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    DialectShims.registerAll(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("GETDATE / DATEADD / DATEDIFF shims resolve to built-ins") {
    val r = spark.sql(
      """SELECT getdate() IS NOT NULL AS has_now,
        |  dateadd_days(3, TIMESTAMP '2020-01-01 00:00:00') AS plus3,
        |  datediff_days(TIMESTAMP '2020-01-01 00:00:00', TIMESTAMP '2020-01-11 00:00:00') AS dd
        |""".stripMargin).collect().head
    assert(r.getBoolean(0))
    assert(r.getTimestamp(1).toString.startsWith("2020-01-04"))
    assert(r.getLong(2) == 10L)
  }

  test("LISTAGG rewrite produces Spark aggregate syntax") {
    val in = "SELECT g, LISTAGG(name, ', ') WITHIN GROUP (ORDER BY name) FROM t GROUP BY g"
    val out = DialectShims.rewriteListagg(in)
    assert(out.contains("array_join(array_sort(collect_list(name)), ', ')"))
    assert(!out.toUpperCase.contains("LISTAGG"))
    // and the rewritten SQL actually runs
    spark.sql("SELECT 'a' AS g, 'x' AS name UNION ALL SELECT 'a', 'y'")
      .createOrReplaceTempView("shim_t")
    val rows = spark.sql(DialectShims.rewriteListagg(
      "SELECT g, LISTAGG(name, ',') WITHIN GROUP (ORDER BY name) AS l FROM shim_t GROUP BY g"))
      .collect()
    assert(rows.head.getString(1) == "x,y")
    // untouched SQL passes through
    assert(DialectShims.rewriteListagg("SELECT 1") == "SELECT 1")
  }

  test("DATEADD rewrite: any Redshift unit spelling, args untouched") {
    assert(DialectShims.rewriteDateAdd("DATEADD(hour, 2, ts)") ==
      "timestampadd(HOUR, 2, ts)")
    assert(DialectShims.rewriteDateAdd("dateadd(mons, f(x, y), t.c)") ==
      "timestampadd(MONTH, f(x, y), t.c)")
    // unknown first token: not a unit call — leave it alone
    assert(DialectShims.rewriteDateAdd("DATEADD(colname, 2, ts)") ==
      "DATEADD(colname, 2, ts)")
    val r = spark.sql(DialectShims.rewriteDateAdd(
      "SELECT DATEADD(hr, 25, TIMESTAMP '2020-01-01 00:00:00') AS t")).collect().head
    assert(r.getTimestamp(0).toString.startsWith("2020-01-02 01:00"))
  }

  test("DATEDIFF rewrite counts boundary crossings (Redshift semantics)") {
    // 23:30 -> next 00:30 is one DAY boundary crossed though only 1h
    val sql = DialectShims.rewriteDateDiff(
      """SELECT
        |  DATEDIFF(day,  TIMESTAMP '2020-01-01 23:30:00', TIMESTAMP '2020-01-02 00:30:00') AS dd,
        |  DATEDIFF(hour, TIMESTAMP '2020-01-01 10:59:00', TIMESTAMP '2020-01-01 11:01:00') AS dh,
        |  DATEDIFF(year, TIMESTAMP '2019-12-31 23:59:59', TIMESTAMP '2020-01-01 00:00:01') AS dy,
        |  DATEDIFF(mon,  TIMESTAMP '2020-01-31 00:00:00', TIMESTAMP '2020-02-01 00:00:00') AS dm
        |""".stripMargin)
    assert(sql.contains("rs_datediff_day(") && sql.contains("rs_datediff_hour("))
    val r = spark.sql(sql).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L, 1L)))
    // Spark's own two-argument DATEDIFF is not mistaken for a unit call
    assert(DialectShims.rewriteDateDiff("DATEDIFF(end_col, start_col)") ==
      "DATEDIFF(end_col, start_col)")
  }

  test("rewriteRedshiftSql composes all passes (FileSets load path)") {
    val in = "SELECT DATEADD(d, 1, t), DATEDIFF(sec, a, b), " +
      "LISTAGG(x, '|') WITHIN GROUP (ORDER BY x) FROM t GROUP BY 1, 2"
    val out = DialectShims.rewriteRedshiftSql(in)
    assert(out.contains("timestampadd(DAY, 1, t)"))
    assert(out.contains("rs_datediff_second( a, b)"))
    assert(out.contains("array_join"))
  }

  test("RATIO_TO_REPORT rewrites to the explicit x/SUM-over-window form") {
    val out = DialectShims.rewriteRatioToReport(
      "SELECT RATIO_TO_REPORT(n) OVER (PARTITION BY flag) AS share FROM g")
    assert(out.contains(
      "(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY flag)) AS share"), out)
    // empty window (whole-result ratio) is legal Redshift
    val global = DialectShims.rewriteRatioToReport(
      "SELECT RATIO_TO_REPORT(v) OVER () FROM g")
    assert(global.contains("(CAST(v AS DOUBLE) / SUM(v) OVER ())"), global)
    // inside a literal the masked composition must not fire
    val lit = DialectShims.rewriteRedshiftSql(
      "SELECT 'RATIO_TO_REPORT(n) OVER (PARTITION BY f)' AS doc FROM t")
    assert(lit.contains("'RATIO_TO_REPORT(n) OVER (PARTITION BY f)'"), lit)
  }

  test("string literals and comments survive the dialect pass verbatim") {
    val in =
      """SELECT 'uses DATEADD(day, 1, x) and LISTAGG(a, ',') WITHIN GROUP (ORDER BY a)' AS doc,
        |  DATEADD(day, 1, ts) AS real_call, -- DATEDIFF(day, a, b) in a comment
        |  /* block with GETDATE() and DATEADD(hr, 2, t) */
        |  'it''s 5%' AS quoted
        |FROM t""".stripMargin
    val out = DialectShims.rewriteRedshiftSql(in)
    assert(out.contains(
      "'uses DATEADD(day, 1, x) and LISTAGG(a, ',') WITHIN GROUP (ORDER BY a)'"),
      out)
    assert(out.contains("timestampadd(DAY, 1, ts)"))
    assert(out.contains("-- DATEDIFF(day, a, b) in a comment"))
    assert(out.contains("/* block with GETDATE() and DATEADD(hr, 2, t) */"))
    assert(out.contains("'it''s 5%'"))
  }

  test("SIMILAR TO rewrites to an anchored RLIKE with Redshift semantics") {
    def eval(sql: String): Boolean =
      spark.sql(DialectShims.rewriteRedshiftSql(s"SELECT $sql AS r"))
        .collect().head.getBoolean(0)
    // % and _ wildcards; whole-string anchoring (substring must fail)
    assert(eval("'abc' SIMILAR TO 'ab%'"))
    assert(eval("'abc' SIMILAR TO 'a_c'"))
    assert(!eval("'xabcx' SIMILAR TO 'abc'"))
    // regex-style alternation/quantifiers carry over
    assert(eval("'abc' SIMILAR TO '%(b|d)%'"))
    assert(eval("'abbbc' SIMILAR TO 'ab+c'"))
    // characters literal in SIMILAR TO but special in regex
    assert(eval("'a.c' SIMILAR TO 'a.c'"))
    assert(!eval("'abc' SIMILAR TO 'a.c'"))
    // escaped wildcard: \% is a literal percent
    assert(eval("'10%' SIMILAR TO '10\\%'"))
    assert(!eval("'10x' SIMILAR TO '10\\%'"))
    // bracket expression passes through
    assert(eval("'b' SIMILAR TO '[abc]'"))
    // NOT SIMILAR TO keeps the negation
    assert(eval("'xyz' NOT SIMILAR TO 'ab%'"))
    // a SIMILAR TO mention inside a literal is NOT rewritten
    val untouched = DialectShims.rewriteRedshiftSql(
      "SELECT 'a SIMILAR TO b' AS s FROM t")
    assert(untouched.contains("'a SIMILAR TO b'"))
  }

  test("SQL containing a NUL character is rejected, not silently corrupted") {
    // NUL is the mask placeholder delimiter: input NULs could misindex
    // the saved-literal table. The shim must refuse up front.
    val e = intercept[IllegalArgumentException](
      DialectShims.rewriteRedshiftSql("SELECT 'a\u0000b' AS s FROM t"))
    assert(e.getMessage.contains("NUL"))
    // NUL-free SQL still passes through the same entry point
    assert(DialectShims.rewriteRedshiftSql("SELECT 'ab' AS s FROM t")
      .contains("'ab'"))
  }
}
