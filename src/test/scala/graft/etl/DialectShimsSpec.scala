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

  test("SYSDATE rewrites parenless; literals and lookalikes survive") {
    val got = DialectShims.rewriteRedshiftSql(
      "SELECT SYSDATE, sysdate AS s2, 'SYSDATE' AS lit, mysysdate, t.sysdate_col FROM t")
    // both bare spellings rewritten, case-insensitively
    assert(got.startsWith("SELECT current_timestamp(), current_timestamp() AS s2"))
    // a literal, a larger identifier, and a qualified column survive
    assert(got.contains("'SYSDATE'"))
    assert(got.contains("mysysdate"))
    assert(got.contains("t.sysdate_col"))
    // the rewritten query actually evaluates
    val r = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT CAST(SYSDATE >= TIMESTAMP '2000-01-01 00:00:00' AS BOOLEAN) AS ok"))
      .collect().head
    assert(r.getBoolean(0))
  }

  test("CONVERT_TIMEZONE: 2-arg source is UTC, 3-arg pivots, nesting safe") {
    def one(sql: String): String =
      spark.sql(DialectShims.rewriteRedshiftSql(s"SELECT CAST($sql AS STRING) AS v"))
        .collect().head.getString(0)
    // 2-arg: source UTC by Redshift definition (session tz is UTC
    // here, but the rewrite must emit from_utc_timestamp regardless)
    assert(DialectShims.rewriteRedshiftSql(
      "SELECT CONVERT_TIMEZONE('America/New_York', ts) FROM t")
      .contains("from_utc_timestamp(ts, 'America/New_York')"))
    // named zone with DST: Jan 1 UTC → EST (-5)
    assert(one("CONVERT_TIMEZONE('America/New_York', TIMESTAMP '2024-01-01 12:00:00')")
      == "2024-01-01 07:00:00")
    // and in July → EDT (-4)
    assert(one("CONVERT_TIMEZONE('America/New_York', TIMESTAMP '2024-07-01 12:00:00')")
      == "2024-07-01 08:00:00")
    // 3-arg: src +02:00 → tgt -03:00 nets -5h
    assert(one("CONVERT_TIMEZONE('+02:00', '-03:00', TIMESTAMP '2024-01-01 12:00:00')")
      == "2024-01-01 07:00:00")
    // nested parens/commas in the timestamp argument split correctly
    assert(one("CONVERT_TIMEZONE('+01:00', COALESCE(NULL, TIMESTAMP '2024-01-01 00:00:00'))")
      == "2024-01-01 01:00:00")
    // 1-arg / 4-arg shapes are left untouched for the dry-run
    assert(DialectShims.rewriteRedshiftSql("SELECT CONVERT_TIMEZONE(a) FROM t")
      .contains("CONVERT_TIMEZONE(a)"))
  }

  test("TO_CHAR pattern map: per-token case wraps, literals, unsupported") {
    def one(sql: String): String =
      spark.sql(DialectShims.rewriteRedshiftSql(s"SELECT $sql AS v"))
        .collect().head.getString(0)
    val ts = "TIMESTAMP '2024-02-03 13:05:09'" // Saturday
    assert(one(s"TO_CHAR($ts, 'YYYY-MM-DD')") == "2024-02-03")
    assert(one(s"TO_CHAR($ts, 'YYYY-MON-DD')") == "2024-FEB-03")
    assert(one(s"TO_CHAR($ts, 'Mon')") == "Feb")
    assert(one(s"TO_CHAR($ts, 'mon')") == "feb")
    // mixed case in ONE format — needs per-token wrapping
    assert(one(s"TO_CHAR($ts, 'Dy DD MON YYYY')") == "Sat 03 FEB 2024")
    // PG blank-pads Month/Day to 9 chars (longest English name);
    // FM suppresses it for the NEXT token only
    assert(one(s"TO_CHAR($ts, 'Day')") == "Saturday ")
    assert(one(s"TO_CHAR($ts, 'day')") == "saturday ")
    assert(one(s"TO_CHAR($ts, 'FMDay')") == "Saturday")
    assert(one(s"TO_CHAR($ts, 'Month YYYY')") == "February  2024")
    assert(one(s"TO_CHAR($ts, 'FMMonth YYYY')") == "February 2024")
    assert(one(s"TO_CHAR($ts, 'FMDD DD')") == "3 03")
    // times: HH is 12-hour in PG; HH24 is 24-hour; MI minutes
    assert(one(s"TO_CHAR($ts, 'HH24:MI:SS')") == "13:05:09")
    assert(one(s"TO_CHAR($ts, 'HH12:MI PM')") == "01:05 PM")
    assert(one(s"TO_CHAR($ts, 'hh24:mi:ss')") == "13:05:09")
    // quarter + day-of-year
    assert(one(s"TO_CHAR($ts, 'Q')") == "1")
    assert(one(s"TO_CHAR($ts, 'DDD')") == "034")
    assert(one(s"TO_CHAR($ts, 'FMDDD')") == "34")
    // unrecognized chars pass through as literals
    assert(one(s"TO_CHAR($ts, 'YYYY/MM')") == "2024/02")
    // number-mode formats now go through the numeric translator
    assert(!DialectShims.rewriteRedshiftSql("SELECT TO_CHAR(x, '999.99') FROM t")
      .toUpperCase.contains("TO_CHAR"))
    // non-literal format is left untouched
    assert(DialectShims.rewriteRedshiftSql("SELECT TO_CHAR(x, fmt_col) FROM t")
      .contains("TO_CHAR(x, fmt_col)"))
    // a TO_CHAR mention inside a string literal survives
    assert(DialectShims.rewriteRedshiftSql("SELECT 'uses TO_CHAR(x, y)' AS s")
      .contains("'uses TO_CHAR(x, y)'"))
    // nested call in the timestamp argument composes
    assert(one(s"TO_CHAR(COALESCE(NULL, $ts), 'YYYY')") == "2024")
    // a TRANSLATABLE call nested inside an UNSUPPORTED outer call of
    // the same name still translates — the outer name is kept but its
    // arguments are emitted rewritten, not re-dumped raw
    val nested = DialectShims.rewriteRedshiftSql(
      s"SELECT TO_CHAR(TO_CHAR($ts, 'YYYY'), fmt_col) FROM t")
    assert(nested.contains("TO_CHAR(") && !nested.contains("'YYYY'"),
      s"inner TO_CHAR must be rewritten inside the kept outer call: $nested")
    assert(nested.contains("date_format") || nested.contains("concat") ||
      nested.contains("upper("), s"expected a rewritten inner expression: $nested")
  }

  test("TO_DATE / TO_TIMESTAMP parse patterns translate; unsupported stay put") {
    // pattern map: numeric tokens, any case, separators verbatim
    assert(DialectShims.toParsePattern("MM/DD/YYYY") == Some("MM/dd/yyyy"))
    assert(DialectShims.toParsePattern("yyyy-mm-dd") == Some("yyyy-MM-dd"))
    assert(DialectShims.toParsePattern("YYYY-MM-DD HH24:MI:SS") ==
      Some("yyyy-MM-dd HH:mm:ss"))
    // name tokens parse case-insensitively in PG but not in Java —
    // refuse rather than mistranslate
    assert(DialectShims.toParsePattern("DD MON YYYY").isEmpty)
    def one(sql: String): String =
      spark.sql(DialectShims.rewriteRedshiftSql(s"SELECT $sql AS v"))
        .collect().head.get(0).toString
    assert(one("TO_DATE('02/28/1996', 'MM/DD/YYYY')") == "1996-02-28")
    assert(one("TO_TIMESTAMP('1996-02-28 13:05:09', 'YYYY-MM-DD HH24:MI:SS')")
      .startsWith("1996-02-28 13:05:09"))
    // round-trip through the TO_CHAR shim (nested-call composition)
    assert(one("TO_DATE(TO_CHAR(TIMESTAMP '1996-07-04 10:00:00', 'MM/DD/YYYY'), 'MM/DD/YYYY')")
      == "1996-07-04")
    // unsupported format: the call survives untranslated (dry-run's job)
    assert(DialectShims.rewriteRedshiftSql(
      "SELECT TO_DATE(x, 'DD Mon YYYY') FROM t")
      .contains("TO_DATE(x, 'DD Mon YYYY')"))
    // a literal mentioning TO_DATE survives
    assert(DialectShims.rewriteRedshiftSql("SELECT 'call TO_DATE(a, b)' AS s")
      .contains("'call TO_DATE(a, b)'"))
  }

  test("QUALIFY rewrites to a filtered subquery; nested and literal-safe") {
    val s = spark
    import s.implicits._
    spark.range(10).selectExpr("id", "id % 3 AS g")
      .createOrReplaceTempView("qt")
    // basic: keep each group's max id; ORDER BY applies after the filter
    val basic = DialectShims.rewriteRedshiftSql(
      """SELECT g, id FROM qt
        |QUALIFY row_number() OVER (PARTITION BY g ORDER BY id DESC) = 1
        |ORDER BY g""".stripMargin)
    assert(spark.sql(basic).collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq == Seq((0L, 9L), (1L, 7L), (2L, 8L)))
    // QUALIFY inside a subquery rewrites independently of the outer query
    val nested = DialectShims.rewriteRedshiftSql(
      """SELECT COUNT(*) AS n FROM (
        |  SELECT g FROM qt QUALIFY row_number() OVER (PARTITION BY g ORDER BY id) <= 2
        |)""".stripMargin)
    assert(spark.sql(nested).collect().head.getLong(0) == 6L)
    // a LIMIT after QUALIFY limits the FILTERED rows
    val limited = DialectShims.rewriteRedshiftSql(
      """SELECT g, id FROM qt
        |QUALIFY row_number() OVER (PARTITION BY g ORDER BY id) = 1
        |ORDER BY g LIMIT 2""".stripMargin)
    assert(spark.sql(limited).count() == 2)
    // the word inside a string literal survives untouched
    assert(DialectShims.rewriteRedshiftSql("SELECT 'no QUALIFY here' AS s")
      .contains("'no QUALIFY here'"))
    // an identifier containing the word is not a keyword
    assert(DialectShims.rewriteQualify("SELECT disqualify FROM t")
      == "SELECT disqualify FROM t")
  }

  test("JSON_EXTRACT_PATH_TEXT / ARRAY_ELEMENT_TEXT translate to get_json_object") {
    def one(sql: String): Any =
      spark.sql(DialectShims.rewriteRedshiftSql(s"SELECT $sql AS v"))
        .collect().head.get(0)
    assert(one("""JSON_EXTRACT_PATH_TEXT('{"a": {"b": 7}}', 'a', 'b')""") == "7")
    assert(one("""JSON_EXTRACT_PATH_TEXT('{"a": 1}', 'missing')""") == null)
    // the null_if_invalid flag is accepted and dropped
    assert(one("""JSON_EXTRACT_PATH_TEXT('not json', 'a', true)""") == null)
    assert(one("""JSON_EXTRACT_ARRAY_ELEMENT_TEXT('[10, 20, 30]', 1)""") == "20")
    // non-literal key, dotted key, expression index: left for dry-run
    assert(DialectShims.rewriteRedshiftSql("SELECT JSON_EXTRACT_PATH_TEXT(j, k) FROM t")
      .contains("JSON_EXTRACT_PATH_TEXT(j, k)"))
    assert(DialectShims.rewriteRedshiftSql("SELECT JSON_EXTRACT_PATH_TEXT(j, 'a.b') FROM t")
      .contains("'a.b'"))
    assert(DialectShims.rewriteRedshiftSql("SELECT JSON_EXTRACT_ARRAY_ELEMENT_TEXT(j, i+1) FROM t")
      .contains("JSON_EXTRACT_ARRAY_ELEMENT_TEXT(j, i+1)"))
  }

  test("APPROXIMATE COUNT(DISTINCT x) rewrites to approx_count_distinct; within 2%") {
    val in = "SELECT APPROXIMATE COUNT(DISTINCT o_custkey) AS u FROM rs_o"
    val out = DialectShims.rewriteRedshiftSql(in)
    assert(out.contains("approx_count_distinct(DISTINCT".replace("(DISTINCT", "(")),
      out)
    assert(!out.toUpperCase.contains("APPROXIMATE"), out)
    // a string literal mentioning the keyword is untouched (masking)
    val lit = DialectShims.rewriteRedshiftSql(
      "SELECT 'APPROXIMATE COUNT(DISTINCT x)' AS s")
    assert(lit.contains("'APPROXIMATE COUNT(DISTINCT x)'"), lit)
    // and the rewrite RUNS, landing within 2% of the exact count
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("rs_o")
    val approx = spark.sql(out).collect().head.getLong(0).toDouble
    val exact = spark.sql(
      "SELECT COUNT(DISTINCT o_custkey) FROM rs_o").collect().head.getLong(0)
    assert(math.abs(approx - exact) / exact <= 0.02,
      s"approx $approx vs exact $exact")
  }

  test("CHARINDEX / LEN / STRTOL shims: argument order, absent needle, base parse") {
    val r = spark.sql(
      """SELECT charindex('dex', 'Charindex'), charindex('zz', 'abc'),
        |  len('hello'), strtol('ff', 16), strtol('0644', 8)
        |""".stripMargin).collect().head
    assert(r.getInt(0) == 7, "CHARINDEX is (needle, haystack), 1-based")
    assert(r.getInt(1) == 0, "absent needle is 0, not null")
    assert(r.getInt(2) == 5)
    assert(r.getLong(3) == 255L)
    assert(r.getLong(4) == 420L, "base-8 parse")
  }

  test("SELECT TOP n becomes LIMIT n in the right query block") {
    def rw(s: String) = DialectShims.rewriteRedshiftSql(s)
    assert(rw("SELECT TOP 5 a FROM t ORDER BY a") ==
      "SELECT a FROM t ORDER BY a LIMIT 5")
    assert(rw("SELECT DISTINCT TOP 3 a FROM t") ==
      "SELECT DISTINCT a FROM t LIMIT 3")
    // nested block: the LIMIT lands inside the subquery's parens
    assert(rw("SELECT x FROM (SELECT TOP 2 a AS x FROM t ORDER BY a) s") ==
      "SELECT x FROM (SELECT a AS x FROM t ORDER BY a LIMIT 2) s")
    // both levels at once
    assert(rw("SELECT TOP 1 x FROM (SELECT TOP 2 a AS x FROM t) s") ==
      "SELECT x FROM (SELECT a AS x FROM t LIMIT 2) s LIMIT 1")
    // a literal mentioning TOP must not trip the rewrite
    assert(rw("SELECT 'TOP 5' AS s FROM t") == "SELECT 'TOP 5' AS s FROM t")
    // TOP in a set-operation branch is ambiguous — refused loudly,
    // whether the set-op keyword FOLLOWS the TOP or PRECEDES it
    val e = intercept[IllegalArgumentException](
      rw("SELECT TOP 5 a FROM t UNION SELECT a FROM u"))
    assert(e.getMessage.contains("set-operation"))
    val e2 = intercept[IllegalArgumentException](
      rw("SELECT a FROM t UNION SELECT TOP 5 a FROM u"))
    assert(e2.getMessage.contains("set-operation"))
    // ...including inside a subquery block
    val e3 = intercept[IllegalArgumentException](
      rw("SELECT x FROM (SELECT a AS x FROM t EXCEPT SELECT TOP 2 a FROM u) s"))
    assert(e3.getMessage.contains("set-operation"))
    // ...but a UNION inside a deeper subquery does not confuse scope
    assert(rw("SELECT TOP 5 a FROM (SELECT a FROM t UNION SELECT a FROM u) s") ==
      "SELECT a FROM (SELECT a FROM t UNION SELECT a FROM u) s LIMIT 5")
  }

  test("REGEXP family: position, occurrence, flags, arg order — live eval") {
    def evalStr(redshift: String): String = {
      val out = DialectShims.rewriteRedshiftSql(s"SELECT $redshift AS v")
      spark.sql(out).collect().head.get(0).toString
    }
    // REGEXP_SUBSTR: default / position / occurrence / 'i' flag
    assert(evalStr("REGEXP_SUBSTR('ab12cd34ef', '[0-9]+')") == "12")
    // search starts AT position 4 (the '2'), so the match is '2'
    assert(evalStr("REGEXP_SUBSTR('ab12cd34ef', '[0-9]+', 4)") == "2")
    assert(evalStr("REGEXP_SUBSTR('ab12cd34ef', '[0-9]+', 1, 2)") == "34")
    assert(evalStr("REGEXP_SUBSTR('ab12cd34ef', 'CD', 1, 1, 'i')") == "cd")
    // no match → empty string, Redshift semantics (not NULL)
    assert(evalStr("REGEXP_SUBSTR('abc', '[0-9]+')") == "")
    // NULL input → NULL
    assert(spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT REGEXP_SUBSTR(CAST(NULL AS STRING), '[0-9]+') AS v"))
      .collect().head.isNullAt(0))
    // REGEXP_COUNT with position: matches before `position` don't count
    assert(evalStr("REGEXP_COUNT('ab12cd34ef56', '[0-9]{2}')") == "3")
    assert(evalStr("REGEXP_COUNT('ab12cd34ef56', '[0-9]{2}', 5)") == "2")
    assert(evalStr("REGEXP_COUNT('ABAB', 'ab', 1, 'i')") == "2")
    // REGEXP_INSTR: occurrence, end-option, position offset
    assert(evalStr("REGEXP_INSTR('ab12cd34ef', '[0-9]+')") == "3")
    assert(evalStr("REGEXP_INSTR('ab12cd34ef', '[0-9]+', 1, 2)") == "7")
    assert(evalStr("REGEXP_INSTR('ab12cd34ef', '[0-9]+', 1, 2, 1)") == "9")
    assert(evalStr("REGEXP_INSTR('ab12cd34ef', '[0-9]+', 4)") == "4")
    assert(evalStr("REGEXP_INSTR('abc', '[0-9]')") == "0")
    // REGEXP_REPLACE: 2-arg delete form, position arg keeps the prefix
    assert(evalStr("REGEXP_REPLACE('a1b2c3', '[0-9]')") == "abc")
    assert(evalStr("REGEXP_REPLACE('a1b2c3', '[0-9]', 'x')") == "axbxcx")
    assert(evalStr("REGEXP_REPLACE('a1b2c3', '[0-9]', 'x', 3)") == "a1bxcx")
    // 'e': return the first subexpression of the match
    assert(evalStr("REGEXP_SUBSTR('order id 42 shipped', 'id ([0-9]+)', 1, 1, 'e')") == "42")
    // 'e' with no subexpression in the pattern is ignored (Redshift)
    assert(evalStr("REGEXP_SUBSTR('abc 42', '[0-9]+', 1, 1, 'e')") == "42")
    // 'ie' combine
    assert(evalStr("REGEXP_SUBSTR('ID 7', 'id ([0-9]+)', 1, 1, 'ie')") == "7")
    // unsupported PCRE param mode survives untranslated (C5 surfaces it)
    val kept = DialectShims.rewriteRedshiftSql(
      "SELECT REGEXP_SUBSTR(s, 'x', 1, 1, 'p') FROM t")
    assert(kept.toUpperCase.contains("REGEXP_SUBSTR"))
  }

  test("TO_NUMBER passes through; datepart TRUNC truncates and types") {
    def evalStr(redshift: String): String = {
      val out = DialectShims.rewriteRedshiftSql(s"SELECT $redshift AS v")
      spark.sql(out).collect().head.get(0).toString
    }
    assert(evalStr("TO_NUMBER('1234', '999999')") == "1234")
    assert(evalStr("TO_NUMBER('$1,234.56', '$9,999.99')") == "1234.56")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-16 12:30:00', 'month') AS STRING)")
      == "1995-07-01")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-16 12:30:00', 'MM') AS STRING)")
      == "1995-07-01", "'MM' means MONTH in TRUNC formats, not minute")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-16 12:30:00', 'year') AS STRING)")
      == "1995-01-01")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-16 12:45:10', 'hour') AS STRING)")
      == "1995-07-16 12:00:00", "sub-day units keep the time component")
    // Oracle one-letter formats: 'D' = start of (Sunday-based) week,
    // 'W' = start of the week-of-month chunk — NOT day/week aliases.
    // 1995-07-16 is a Sunday; 1995-07-19 is a Wednesday.
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-16 12:30:00', 'D') AS STRING)")
      == "1995-07-16")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-19 12:30:00', 'D') AS STRING)")
      == "1995-07-16", "'D' truncates to the Sunday week start")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-19 12:30:00', 'W') AS STRING)")
      == "1995-07-15", "'W' truncates to day 1/8/15/22/29 of the month")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-07 00:00:00', 'W') AS STRING)")
      == "1995-07-01")
    // ALL Oracle day-of-week formats ('DAY', 'DY', 'D') are week-start;
    // the actual day formats are 'DDD'/'DD'/'J'
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-19 12:30:00', 'DAY') AS STRING)")
      == "1995-07-16", "'DAY' is a WEEK format in Oracle, not day truncation")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-19 12:30:00', 'DY') AS STRING)")
      == "1995-07-16")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1995-07-19 12:30:00', 'DDD') AS STRING)")
      == "1995-07-19")
    // 'IW' is the ISO (Monday-start) week; 'WW' chunks the year from
    // Jan 1 in 7-day steps (1996-01-01 is a Monday, so the two differ
    // from the Sunday-based 'D' on 1996 dates)
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1996-07-19 12:30:00', 'IW') AS STRING)")
      == "1996-07-15")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1996-07-19 12:30:00', 'WW') AS STRING)")
      == "1996-07-15")
    assert(evalStr("CAST(TRUNC(TIMESTAMP '1996-07-19 12:30:00', 'D') AS STRING)")
      == "1996-07-14")
    // numeric TRUNC (non-literal second arg) is not touched
    val kept = DialectShims.rewriteRedshiftSql("SELECT TRUNC(x, 2) FROM t")
    assert(kept.contains("TRUNC(x, 2)"))
  }

  test("numeric TO_CHAR: grouping, zero pad, sign modes, overflow, rounding") {
    def evalStr(redshift: String): String = {
      val out = DialectShims.rewriteRedshiftSql(s"SELECT $redshift AS v")
      spark.sql(out).collect().head.get(0).toString
    }
    assert(evalStr("TO_CHAR(1234567, 'FM999,999,999')") == "1,234,567")
    assert(evalStr("TO_CHAR(42, 'FM0000')") == "0042")
    assert(evalStr("TO_CHAR(0, 'FM0000')") == "0000")
    // default mode: one sign slot, PG's to_char(485,'999') = ' 485'
    assert(evalStr("TO_CHAR(485, '999')") == " 485")
    assert(evalStr("TO_CHAR(-485, '999')") == "-485")
    // S anchors an explicit sign
    assert(evalStr("TO_CHAR(3, 'S99')") == "+3")
    assert(evalStr("TO_CHAR(-3, 'S99')") == "-3")
    // money: dollar prefix, grouping, fixed scale, HALF-UP rounding
    assert(evalStr("TO_CHAR(1234.567, 'FM$9,999.00')") == "$1,234.57")
    assert(evalStr("TO_CHAR(5, 'FM$9.00')") == "$5.00")
    // integer part wider than the pattern → all '#'s
    assert(evalStr("TO_CHAR(12345, 'FM99')") == "##")
    // >18-digit values format exactly (the BIGINT intermediate would
    // have overflowed); 20 digits through a 24-position pattern
    assert(evalStr(
      "TO_CHAR(CAST('12345678901234567890' AS DECIMAL(38,0)), " +
        "'FM999999999999999999999999')") == "12345678901234567890")
    // unsupported number shapes stay untranslated for the C5 dry-run
    val kept = DialectShims.rewriteRedshiftSql(
      "SELECT TO_CHAR(x, '9.9.9') FROM t")
    assert(kept.toUpperCase.contains("TO_CHAR"))
  }

  test("SUPER/PartiQL: dot paths, array indexes, UNNEST over json varchar") {
    // nested dot path + array index on an aliased column
    val r1 = DialectShims.rewriteRedshiftSql(
      "SELECT e.payload.user.name, e.payload.items[0].sku FROM events e")
    assert(r1.contains("get_json_object(e.payload, '$.user.name')"), r1)
    assert(r1.contains("get_json_object(e.payload, '$.items[0].sku')"), r1)
    // 2-part refs and FROM-position 3-part names are untouched
    val r2 = DialectShims.rewriteRedshiftSql(
      "SELECT t.a FROM db.schema.tbl t WHERE t.a > 1")
    assert(r2.contains("FROM db.schema.tbl t") && r2.contains("t.a > 1"), r2)
    // a fully-qualified schema.table.column reference (no single-part
    // alias bound) is a COLUMN reference, never a json path — valid
    // alias-free Redshift that must keep working
    val r2b = DialectShims.rewriteRedshiftSql(
      "SELECT sch.tbl.col FROM sch.tbl WHERE sch.tbl.flag = 'y'")
    assert(!r2b.contains("get_json_object"), r2b)
    // ...but the same shape with the head bound as an alias IS a path
    val r2c = DialectShims.rewriteRedshiftSql(
      "SELECT s.doc.title FROM src s")
    assert(r2c.contains("get_json_object(s.doc, '$.title')"), r2c)
    // a derived-table alias is in scope as a path head
    val r2d = DialectShims.rewriteRedshiftSql(
      "SELECT d.payload.kind FROM (SELECT payload FROM events) d")
    assert(r2d.contains("get_json_object(d.payload, '$.kind')"), r2d)
    // ...including the explicit-AS form: the reference position sits
    // OUTSIDE the subquery scope, so the derived-table binding must
    // survive sibling-scope blanking (parens blanked to `()`, not
    // removed — regression: the removal made `\)\s*AS\s*alias` never
    // match and silently skipped the rewrite)
    val r2d2 = DialectShims.rewriteRedshiftSql(
      "SELECT d.payload.kind FROM (SELECT payload FROM events) AS d")
    assert(r2d2.contains("get_json_object(d.payload, '$.kind')"), r2d2)
    // blanked siblings still must not LEAK their inner bindings: `q`'s
    // subquery binds `events` inside only, so outer `events.doc` stays
    // a schema-qualified relation, not a path head
    val r2d3 = DialectShims.rewriteRedshiftSql(
      "SELECT events.doc.kind FROM (SELECT 1 FROM events) q, events.doc AS d")
    assert(!r2d3.contains("get_json_object"), r2d3)
    // a SELECT-list scalar-subquery alias is NOT a relation alias
    val r2e = DialectShims.rewriteRedshiftSql(
      "SELECT (SELECT max(sch.x.v) FROM sch.x) peak FROM sch.tbl")
    assert(!r2e.contains("get_json_object"), r2e)
    // alias binding is case-insensitive, like SQL identifier
    // resolution (`AS S` binds the head of `s.doc.title`)
    val r2f = DialectShims.rewriteRedshiftSql(
      "SELECT s.doc.title FROM src AS S")
    assert(r2f.contains("get_json_object(s.doc, '$.title')"), r2f)
    // a comma FROM item directly after a join's ON condition binds
    val r2g = DialectShims.rewriteRedshiftSql(
      "SELECT s.doc.items[0].sku FROM a JOIN b ON a.id = b.id, src s")
    assert(r2g.contains("get_json_object(s.doc, '$.items[0].sku')"), r2g)
    // bare 2-part + index is a path on the column
    val r3 = DialectShims.rewriteRedshiftSql(
      "SELECT e.tags[2] FROM events e")
    assert(r3.contains("get_json_object(e.tags, '$[2]')"), r3)
    // UNNEST → LATERAL VIEW explode(from_json); element field refs
    // become paths on the element's json text
    val r4 = DialectShims.rewriteRedshiftSql(
      "SELECT i.sku, i.qty FROM events e, UNNEST(e.payload.items) AS i")
    assert(r4.contains(
      "LATERAL VIEW explode(from_json(" +
        "get_json_object(e.payload, '$.items'), 'array<string>')) i_lv AS i"),
      r4)
    assert(r4.contains("get_json_object(i, '$.sku')") &&
      r4.contains("get_json_object(i, '$.qty')"), r4)
    // end-to-end through Spark: paths and unnest over constructed json
    spark.sql("SELECT 1 AS id, " +
      "'{\"user\":{\"name\":\"ann\"},\"items\":[{\"sku\":\"a1\",\"qty\":2}," +
      "{\"sku\":\"b2\",\"qty\":5}],\"tags\":[\"x\",\"y\"]}' AS payload")
      .createOrReplaceTempView("sup_events")
    val rows = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT e.payload.user.name AS uname, e.payload.tags[1] AS tag2, " +
        "i.sku AS sku, CAST(i.qty AS BIGINT) AS qty " +
        "FROM sup_events e, UNNEST(e.payload.items) AS i ORDER BY sku"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(rows == Seq(("ann", "y", "a1", 2L), ("ann", "y", "b2", 5L)), rows)
    // CROSS JOIN spelling of UNNEST
    val rows2 = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT t AS tag FROM sup_events e CROSS JOIN UNNEST(e.payload.tags) t " +
        "ORDER BY tag")).collect().map(_.getString(0)).toSeq
    assert(rows2 == Seq("x", "y"), rows2)
    // Trino/Athena column-alias form: UNNEST(x) AS t(col) — col is the
    // element, t names the lateral relation; both col and t.col resolve
    val rows3 = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT tag, u.tag AS tag2 FROM sup_events e " +
        "CROSS JOIN UNNEST(e.payload.tags) AS u(tag) ORDER BY tag"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows3 == Seq(("x", "x"), ("y", "y")), rows3)
    // the multi-column form is refused loudly, not spliced as corrupt SQL
    val multi = intercept[IllegalArgumentException] {
      DialectShims.rewriteRedshiftSql(
        "SELECT a FROM t CROSS JOIN UNNEST(x) AS u(a, b)")
    }
    assert(multi.getMessage.contains("multi-column"), multi)
  }

  test("JSON family: array_length, validity predicates, parse/serialize identities") {
    val r = DialectShims.rewriteRedshiftSql(
      "SELECT JSON_ARRAY_LENGTH(j), JSON_ARRAY_LENGTH(j, true), " +
        "IS_VALID_JSON(j), IS_VALID_JSON_ARRAY(j), CAN_JSON_PARSE(j), " +
        "JSON_PARSE(j), JSON_SERIALIZE(j) FROM t")
    assert(r.contains("array_size(from_json(j, 'array<string>'))"), r)
    assert(r.contains("get_json_object(j, '$') IS NOT NULL)"), r)
    assert(r.contains("(from_json(j, 'array<string>') IS NOT NULL)"), r)
    assert(!r.toUpperCase.contains("JSON_PARSE") &&
      !r.toUpperCase.contains("JSON_SERIALIZE"), r)
    // live eval: lengths and validity over good, bad, and array json
    val rows = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT JSON_ARRAY_LENGTH('[1,2,3]') AS n, " +
        "IS_VALID_JSON('{\"a\":1}') AS v1, IS_VALID_JSON('{oops') AS v2, " +
        "IS_VALID_JSON_ARRAY('[1]') AS a1, IS_VALID_JSON_ARRAY('{}') AS a2, " +
        "IS_VALID_JSON('null') AS v3, " +  // the json literal null IS valid
        // Redshift: IS_VALID_JSON is FALSE for arrays (that's
        // IS_VALID_JSON_ARRAY's job), CAN_JSON_PARSE is true for them
        "IS_VALID_JSON('[1,2]') AS v4, CAN_JSON_PARSE('[1,2]') AS c1"))
      .collect().head
    assert(rows.getInt(0) == 3 && rows.getBoolean(1) && !rows.getBoolean(2)
      && rows.getBoolean(3) && !rows.getBoolean(4) && rows.getBoolean(5), rows)
    assert(!rows.getBoolean(6) && rows.getBoolean(7),
      s"IS_VALID_JSON must reject arrays, CAN_JSON_PARSE accept them: $rows")
    // SUPER array helpers: SPLIT_TO_ARRAY (regex-meta delimiter must
    // stay literal), GET_ARRAY_LENGTH, 0-based SUBARRAY — and the
    // split result feeds UNNEST like any SUPER array
    val arr = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT GET_ARRAY_LENGTH(SPLIT_TO_ARRAY('a|b|c', '|')) AS n, " +
        "SUBARRAY(SPLIT_TO_ARRAY('a|b|c', '|'), 1, 2) AS tail1, " +
        "GET_ARRAY_LENGTH(SPLIT_TO_ARRAY('x,y')) AS n2"))
      .collect().head
    assert(arr.getInt(0) == 3 && arr.getString(1) == """["b","c"]""" &&
      arr.getInt(2) == 2, arr)
    val split = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT t AS tok FROM (SELECT 'p.q.r' AS s) x, " +
        "UNNEST(SPLIT_TO_ARRAY(x.s, '.')) AS t ORDER BY tok"))
      .collect().map(_.getString(0)).toSeq
    assert(split == Seq("p", "q", "r"), split)
  }

  test("PartiQL comma iteration: FROM s, s.path AS e [AT i] — Redshift's native spelling") {
    // AT ordinal → posexplode with a 0-based position column
    val r1 = DialectShims.rewriteRedshiftSql(
      "SELECT s.id, i, ln.p FROM src s, s.doc.lines AS ln AT i")
    assert(r1.contains(
      "LATERAL VIEW posexplode(from_json(" +
        "get_json_object(s.doc, '$.lines'), 'array<string>')) ln_lv AS i, ln"),
      r1)
    assert(r1.contains("get_json_object(ln, '$.p')"), r1)
    // no AT → plain explode; alias.column (2-part) is the array itself
    val r2 = DialectShims.rewriteRedshiftSql(
      "SELECT e FROM src s, s.tags e")
    assert(r2.contains(
      "LATERAL VIEW explode(from_json(s.tags, 'array<string>')) e_lv AS e"),
      r2)
    // SELECT-list comma items with a bound head are NOT iteration
    val r3 = DialectShims.rewriteRedshiftSql(
      "SELECT s.id, s.doc.kind AS kind FROM src s")
    assert(!r3.contains("LATERAL VIEW") &&
      r3.contains("get_json_object(s.doc, '$.kind')"), r3)
    // a comma-listed CATALOG name (head not a bound alias) is untouched
    val r4 = DialectShims.rewriteRedshiftSql(
      "SELECT * FROM src s, other.tbl t WHERE s.id = t.id")
    assert(r4.contains("FROM src s, other.tbl t"), r4)
    // iteration over a BARE single-part table name (no alias) — the
    // same scope the path pass grants (`FROM events` binds `events`)
    val r4a = DialectShims.rewriteRedshiftSql(
      "SELECT l FROM events, events.doc.lines AS l")
    assert(r4a.contains(
      "LATERAL VIEW explode(from_json(" +
        "get_json_object(events.doc, '$.lines'), 'array<string>')) l_lv AS l"),
      r4a)
    // a name bound only inside a SIBLING subquery must not leak out:
    // `events` here is a SCHEMA in the outer scope, and the inner
    // scope's `FROM events` must not turn `events.doc` into iteration
    val r4d = DialectShims.rewriteRedshiftSql(
      "SELECT d.v FROM (SELECT 1 AS one FROM events) q, events.doc AS d")
    assert(!r4d.contains("LATERAL VIEW") &&
      r4d.contains("events.doc AS d"), r4d)
    // ...nor make the path pass rewrite an outer schema.table.column
    val r4e = DialectShims.rewriteRedshiftSql(
      "SELECT events.doc.field FROM (SELECT 1 AS one FROM events) q")
    assert(!r4e.contains("get_json_object"), r4e)
    // a case-variant relation alias legally SHADOWING the element
    // alias inside a subquery keeps its column refs
    val r4f = DialectShims.rewriteRedshiftSql(
      "SELECT e, (SELECT max(E.sal) FROM emp E WHERE E.dept = 'x') m " +
        "FROM src s, UNNEST(s.tags) AS e")
    assert(r4f.contains("E.sal") && r4f.contains("E.dept"),
      s"inner relation alias E must shadow element alias e: $r4f")
    // THREE-part comma-listed catalog names and INSERT INTO targets
    // are relation positions, not paths
    val r4b = DialectShims.rewriteRedshiftSql(
      "SELECT * FROM sch.t1 a, db.sch2.t2 b WHERE a.x = b.y")
    assert(r4b.contains("FROM sch.t1 a, db.sch2.t2 b"), r4b)
    val r4c = DialectShims.rewriteRedshiftSql(
      "INSERT INTO db.sch.t SELECT e.payload.user.name FROM events e")
    assert(r4c.contains("INTO db.sch.t") &&
      r4c.contains("get_json_object(e.payload, '$.user.name')"), r4c)
    // UNNEST without an alias fails loudly instead of swallowing the
    // next keyword as the alias
    val noAlias = intercept[IllegalArgumentException] {
      DialectShims.rewriteRedshiftSql(
        "SELECT 1 FROM t, UNNEST(e.arr) WHERE x = 1")
    }
    assert(noAlias.getMessage.contains("requires an alias"), noAlias)
    // an element alias that collides with a path SEGMENT does not
    // corrupt already-rewritten json path literals
    val r5 = DialectShims.rewriteRedshiftSql(
      "SELECT e.doc.items.qty AS q, items FROM events e, " +
        "UNNEST(e.doc.items) AS items")
    assert(r5.contains("get_json_object(e.doc, '$.items.qty')"), r5)
    // a 3+-key JSON_EXTRACT_PATH_TEXT path contains a dotted run the
    // SUPER path pass must NOT re-match inside the inserted literal
    val r6 = DialectShims.rewriteRedshiftSql(
      "SELECT JSON_EXTRACT_PATH_TEXT(payload, 'a', 'b', 'c') FROM t")
    assert(r6.contains("get_json_object(payload, '$.a.b.c')"), r6)
    val deep = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT JSON_EXTRACT_PATH_TEXT('{\"a\":{\"b\":{\"c\":7}}}', " +
        "'a', 'b', 'c') AS v")).collect().head.getString(0)
    assert(deep == "7", deep)
    // iteration over a path nested 3+ levels below the column: the
    // inserted '$.a.b.lines' literal (a 3-component dotted run) must
    // survive the path pass too
    val r7 = DialectShims.rewriteRedshiftSql(
      "SELECT ln FROM src s, s.doc.a.b.lines AS ln")
    assert(r7.contains("get_json_object(s.doc, '$.a.b.lines')"), r7)
    // clause detection uses the INNERMOST paren scope: a CORRELATED
    // path (head bound by the outer FROM) as a function argument
    // inside a JOIN of a subquery is an expression position, not a
    // relation position
    val r8 = DialectShims.rewriteRedshiftSql(
      "SELECT 1 FROM t e WHERE x IN " +
        "(SELECT a FROM u JOIN fn(e.payload.a.b) f ON a = f.z)")
    assert(r8.contains("get_json_object(e.payload, '$.a.b')"), r8)
    // the same shape with an UNBOUND head is a catalog name, untouched
    val r8b = DialectShims.rewriteRedshiftSql(
      "SELECT 1 FROM t WHERE x IN " +
        "(SELECT a FROM u JOIN fn(e.payload.a.b) f ON a = f.z)")
    assert(!r8b.contains("get_json_object"), r8b)
    // end-to-end through Spark, object elements + ordinal filter
    spark.sql("SELECT 7 AS id, " +
      "'{\"lines\":[{\"p\":\"a\",\"n\":1},{\"p\":\"b\",\"n\":2}," +
      "{\"p\":\"c\",\"n\":3}]}' AS doc")
      .createOrReplaceTempView("iter_src")
    val rows = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT s.id, CAST(i AS BIGINT) AS ord, ln.p AS p, " +
        "CAST(ln.n AS BIGINT) AS n " +
        "FROM iter_src s, s.doc.lines AS ln AT i WHERE i >= 1 ORDER BY i"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(rows == Seq((7, 1L, "b", 2L), (7, 2L, "c", 3L)), rows)
  }

  test("PartiQL [*] wildcard paths in filter predicates — ANY-match exists()") {
    // basic shape: wildcard step mid-path, trailing field, numeric cmp
    val r1 = DialectShims.rewriteRedshiftSql(
      "SELECT s.id FROM src s WHERE s.doc.lines[*].q > 3")
    assert(r1.contains(
      "exists(from_json(get_json_object(s.doc, '$.lines'), " +
        "'array<string>'), wc_e -> get_json_object(wc_e, '$.q') > 3)"), r1)
    // trailing wildcard: the elements THEMSELVES are compared; string
    // literal operand survives masking round-trip
    val r2 = DialectShims.rewriteRedshiftSql(
      "SELECT s.id FROM src s WHERE s.doc.tags[*] = 't1'")
    assert(r2.contains(
      "exists(from_json(get_json_object(s.doc, '$.tags'), " +
        "'array<string>'), wc_e -> wc_e = 't1')"), r2)
    // 2-part head.col[*]: the column itself is the array
    val r3 = DialectShims.rewriteRedshiftSql(
      "SELECT s.id FROM src s WHERE s.tags[*] = 'x'")
    assert(r3.contains(
      "exists(from_json(s.tags, 'array<string>'), wc_e -> wc_e = 'x')"), r3)
    // an UNBOUND head is not a path — untouched
    val r4 = DialectShims.rewriteRedshiftSql(
      "SELECT 1 FROM src s WHERE nope.doc.lines[*].q > 3")
    assert(r4.contains("nope.doc.lines[*].q"), r4)
    // wildcard on an iteration ELEMENT alias composes
    val r5 = DialectShims.rewriteRedshiftSql(
      "SELECT e FROM src s, UNNEST(s.doc.rows) AS e WHERE e.vals[*] = 2")
    assert(r5.contains(
      "exists(from_json(get_json_object(e, '$.vals'), " +
        "'array<string>'), wc_e -> wc_e = 2)"), r5)
    // outside a comparison → refused loudly, never rewritten wrong
    val bad = intercept[IllegalArgumentException] {
      DialectShims.rewriteRedshiftSql(
        "SELECT s.doc.lines[*].q FROM src s")
    }
    assert(bad.getMessage.contains("comparison"), bad.getMessage)
    // function-call operand → refused loudly (the name alone would
    // strand its argument list)
    val bad2 = intercept[IllegalArgumentException] {
      DialectShims.rewriteRedshiftSql(
        "SELECT 1 FROM src s WHERE s.doc.lines[*].q = fn(1)")
    }
    assert(bad2.getMessage.contains("function call"), bad2.getMessage)
    // COMPOUND right-hand sides → refused, never silently truncated:
    // a second wildcard path (would strand `[*].r`), arithmetic,
    // string concat, a '::' cast suffix (would re-attach '::int' to
    // the generated exists() boolean), exponentiation ('^' in
    // Redshift), bitwise AND/XOR ('&'/'#'), and shifts ('<<'/'>>')
    for (rhs <- Seq("s.doc.y[*].r", "t.x + 1", "'a' || v", "3::int",
        "2 ^ v", "3 # 1", "4 & 2", "1 << 2", "8 >> 1")) {
      val bc = intercept[IllegalArgumentException] {
        DialectShims.rewriteRedshiftSql(
          s"SELECT 1 FROM src s WHERE s.doc.lines[*].q > $rhs")
      }
      assert(bc.getMessage.contains("compound") ||
        bc.getMessage.contains("comparison"), s"$rhs: ${bc.getMessage}")
    }
    // end-to-end through Spark: ANY-match semantics, and an INDEXED
    // path in the SELECT list coexists with the wildcard pass
    spark.sql(
      "SELECT 1 AS id, '{\"lines\":[{\"q\":1},{\"q\":5}]}' AS doc " +
        "UNION ALL SELECT 2, '{\"lines\":[{\"q\":1},{\"q\":2}]}'")
      .createOrReplaceTempView("wc_src")
    val rows = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT s.id, CAST(s.doc.lines[0].q AS BIGINT) AS q0 " +
        "FROM wc_src s WHERE s.doc.lines[*].q > 3 ORDER BY s.id"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(rows == Seq((1, 1L)), rows)
  }

  test("SUPER UNPIVOT: object-attribute iteration — FROM s, UNPIVOT s.doc AS v AT k") {
    // basic shape: map explode with key + value aliases
    val r1 = DialectShims.rewriteRedshiftSql(
      "SELECT k, v FROM src s, UNPIVOT s.doc AS v AT k")
    assert(r1.contains(
      "LATERAL VIEW explode(from_json(s.doc, 'map<string,string>')) " +
        "k_lv AS k, v"), r1)
    // nested path below the column
    val r2 = DialectShims.rewriteRedshiftSql(
      "SELECT k2, v2 FROM src s, UNPIVOT s.doc.metrics AS v2 AT k2")
    assert(r2.contains(
      "LATERAL VIEW explode(from_json(" +
        "get_json_object(s.doc, '$.metrics'), 'map<string,string>')) " +
        "k2_lv AS k2, v2"), r2)
    // value-alias field refs compose (object attribute values are
    // json text, same as array elements)
    val r3 = DialectShims.rewriteRedshiftSql(
      "SELECT k, v.unit FROM src s, UNPIVOT s.doc AS v AT k")
    assert(r3.contains("get_json_object(v, '$.unit')"), r3)
    // unbound head: untouched (a catalog name, not a path)
    val r4 = DialectShims.rewriteRedshiftSql(
      "SELECT 1 FROM src s, UNPIVOT nope.doc AS v AT k")
    assert(r4.contains("UNPIVOT nope.doc"), r4)
    // relational UNPIVOT (q31's form) has no `alias.path AS v AT k`
    // shape and stays untouched
    val rel = "SELECT * FROM t UNPIVOT (val FOR name IN (a, b))"
    assert(DialectShims.rewriteRedshiftSql(rel) == rel)
    // end-to-end: sparse attributes, scalar + nested values
    spark.sql(
      "SELECT 1 AS id, '{\"a\":3,\"b\":{\"unit\":\"ms\"}}' AS doc " +
        "UNION ALL SELECT 2, '{\"a\":4,\"c\":1}'")
      .createOrReplaceTempView("unp_src")
    val rows = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT s.id, k, v FROM unp_src s, UNPIVOT s.doc AS v AT k " +
        "ORDER BY s.id, k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSeq
    assert(rows.map(t => (t._1, t._2)) ==
      Seq((1, "a"), (1, "b"), (2, "a"), (2, "c")), rows)
    // nested value arrives as json TEXT so paths compose downstream
    assert(rows(1)._3.contains("\"unit\""), rows(1)._3)
    val nested = spark.sql(DialectShims.rewriteRedshiftSql(
      "SELECT v.unit AS u FROM unp_src s, UNPIVOT s.doc AS v AT k " +
        "WHERE k = 'b'")).collect().map(_.getString(0)).toSeq
    assert(nested == Seq("ms"), nested)
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
