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
}
