package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point: dialect functions as native
  * Catalyst expressions available at session creation. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-injected f_sha256/getdate resolve as native expressions") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val r = spark.sql(
        "SELECT f_sha256('arthur') = sha2('arthur', 256) AS same, getdate() IS NOT NULL AS now").collect().head
      assert(r.getBoolean(0) && r.getBoolean(1))
      // native expression, not a UDF: the plan shows sha2, no ScalaUDF
      val plan = spark.sql("SELECT f_sha256('x')").queryExecution.analyzed.toString
      assert(plan.contains("sha2") && !plan.contains("UDF"))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
