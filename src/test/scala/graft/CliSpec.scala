package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI test: a designs directory in the reference layout
  * drives load/validate/show_ddl/create_index through Cli.run. */
class CliSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var designsDir: String = _
  private val dataDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    designsDir = Files.createTempDirectory("graft_cli_designs_").toString
    val schemaDir = Paths.get(designsDir, "schemas", "cli")
    Files.createDirectories(schemaDir)
    Files.write(schemaDir.resolve("region.yaml"),
      """name: cli.region
        |source_name: cli
        |columns:
        |  - name: r_regionkey
        |    type: int
        |    not_null: true
        |  - name: r_name
        |    type: string
        |constraints:
        |  - primary_key: [r_regionkey]
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    Files.write(schemaDir.resolve("cli-summary.yaml"),
      """name: cli.summary
        |source_name: CTAS
        |depends_on: [cli.region]
        |columns:
        |  - name: n
        |    type: long
        |    not_null: true
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    Files.write(schemaDir.resolve("cli-summary.sql"),
      "SELECT COUNT(*) AS n FROM cli.region".getBytes(StandardCharsets.UTF_8))
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("cli load builds the designs end-to-end via staging+publish") {
    val wh = Files.createTempDirectory("graft_cli_wh_").toString
    Cli.run(spark, "load", Map(
      "designs" -> designsDir, "data" -> dataDir, "warehouse" -> wh))
    assert(spark.table("`cli`.`summary`").collect().head.getLong(0) == 5L)
  }

  test("cli validate passes for a consistent design set") {
    // region must resolve for the dry-run: build it first (done above),
    // then validate sees matching deps/columns.
    Cli.run(spark, "validate", Map("designs" -> designsDir))
  }

  test("cli explain reports no hazards for the summary transform") {
    Cli.run(spark, "explain", Map("designs" -> designsDir))
  }
}
