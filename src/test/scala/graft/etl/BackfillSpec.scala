package graft.etl

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition-scoped rebuild: only the batch's partitions move, other
  * partitions keep their exact files; a mis-scoped batch is refused
  * before writing; non-partitioned targets are refused. */
class BackfillSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var wh: Warehouse = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("bf_wh_").toString,
      "/root/testdata/sf0.001")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val design = TableDesign(TableName.parse("bf.fact"), "CTAS", Seq(
    ColumnDef("k", "long"), ColumnDef("v", "string"), ColumnDef("day", "string")),
    partitionBy = Seq("day"))

  private def filesUnder(suffix: String): Map[String, Long] = {
    val loc = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("fact", Some("bf")))
      .location.getPath
    val dir = new java.io.File(s"$loc/$suffix")
    Option(dir.listFiles).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-"))
      .map(f => f.getName -> f.lastModified).toMap
  }

  test("backfill replaces exactly the batch partitions") {
    val s = spark
    import s.implicits._
    val t = TableName.parse("bf.fact")
    wh.writeTable(t, Seq(
      (1L, "a", "d1"), (2L, "b", "d1"),
      (3L, "c", "d2"),
      (4L, "d", "d3")).toDF("k", "v", "day"), Some(design))
    val d1Before = filesUnder("day=d1")
    val d3Before = filesUnder("day=d3")
    assert(d1Before.nonEmpty && d3Before.nonEmpty)

    val rebuilt = wh.rebuildPartitions(t,
      Seq((30L, "cc", "d2"), (31L, "cd", "d2")).toDF("k", "v", "day"),
      expect = Some(Set("day=d2")))
    assert(rebuilt == Seq("day=d2"))
    val got = spark.table(t.quoted).orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "a", "d1"), (2L, "b", "d1"),
      (4L, "d", "d3"), (30L, "cc", "d2"), (31L, "cd", "d2")))
    // untouched partitions keep their exact files
    assert(filesUnder("day=d1") == d1Before, "day=d1 files must not move")
    assert(filesUnder("day=d3") == d3Before, "day=d3 files must not move")
  }

  test("a batch outside the declared scope is refused before writing") {
    val s = spark
    import s.implicits._
    val t = TableName.parse("bf.fact")
    val before = spark.table(t.quoted).count()
    val e = intercept[IllegalArgumentException] {
      wh.rebuildPartitions(t,
        Seq((9L, "x", "d2"), (10L, "y", "d3")).toDF("k", "v", "day"),
        expect = Some(Set("day=d2")))
    }
    assert(e.getMessage.contains("day=d3"))
    assert(spark.table(t.quoted).count() == before, "nothing may be written")
  }

  test("non-partitioned and empty-batch targets are refused") {
    val s = spark
    import s.implicits._
    val flat = TableName.parse("bf.flat")
    wh.writeTable(flat, Seq((1L, "a", "d1")).toDF("k", "v", "day"))
    intercept[IllegalArgumentException] {
      wh.rebuildPartitions(flat, Seq((2L, "b", "d1")).toDF("k", "v", "day"))
    }
    intercept[IllegalArgumentException] {
      wh.rebuildPartitions(TableName.parse("bf.fact"),
        Seq.empty[(Long, String, String)].toDF("k", "v", "day"))
    }
  }
}
