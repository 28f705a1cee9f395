package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Stored inverted-index retrieval: incremental build+append answers
  * exactly like the one-shot in-memory operator, and a replayed
  * append batch changes nothing (idempotent monoid partials). */
class RetrievalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stored index == in-memory retrieval; replayed append is a no-op") {
    val s = spark
    import s.implicits._
    val wh = new graft.etl.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_ret_spec_").toString, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
    TextOps.buildRetrievalIndex(wh, docs.filter($"doc_id" < 30), "srch.d")
    TextOps.appendRetrievalBatch(wh, docs.filter($"doc_id" >= 30), "srch.d", "b1")
    def ask() = TextOps.retrievalTopkStored(spark, "srch.d",
      TextOps.RetrievalQueries).collect().map(_.toSeq).toSeq
    val stored = ask()
    val direct = TextOps.retrievalTopk(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(stored == direct, "stored index diverged from the one-shot operator")
    // at-least-once replay of the SAME batch tag: partials unchanged
    TextOps.appendRetrievalBatch(wh, docs.filter($"doc_id" >= 30), "srch.d", "b1")
    assert(ask() == stored, "replayed append must not change the index")
    // df partials really are partial (multiple rows per common token
    // across batches) and merge at query time
    val dfRows = spark.table("`srch`.`d_df`")
      .groupBy($"token").count().filter($"count" > 1).count()
    assert(dfRows > 0, "expected per-batch df partials for shared tokens")
  }
}
