package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table access for the driver-provided TPC-H-ish parquet data
  * (see /root/repo/TESTDATA.md). In the reference these arrive via
  * Sqoop extract + Redshift COPY (/root/reference/python/etl/extract/sqoop.py:54-71,
  * python/etl/dialect/redshift.py:297-369); here the parquet directory
  * IS the warehouse and `spark.read.parquet` is the (already columnar,
  * already compressed) load path.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` transform
    * queries (the reference's CTAS/VIEW surface) can resolve them. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
