package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read nanos as long and convert to the session's
      // microsecond timestamp — the data is µs-precision, so lossless.
      // The nanosAsLong conf is set at session build (Verify/Bench);
      // the guarded set here covers ad-hoc sessions without re-mutating
      // config on every load.
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Register every table as a temp view so `spark.sql` transform
    * queries (the reference's CTAS/VIEW surface) can resolve them. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
