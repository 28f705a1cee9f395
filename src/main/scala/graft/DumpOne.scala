package graft
import org.apache.spark.sql.SparkSession
/** Dev helper: dump one SparkEntry query's result to parquet (the
  * same writer settings Verify uses) for ad-hoc oracle comparison. */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
