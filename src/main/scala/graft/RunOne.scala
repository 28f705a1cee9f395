package graft
import org.apache.spark.sql.SparkSession

/** Run a single registered query by name: time it, print the formatted
  * physical plan (the reference's `run_query`/`explain` pair,
  * /root/reference/python/etl/load.py:1373-1404, explain.py:22-107). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // write µs (not INT96) so dumped timestamps arrow-match the
      // DuckDB oracle's timestamp[us] in the hash compare
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // Let AQE re-plan CACHED frame materialization (coalesce tiny
      // post-shuffle partitions, split skew) — off by default only for
      // partitioning-stability of cache reuse, which nothing here
      // relies on: every persisted frame is consumed by content-keyed
      // operators. Without it each persist() pinned the session's full
      // shuffle-partition fan-out, so small cached tables (band
      // indexes, label tables, streaming micro-batches) dragged 32
      // near-empty tasks through every downstream stage.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tc = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(f"[runone] $name: construct ${(System.nanoTime() - tc) / 1e9}%.2f s")
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      println(graft.etl.Explain.report(df))
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[runone] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    val n2 = df.count()
    println(f"[runone] $name (warm): $n2 rows in ${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
