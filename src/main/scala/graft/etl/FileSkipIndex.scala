package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file min/max data-skipping index over a warehouse table — the
  * zone-map design the reference leans on implicitly (Redshift keeps
  * per-block min/max for sort keys; `table_design.schema:196-210`'s
  * `sortkey` exists to make those zone maps selective, and SURVEY §4
  * names them as the reference's chief scan-pruning device), made
  * EXPLICIT as a queryable warehouse table over plain parquet, the
  * way Delta/Iceberg ship file-level stats in their logs.
  *
  * Why it matters at 100 TB: parquet row-group stats only help AFTER
  * a file's footer is opened — the scan still lists, opens, and
  * schedules every file. This index prunes the FILE LIST driver-side
  * before the scan is planned, so a selective predicate on a
  * clustered column reads the few files that can match instead of
  * opening a million footers. The index itself is metadata-sized
  * (one row per file) and is maintained incrementally: [[refresh]]
  * scans ONLY files not yet indexed.
  *
  * Layout: one row per data file — `file`, `row_count`, then
  * `min_<col>`/`max_<col>` per indexed column in the column's native
  * type (so pruning comparisons are typed, not stringly). Stored via
  * the normal Warehouse lifecycle (versioned build + pointer), so
  * vacuum/snapshot/compaction semantics apply unchanged.
  */
object FileSkipIndex {

  /** Naming convention for the stats side-table. */
  def statsTable(target: TableName): TableName =
    TableName(target.schema, target.table + "__filestats")

  /** Normalize a path for equality between `_metadata.file_path`
    * (executor-rendered URI, e.g. `file:///root/x.parquet`) and
    * Hadoop `Path.toString` (driver listing, `file:/root/x.parquet`):
    * collapse the scheme's slash run to one. Pure string op — runs as
    * a codegen'd expression executor-side. */
  private def normFile(c: Column): Column =
    regexp_replace(c, "^([a-zA-Z0-9+.-]+):/+", "$1:/")

  private def normFile(s: String): String =
    s.replaceFirst("^([a-zA-Z0-9+.-]+):/+", "$1:/")

  private def statsAggs(cols: Seq[String]): Seq[Column] =
    count(lit(1)).as("row_count") +: cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))

  private def statsOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = statsAggs(cols)
    df.groupBy(normFile(col("_metadata.file_path")).as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build (or rebuild) the stats table for `target`. One pass over
    * the table, column-pruned to the indexed columns (the parquet
    * scan reads only `cols`), map-side-combinable min/max per file —
    * the shuffle moves one row per (file, partial), never data. */
  def build(wh: Warehouse, target: TableName, cols: Seq[String]): TableName = {
    require(cols.nonEmpty, "index at least one column")
    val st = statsTable(target)
    wh.writeTable(st, statsOf(wh.spark.table(target.quoted), cols))
    st
  }

  /** Incremental maintenance after appends: list the table's live
    * data files (driver-side, metadata-only — the same O(#files)
    * listing every scan's planning already performs), diff against
    * the indexed file set, and aggregate stats for ONLY the new files
    * — Θ(appended data), not a rescan. The collected file-name sets
    * are bounded metadata, one short string per file (the Delta-log
    * cost class, not a data collect). Returns how many new files were
    * indexed. Must not run concurrently with compaction (same rule as
    * append-vs-vacuum). */
  def refresh(wh: Warehouse, target: TableName, cols: Seq[String]): Int = {
    val spark = wh.spark
    val st = statsTable(target)
    val known = spark.table(st.quoted).select(col("file"))
      .collect().map(_.getString(0)).toSet
    val fresh = (liveFiles(spark, target) -- known).toSeq.sorted
    if (fresh.isEmpty) 0
    else {
      wh.appendToTable(st, statsOf(spark.read.parquet(fresh: _*), cols))
      fresh.length
    }
  }

  /** A pruned scan: `df` holds only rows with `lo <= c <= hi`, read
    * from only the files whose [min,max] interval intersects
    * [lo, hi]. `filesRead`/`filesTotal` expose the pruning ratio;
    * `stale` reports that the index did not match the table's live
    * file set and the scan fell back to the full table. */
  final case class Pruned(df: DataFrame, filesRead: Int, filesTotal: Int,
                          stale: Boolean = false)

  /** Live data files of a plain table — one driver-side listing, the
    * same O(#files) metadata cost scan planning already pays. */
  private def liveFiles(spark: SparkSession, target: TableName): Set[String] = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          target.table, Some(target.schema))).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).filter(f => f.isFile && {
      val n = f.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }).map(f => normFile(f.getPath.toString)).toSet
  }

  /** Closed-interval pruned scan on an indexed column. Files whose
    * stats CANNOT contain a match are dropped from the read: a file
    * with `max_c < lo` or `min_c > hi` has no qualifying row, and a
    * file whose `min_c`/`max_c` are null holds only nulls in `c`
    * (min/max ignore nulls), which a range predicate never matches.
    * The residual filter stays on top — pruning is a superset
    * optimization, never the correctness argument. The candidate
    * file list is collected driver-side (bounded: one path per
    * surviving file — what `spark.read` needs to plan the scan). */
  def prunedScan(spark: SparkSession, target: TableName, c: String,
                 lo: Column, hi: Column): Pruned = {
    val stats = spark.table(statsTable(target).quoted)
    val indexed = stats.select(col("file")).collect().map(_.getString(0)).toSet
    val pred = col(c) >= lo && col(c) <= hi
    // STALENESS GUARD: compaction/rebuild re-points the table at a new
    // build whose files the index has never seen — pruning against
    // stale stats would read deleted files or silently miss rows. When
    // the indexed file set is not exactly the live set, fall back to
    // the full (still correct) scan; the caller rebuilds/refreshes the
    // index on its own schedule. One extra listing, metadata-priced.
    val live = liveFiles(spark, target)
    if (indexed != live)
      return Pruned(spark.table(target.quoted).filter(pred),
        live.size, live.size, stale = true)
    val candidates = stats
      .filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
      .select(col("file")).collect().map(_.getString(0))
    val df =
      if (candidates.isEmpty)
        spark.table(target.quoted).filter(lit(false))
      else
        spark.read.schema(spark.table(target.quoted).schema)
          .parquet(candidates.toIndexedSeq: _*).filter(pred)
    Pruned(df, candidates.length, indexed.size)
  }
}
