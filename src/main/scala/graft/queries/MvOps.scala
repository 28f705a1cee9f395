package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.MvRewrite

/** Materialized-view lifecycle + the automatic-rewrite proof entry.
  * Redshift's MV feature is CREATE MATERIALIZED VIEW → REFRESH →
  * transparent query rewrite; the reference leans on Redshift for all
  * three (its CTAS relations are the manual version). Here:
  * [[MvRewrite.partials]] builds the stored rollup through the
  * Warehouse (staging + pointer swap like any table),
  * [[MvRewrite.registerMv]] arms the optimizer rule, and the entry
  * PROVES the rewrite fired by requiring the optimized plan to scan
  * the MV location and not the base file — then hands the rewritten
  * result to the DuckDB oracle, which recomputes from the BASE
  * table. Hash-green therefore certifies the rewrite's semantics,
  * not just its plumbing. */
object MvOps {

  private[graft] val GroupCols = Seq("l_returnflag", "l_linestatus")
  private[graft] val AggCols = Seq("l_quantity", "l_extendedprice")

  /** Build the stored partial rollup and register it for rewrite.
    * Returns the MV table name. */
  private[graft] def buildAndRegister(spark: SparkSession, sfDir: String,
                                      wh: graft.etl.Warehouse): String = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val table = graft.etl.TableName.parse("mv.lineitem_by_flag_status")
    wh.writeTable(table, MvRewrite.partials(li, GroupCols, AggCols))
    MvRewrite.registerMv(spark, "lineitem_by_flag_status", li,
      spark.table(table.quoted), GroupCols, AggCols)
    table.quoted
  }

  /** INCREMENTAL refresh: the MV stores re-aggregable PARTIALS, which
    * form a monoid — appending one batch's partial rows (idempotent,
    * batch-tagged) extends the view in Θ(batch) with NO base rescan,
    * and the rewrite's re-aggregation folds duplicate group rows
    * automatically (sum of sums, min of mins, sum of cnts). Re-arm
    * the registration at the base's new version and rewriting resumes
    * — Redshift's incremental REFRESH MATERIALIZED VIEW, expressed as
    * the warehouse's append discipline. Replays are no-ops (the
    * `_applied` marker), so at-least-once delivery cannot
    * double-count a group. */
  def appendBatch(wh: graft.etl.Warehouse, mvTable: graft.etl.TableName,
                  batch: DataFrame, groupCols: Seq[String],
                  aggCols: Seq[String], tag: String): Boolean =
    wh.appendToTableIdempotent(mvTable,
      MvRewrite.partials(batch, groupCols, aggCols), tag)

  private[graft] def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  /** Oracle entry: a filtered sub-grouping aggregate over lineitem,
    * answered FROM THE MV (plan-checked), hash-compared against
    * DuckDB's recompute over the raw base table. The query groups by
    * a strict subset of the MV keys and filters on the other — the
    * re-aggregation + filter-rebase path, not a trivial scan swap. */
  def mvRewriteRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wh = new graft.etl.Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_mv_q_").toString, sfDir)
    buildAndRegister(spark, sfDir, wh)
    val li = Tables.load(spark, sfDir, "lineitem")
    val q = li.filter($"l_linestatus" === "F")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity").as("sum_qty"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price"))
      .orderBy($"l_returnflag")
    // Touching optimizedPlan memoizes the REWRITTEN plan in this
    // QueryExecution; the registration is then dropped so no other
    // entry in a shared session can silently match the view (bench
    // numbers must measure each entry's own plan).
    val paths = scanPaths(q)
    MvRewrite.unregister(spark, "lineitem_by_flag_status")
    require(paths.nonEmpty && paths.forall(!_.contains("lineitem.parquet")),
      s"mv rewrite did not fire — plan scans $paths")
    q
  }

  val mvRewriteRollupSql: String =
    """SELECT l_returnflag, COUNT(*) AS n_rows,
      |  SUM(l_quantity) AS sum_qty,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price
      |FROM lineitem WHERE l_linestatus = 'F'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mv_rewrite_rollup" -> (mvRewriteRollup _))

  val oracles: Map[String, String] = Map(
    "mv_rewrite_rollup" -> mvRewriteRollupSql)
}
