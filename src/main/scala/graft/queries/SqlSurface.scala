package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Num._

/** The reference's "delegated SQL surface" (SURVEY.md §2.3): Arthur
  * ships arbitrary SELECTs to Redshift
  * (/root/reference/python/etl/relation.py:279-293,
  * python/etl/dialect/redshift.py:218-229). Here Catalyst plays
  * Redshift's role: each query is declared with the DataFrame API and
  * the optimizer picks pushdown, join strategy, and aggregation mode.
  *
  * Scale notes are per-query; the general stance: partial (map-side)
  * aggregation is automatic for `groupBy().agg`, small dimension
  * tables are broadcast explicitly, and filters sit directly on the
  * scan so parquet row-group pruning applies.
  */
object SqlSurface {

  /** TPC-H Q1-style pricing summary. Aggregation over a scan with a
    * pushed-down temporal filter; 4 groups → tiny shuffle, map-side
    * partial agg does nearly all the work. Scales linearly with input. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, sfDir, "lineitem")
      .filter($"l_shipdate" <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity")} AS sum_qty,
       |  ${dsumSql("l_extendedprice")} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
