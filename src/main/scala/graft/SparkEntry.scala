package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator from SURVEY.md §2
  * (plus the LLM-pipeline operator set); `oracleSql` holds the
  * DuckDB-equivalent ANSI SQL for each hash-checked entry.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SqlSurface.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SqlSurface.queries ++ EtlOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ AnnOps.queries ++ MultimodalOps.queries ++
      RangeJoinOps.queries ++ DimOps.queries ++ FuzzyJoin.queries ++
      MvOps.queries ++ GraphOps.queries ++ graft.etl.DemoDag.queries ++
      graft.streaming.StreamOracles.queries

  def oracleSql: Map[String, String] =
    SqlSurface.oracles ++ EtlOps.oracles ++ TextOps.oracles ++
      DedupOps.oracles ++ AnnOps.oracles ++ MultimodalOps.oracles ++
      RangeJoinOps.oracles ++ DimOps.oracles ++ FuzzyJoin.oracles ++
      MvOps.oracles ++ GraphOps.oracles ++ graft.etl.DemoDag.oracles ++
      graft.streaming.StreamOracles.oracles
}
