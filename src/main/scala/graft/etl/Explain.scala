package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan inspection with warnings (Q2): the reference's `explain`
  * command scans Redshift plans for scale hazards — DS_BCAST_INNER /
  * DS_DIST_* distribution styles and leader-only functions
  * (/root/reference/python/etl/explain.py:22-107). The Spark analogs:
  *
  *  - CartesianProduct: O(n·m) — always a bug at warehouse scale.
  *  - BroadcastNestedLoopJoin: per-row loop over the broadcast side;
  *    only sane when the build side is a handful of rows.
  *  - Window with an empty partition spec: Spark moves ALL rows to a
  *    single partition (its own WindowExec warns) — serial bottleneck
  *    and OOM at scale.
  *
  * Run over every registered query in the test suite so a plan
  * regression (e.g. a lost equi-join key) fails CI, the way the
  * reference's explain-with-warnings catches bad dist styles before
  * they ship.
  */
object Explain {

  final case class PlanWarning(kind: String, node: String)

  /** Physical-plan hazard scan. Uses the pre-AQE plan (the AQE
    * wrapper hides children until execution); pattern hazards are
    * static plan properties, so pre-AQE is the right surface. */
  def planWarnings(df: DataFrame): Seq[PlanWarning] = {
    val plan: SparkPlan = df.queryExecution.sparkPlan
    plan.collect {
      case c: CartesianProductExec =>
        PlanWarning("cartesian_product", c.nodeName)
      case b: BroadcastNestedLoopJoinExec =>
        PlanWarning("broadcast_nested_loop_join", b.nodeName)
      case w: WindowExec if w.partitionSpec.isEmpty =>
        PlanWarning("single_partition_window", w.nodeName)
    }
  }

  /** Broadcast-hash-join build sides in the (pre-AQE) physical plan,
    * as plan-string summaries. Scale gate: a query whose broadcast
    * build side scales with the corpus (rather than a bounded dim /
    * query set) must show NONE of these — shuffle joins + AQE are the
    * 100-TB shape. (AQE may still locally convert a shuffle join to a
    * broadcast at runtime when the MEASURED size is small — that is
    * size-based and safe by construction.) */
  def broadcastJoins(df: DataFrame): Seq[String] = {
    val plan: SparkPlan = df.queryExecution.sparkPlan
    plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        s"${b.nodeName}(buildSide=${b.buildSide})"
    }
  }

  /** The formatted plan text (run_query's explain companion, Q1/Q2). */
  def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  /** Human-readable report: plan + warnings (the CLI surface). */
  def report(df: DataFrame): String = {
    val warnings = planWarnings(df)
    val w = if (warnings.isEmpty) "No plan warnings."
      else warnings.map(x => s"WARNING [${x.kind}]: ${x.node}").mkString("\n")
    formatted(df) + "\n" + w
  }
}
