package graft.etl

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.command.DataWritingCommandExec
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand
import org.apache.spark.sql.execution.command.CreateDataSourceTableAsSelectCommand
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-build load diagnostics (S11): the reference reports rows /
  * files / MB per COPY from `stl_load_commits`
  * (/root/reference/python/etl/dialect/redshift.py:395-473). The
  * Spark-native equivalent is the SQL metrics already collected on
  * every executed plan — scans carry files/bytes read, exchanges
  * carry shuffle bytes written, the write command carries files/bytes/
  * rows written. A [[QueryExecutionListener]] keys each finished write
  * by its output location so concurrent builds (D5 runs source loads
  * in parallel) each pick up exactly their own numbers. */
final case class LoadMetrics(
    filesRead: Long,
    bytesRead: Long,
    shuffleBytesWritten: Long,
    filesWritten: Long,
    bytesWritten: Long,
    rowsWritten: Long)

final class LoadMetricsCapture(
    hadoopConf: org.apache.hadoop.conf.Configuration)
    extends QueryExecutionListener {

  private val byPath = new ConcurrentHashMap[String, LoadMetrics]()

  override def onSuccess(funcName: String, qe: QueryExecution,
                         durationNs: Long): Unit = {
    val nodes = allNodes(qe.executedPlan)
    outputPathOf(nodes).foreach { p =>
      byPath.put(normalize(p), extract(nodes))
    }
  }

  override def onFailure(funcName: String, qe: QueryExecution,
                         exception: Exception): Unit = ()

  /** Drop any stale entry for `path` BEFORE running a write to it: a
    * previous write whose await() timed out may deliver late, and a
    * later build at the same path must not consume those numbers. */
  def discard(path: String): Unit = byPath.remove(normalize(path))

  /** Collect the metrics for the build that wrote `path`. The
    * listener bus delivers asynchronously, so poll briefly; a miss
    * yields None rather than failing the build. */
  def await(path: String, timeoutMs: Long = 10000): Option[LoadMetrics] = {
    val key = normalize(path)
    val deadline = System.nanoTime + timeoutMs * 1000000L
    var found = Option(byPath.remove(key))
    while (found.isEmpty && System.nanoTime < deadline) {
      Thread.sleep(10)
      found = Option(byPath.remove(key))
    }
    found
  }

  /** Keys must agree between discard/await (registered with the
    * warehouse's — possibly RELATIVE — location string) and onSuccess
    * (the write command's resolved absolute path): qualify through the
    * filesystem so both normalize identically, else every build blocks
    * the full await poll and falls back to a rescan count. */
  private def normalize(p: String): String = {
    val path = new Path(p)
    path.getFileSystem(hadoopConf).makeQualified(path).toUri.getPath
  }

  /** Every node in the executed plan, descending through AQE stages.
    * A [[ReusedExchangeExec]] is skipped outright: its metrics ARE the
    * original exchange's (same SQLMetric objects), and its subtree is
    * the original's subtree — counting either side of the reuse twice
    * would double scan and shuffle numbers. The identity-visited set
    * guards any other shape that aliases one plan fragment from two
    * parents. */
  private def allNodes(root: SparkPlan): Seq[SparkPlan] = {
    val visited = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def go(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: ReusedExchangeExec => Seq.empty
      case _ if !visited.add(p) => Seq.empty
      case a: AdaptiveSparkPlanExec => p +: go(a.executedPlan)
      case q: QueryStageExec => p +: go(q.plan)
      case _ => p +: p.children.flatMap(go)
    }
    go(root)
  }

  private def outputPathOf(nodes: Seq[SparkPlan]): Option[String] =
    nodes.collectFirst {
      case d: DataWritingCommandExec => d.cmd match {
        case i: InsertIntoHadoopFsRelationCommand => Some(i.outputPath.toString)
        case c: CreateDataSourceTableAsSelectCommand =>
          c.table.storage.locationUri.map(_.toString)
        case _ => None
      }
    }.flatten

  private def extract(nodes: Seq[SparkPlan]): LoadMetrics = {
    def metric(p: SparkPlan, key: String): Long =
      p.metrics.get(key).map(_.value).getOrElse(0L)
    // A file scan is any node carrying "filesSize"; its "numFiles" is
    // files READ. The write command's "numFiles" is files WRITTEN —
    // same key, disjoint node types.
    val scans = nodes.filter(_.metrics.contains("filesSize"))
    val writes = nodes.collect { case d: DataWritingCommandExec => d.cmd }
    def writeMetric(key: String): Long =
      writes.map(_.metrics.get(key).map(_.value).getOrElse(0L)).sum
    LoadMetrics(
      filesRead = scans.map(metric(_, "numFiles")).sum,
      bytesRead = scans.map(metric(_, "filesSize")).sum,
      shuffleBytesWritten =
        nodes.map(metric(_, "shuffleBytesWritten")).sum,
      filesWritten = writeMetric("numFiles"),
      bytesWritten = writeMetric("numOutputBytes"),
      rowsWritten = writeMetric("numOutputRows"))
  }
}

object LoadMetricsCapture {
  private val bySession =
    new ConcurrentHashMap[SparkSession, LoadMetricsCapture]()

  /** One capture listener per session, registered on first use —
    * Warehouse instances come and go (tests build dozens), listener
    * registrations must not accumulate. */
  def install(spark: SparkSession): LoadMetricsCapture =
    bySession.computeIfAbsent(spark, s => {
      val c = new LoadMetricsCapture(s.sparkContext.hadoopConfiguration)
      s.listenerManager.register(c)
      c
    })
}
