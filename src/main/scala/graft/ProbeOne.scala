package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Throwaway diagnostic: run one entry, print per-stage wall/CPU/records
  * WITH stage names and callsites. Not part of the driver contract. */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
    // ad-hoc A/B: GRAFT_PROBE_CONF="key=value;key=value" overrides
    sys.env.get("GRAFT_PROBE_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.sparkContext.setLogLevel("WARN")
    final case class St(var name: String = "", var tasks: Int = 0,
                        var runMs: Long = 0, var recs: Long = 0,
                        var shufRecs: Long = 0, var wall: Long = -1,
                        var maxTask: Long = 0, var cpuMs: Long = 0,
                        var gcMs: Long = 0, var deserMs: Long = 0)
    val stages = mutable.Map.empty[Int, St]
    val lis = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, St()).name =
            e.stageInfo.name.take(120)
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful) stages.synchronized {
          val s = stages.getOrElseUpdate(t.stageId, St())
          s.tasks += 1
          s.maxTask = math.max(s.maxTask, t.taskInfo.duration)
          if (t.taskMetrics != null) {
            s.runMs += t.taskMetrics.executorRunTime
            s.recs += t.taskMetrics.inputMetrics.recordsRead
            s.shufRecs += t.taskMetrics.shuffleReadMetrics.recordsRead
            s.cpuMs += t.taskMetrics.executorCpuTime / 1000000L
            s.gcMs += t.taskMetrics.jvmGCTime
            s.deserMs += t.taskMetrics.executorDeserializeTime
          }
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
          s.wall = (for { a <- e.stageInfo.submissionTime;
                          b <- e.stageInfo.completionTime } yield b - a).getOrElse(-1)
        }
    }
    // one warm run first (JIT/codegen), then the measured run
    SparkEntry.queries(name)(spark, sfDir).count()
    spark.catalog.clearCache()
    // match Bench's between-run hygiene: model-artifact memos (BPE
    // merges, PQ codebook) must be re-learned by the measured run
    graft.queries.TextOps.clearModelMemos()
    graft.queries.AnnOps.clearModelMemos()
    spark.sparkContext.addSparkListener(lis)
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(800)
    println(f"[probe] $name: $n rows in $dt%.2f s (warm)")
    val tot = stages.values.map(s => math.max(0L, s.wall)).sum
    val totCpu = stages.values.map(_.cpuMs).sum
    val totTasks = stages.values.map(_.tasks).sum
    val totDeser = stages.values.map(_.deserMs).sum
    println(f"[probe] stage wall sum ${tot / 1000.0}%.2f s, ${stages.size} stages, " +
      f"cpu sum ${totCpu / 1000.0}%.2f s, $totTasks tasks, deser ${totDeser / 1000.0}%.2f s")
    stages.toSeq.sortBy(-_._2.wall).take(30).foreach { case (id, s) =>
      println(f"[probe] stage $id%5d wall=${s.wall}%6dms tasks=${s.tasks}%4d run=${s.runMs}%7dms cpu=${s.cpuMs}%7dms gc=${s.gcMs}%5dms deser=${s.deserMs}%5dms in=${s.recs}%9d shuf=${s.shufRecs}%9d maxTask=${s.maxTask}%6dms  ${s.name}")
    }
    spark.stop()
  }
}
