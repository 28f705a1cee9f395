package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Monitor events (reference monitor.py:111-261): every step on every
  * relation emits start/finish/fail with elapsed time and extras
  * (rowcount). The reference ships these to DynamoDB; here they land
  * in a JSON-lines file (and memory) with the same query surface:
  * tail, summarize per step. */
final case class MonitorEvent(
    target: String,
    step: String,               // load | extract | unload | ...
    event: String,              // start | finish | fail
    elapsedSeconds: Double,
    rowcount: Option[Long] = None,
    message: Option[String] = None)

final class Monitor(logPath: Option[String] = None) {
  private val buf = scala.collection.mutable.Buffer[MonitorEvent]()

  def events: Seq[MonitorEvent] = buf.toSeq

  private def emit(e: MonitorEvent): Unit = synchronized {
    buf += e
    logPath.foreach { p =>
      val json = {
        val rc = e.rowcount.map(r => s""","rowcount":$r""").getOrElse("")
        val msg = e.message.map(m =>
          s""","message":"${m.replace("\\", "\\\\").replace("\"", "\\\"")}"""").getOrElse("")
        s"""{"target":"${e.target}","step":"${e.step}","event":"${e.event}","elapsed":${e.elapsedSeconds}$rc$msg}"""
      }
      Files.write(Paths.get(p), (json + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Wrap one step: start event, then finish with rowcount or fail
    * with the error message (monitor.py's context-manager shape). */
  def monitored[T](target: String, step: String)(body: => (T, Option[Long])): T = {
    emit(MonitorEvent(target, step, "start", 0.0))
    val t0 = System.nanoTime()
    try {
      val (result, rowcount) = body
      emit(MonitorEvent(target, step, "finish", (System.nanoTime() - t0) / 1e9, rowcount))
      result
    } catch {
      case e: Throwable =>
        emit(MonitorEvent(target, step, "fail", (System.nanoTime() - t0) / 1e9,
          None, Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
        throw e
    }
  }

  /** Per-step rollup (monitor.py:862-930 EventsQuery/summarize). */
  def summarize: Seq[(String, Int, Int, Double)] =
    events.filter(_.event != "start").groupBy(_.step).map { case (step, es) =>
      (step, es.count(_.event == "finish"), es.count(_.event == "fail"),
        es.map(_.elapsedSeconds).sum)
    }.toSeq.sortBy(_._1)
}
