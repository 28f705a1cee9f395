package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Monitor events (reference monitor.py:111-261): every step on every
  * relation emits start/finish/fail with elapsed time and extras
  * (rowcount, load metrics). The reference ships these to DynamoDB;
  * here they land in a JSON-lines file (and memory) with the same
  * query surface: query by target/step, tail, summarize per step
  * (monitor.py:656-930 `scan_etl_events` / `tail_events` /
  * `EventsQuery`). */
final case class MonitorEvent(
    target: String,
    step: String,               // load | extract | unload | ...
    event: String,              // start | finish | fail
    elapsedSeconds: Double,
    rowcount: Option[Long] = None,
    message: Option[String] = None,
    metrics: Option[LoadMetrics] = None,   // S11 load diagnostics
    ts: Option[Long] = None)               // epoch millis, stamped at emit

/** One row of the `summarize_events` report (monitor.py:862-925): the
  * latest event per relation in the window, plus per-schema pseudo
  * rows (event "complete") carrying the summed elapsed/rowcount. */
final case class EventSummary(
    target: String, kind: String, step: String, ts: Long,
    event: String, elapsedSeconds: Double, rowcount: Long)

final class Monitor(logPath: Option[String] = None) {
  private val buf = scala.collection.mutable.Buffer[MonitorEvent]()

  /** Metrics staged by the build running on this thread, consumed by
    * its finish event. Thread-local because D5 builds relations on
    * parallel threads, each monitored on its own thread. */
  private val pending = new ThreadLocal[Option[LoadMetrics]] {
    override def initialValue(): Option[LoadMetrics] = None
  }

  def attachMetrics(m: Option[LoadMetrics]): Unit = pending.set(m)

  def events: Seq[MonitorEvent] = synchronized { buf.toSeq }

  /** Emit a one-off event outside the monitored-block lifecycle —
    * QMR violations, operator-level notices. */
  def record(target: String, step: String, event: String,
             elapsedSeconds: Double, rowcount: Option[Long] = None,
             message: Option[String] = None): Unit =
    emit(MonitorEvent(target, step, event, elapsedSeconds, rowcount, message))

  private def emit(e0: MonitorEvent): Unit = synchronized {
    val e = e0.copy(ts = Some(System.currentTimeMillis))
    buf += e
    logPath.foreach { p =>
      Files.write(Paths.get(p),
        (Monitor.toJson(e) + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Wrap one step: start event, then finish with rowcount or fail
    * with the error message (monitor.py's context-manager shape). */
  def monitored[T](target: String, step: String)(body: => (T, Option[Long])): T = {
    emit(MonitorEvent(target, step, "start", 0.0))
    val t0 = System.nanoTime()
    pending.set(None)
    try {
      val (result, rowcount) = body
      emit(MonitorEvent(target, step, "finish", (System.nanoTime() - t0) / 1e9,
        rowcount, None, pending.get()))
      result
    } catch {
      case e: Throwable =>
        emit(MonitorEvent(target, step, "fail", (System.nanoTime() - t0) / 1e9,
          None, Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
        throw e
    } finally pending.set(None)
  }

  /** Per-step rollup (monitor.py:862-930 EventsQuery/summarize). */
  def summarize: Seq[(String, Int, Int, Double)] =
    Monitor.summarizeEvents(events)

  /** Q7 query surface (monitor.py:720-860 `scan_etl_events`): filter
    * by relation glob and/or step. */
  def query(target: Option[String] = None,
            step: Option[String] = None,
            since: Option[Long] = None): Seq[MonitorEvent] =
    Monitor.filter(events, target, step, since)

  /** Q7 `tail_events` (monitor.py:926-975): the last n events. */
  def tail(n: Int): Seq[MonitorEvent] = events.takeRight(n)
}

object Monitor {

  /** Per-step rollup over ANY event set — in-session (`summarize`) or
    * a cross-run log file (`query_events --summarize`):
    * (step, finishes, fails, total elapsed seconds). */
  def summarizeEvents(es: Seq[MonitorEvent]): Seq[(String, Int, Int, Double)] =
    es.filter(_.event != "start").groupBy(_.step).map { case (step, group) =>
      (step, group.count(_.event == "finish"), group.count(_.event == "fail"),
        group.map(_.elapsedSeconds).sum)
    }.toSeq.sortBy(_._1)

  /** `summarize_events` (monitor.py:862-925): per relation, the LATEST
    * event within the window; schemas get pseudo rows aggregating
    * elapsed and rowcount across their relations; everything sorted by
    * timestamp so the report reads in execution order. Returns the
    * rows plus the latest-event tally (start = still running, finish,
    * fail) the reference logs at the end.
    *
    * Window deviation, documented: the reference partitions events by
    * DynamoDB etl_id and summarizes the latest ETL of the last 7 days;
    * the JSON-lines log has no run ids, so the window is time-based —
    * `since`, defaulting to 7 days before the newest event. For a log
    * holding one run the two definitions coincide. */
  def summarizeLatest(es: Seq[MonitorEvent], step: Option[String],
                      since: Option[Long],
                      kinds: Map[String, String] = Map.empty)
      : (Seq[EventSummary], Map[String, Int]) = {
    val stamped = es.filter(e => step.forall(_ == e.step) && e.ts.nonEmpty)
    val cut = since.orElse(
      stamped.flatMap(_.ts).maxOption.map(_ - 7L * 24 * 3600 * 1000))
    val window = stamped.filter(e => cut.forall(c => e.ts.exists(_ >= c)))
    val latest = window.groupBy(_.target)
      .map { case (_, g) => g.maxBy(_.ts.get) }.toSeq
    val stats = latest.groupBy(_.event).map { case (k, g) => (k, g.size) }
    val rows = latest.map(e => EventSummary(e.target,
      kinds.getOrElse(e.target, "---"), e.step, e.ts.get, e.event,
      e.elapsedSeconds, e.rowcount.getOrElse(0L)))
    val schemas = rows.groupBy(_.target.takeWhile(_ != '.'))
      .collect { case (schema, g) if g.head.target.contains('.') =>
        EventSummary(schema, "---", g.head.step, g.map(_.ts).max,
          "complete", g.map(_.elapsedSeconds).sum, g.map(_.rowcount).sum)
      }.toSeq
    ((rows ++ schemas).sortBy(r => (r.ts, r.target)), stats)
  }

  private[graft] def filter(es: Seq[MonitorEvent], target: Option[String],
                          step: Option[String],
                          since: Option[Long] = None): Seq[MonitorEvent] = {
    val sel = target.map(t => TableSelector(t.split(',').toSeq))
    es.filter(e => sel.forall(s =>
        scala.util.Try(TableName.parse(e.target)).toOption.exists(s.matches)))
      .filter(e => step.forall(_ == e.step))
      .filter(e => since.forall(cut => e.ts.exists(_ >= cut)))
  }

  /** Read a JSON-lines event log back — the cross-run query path: a
    * fresh CLI process asking "what happened to relation X in the
    * last run" reads the previous run's log. */
  def readLog(path: String): Seq[MonitorEvent] = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(path)
    if (!Files.exists(p)) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.trim.nonEmpty).map { line =>
        val n = mapper.readTree(line)
        def optLong(f: String) = Option(n.get(f)).map(_.asLong)
        MonitorEvent(
          n.get("target").asText, n.get("step").asText, n.get("event").asText,
          n.get("elapsed").asDouble,
          optLong("rowcount"),
          Option(n.get("message")).map(_.asText),
          Option(n.get("metrics")).map { m =>
            def l(f: String) = Option(m.get(f)).map(_.asLong).getOrElse(0L)
            LoadMetrics(l("files_read"), l("bytes_read"),
              l("shuffle_bytes_written"), l("files_written"),
              l("bytes_written"), l("rows_written"))
          },
          optLong("ts"))
      }
  }

  /** `tail_events --follow` (commands.py:2036-2088): keep polling the
    * event log, emitting each NEW event as it lands, and quit when no
    * new event arrives within `idleTimeoutMs` (the reference: 30 s
    * poll / 1 h idle timeout — "automatically quits when no new event
    * arrives within an hour"). Already-present events are the caller's
    * to print first; the follow starts after `skip` events. Returns
    * the number of events emitted. The log is re-read per poll — the
    * readLog parse is proportional to the file, fine for the JSON-
    * lines logs one run writes; a long-lived production follower
    * would seek to a byte offset instead. */
  def followLog(path: String, target: Option[String], step: Option[String],
                since: Option[Long], skip: Int,
                pollMs: Long, idleTimeoutMs: Long)
               (onEvent: MonitorEvent => Unit): Int = {
    var seen = skip
    var emitted = 0
    var lastNew = System.currentTimeMillis()
    var go = true
    while (go) {
      val all = readLog(path)
      if (all.size > seen) {
        filter(all.drop(seen), target, step, since).foreach { e =>
          onEvent(e); emitted += 1
        }
        seen = all.size
        lastNew = System.currentTimeMillis()
      } else if (System.currentTimeMillis() - lastNew >= idleTimeoutMs) {
        go = false
      }
      if (go) Thread.sleep(pollMs)
    }
    emitted
  }

  private[etl] def toJson(e: MonitorEvent): String = {
    val rc = e.rowcount.map(r => s""","rowcount":$r""").getOrElse("")
    val msg = e.message.map(m => s""","message":"${jsonEscape(m)}"""").getOrElse("")
    val met = e.metrics.map(m =>
      s""","metrics":{"files_read":${m.filesRead},"bytes_read":${m.bytesRead}""" +
      s""","shuffle_bytes_written":${m.shuffleBytesWritten}""" +
      s""","files_written":${m.filesWritten},"bytes_written":${m.bytesWritten}""" +
      s""","rows_written":${m.rowsWritten}}""").getOrElse("")
    val ts = e.ts.map(t => s""","ts":$t""").getOrElse("")
    s"""{"target":"${jsonEscape(e.target)}","step":"${e.step}","event":"${e.event}"""" +
      s""","elapsed":${e.elapsedSeconds}$rc$msg$met$ts}"""
  }

  /** Exception messages routinely contain newlines/tabs; escaping
    * only quote+backslash would emit broken JSON lines. Same rule as
    * Verify's dump: all control chars < 0x20 become \\uXXXX. */
  private[etl] def jsonEscape(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
}
