package graft.etl

import java.nio.charset.StandardCharsets

/** Live monitor dashboard — the HTTP analogue of the reference's
  * in-memory event server (monitor.py:433-600 `MemoryStorage` +
  * `MonitorHTTPHandler`): while a long load runs, an operator points
  * a browser (or `curl`, or an ssh port-forward from a laptop to the
  * driver host) at the driver and watches per-relation progress
  * without touching logs.
  *
  * Behavior mirrored from the reference:
  *   - the server keeps the LATEST event per (target, step) — later
  *     events overwrite earlier ones, so the view is "where is every
  *     relation now", not a log;
  *   - `/api/events` lists those events with RUNNING steps first
  *     (event == start) and newest-first within each group — the
  *     reference's exact sort;
  *   - `/api/etl-id` identifies the run;
  *   - unknown paths redirect (301) to `/`, which serves a minimal
  *     self-contained HTML status table.
  *
  * Additions over the reference: `/api/summary` exposes the Q7
  * per-step rollup as JSON.
  *
  * Built on the JDK's `com.sun.net.httpserver` (zero dependencies, a
  * daemon executor thread — same operational footprint as the
  * reference's daemonized `http.server`). Pass `port = 0` for an
  * ephemeral port (tests); the reference's fixed default is 8086.
  * The server reads the monitor's live buffer on every request — no
  * copy of the event stream, no queue to drain.
  *
  * Binds LOOPBACK only by default: the endpoints carry relation
  * names, step states, and row counts with no authentication, and
  * the documented access story (browser on the driver host, or an
  * ssh port-forward from a laptop) needs nothing more. An operator
  * who really wants a LAN-visible dashboard opts in with an explicit
  * `bindAddress` — a wildcard default would silently expose the
  * run's metadata to any peer that can reach the driver. */
final class MonitorServer(monitor: Monitor, runId: String,
                          requestedPort: Int = 8086,
                          bindAddress: String = "127.0.0.1") {

  private var server: com.sun.net.httpserver.HttpServer = _

  /** The bound port (after [[start]]) — differs from the requested
    * one when an ephemeral port (0) was asked for. */
  def port: Int = server.getAddress.getPort

  def start(): MonitorServer = synchronized {
    require(server == null, "monitor server already started")
    server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress(
        java.net.InetAddress.getByName(bindAddress), requestedPort), 0)
    server.createContext("/", handler)
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor(
      r => {
        val t = new Thread(r, "graft-monitor-http")
        t.setDaemon(true)
        t
      }))
    server.start()
    this
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  /** Latest event per (target, step), running-first then newest-first
    * — the reference's `get_events` ordering (monitor.py:487-496). */
  private[etl] def latestEvents: Seq[MonitorEvent] = {
    val latest = scala.collection.mutable.LinkedHashMap[(String, String), MonitorEvent]()
    monitor.events.foreach(e => latest((e.target, e.step)) = e)
    latest.values.toSeq.sortBy(e =>
      (-(if (e.event == "start") 2 else 1), -e.ts.getOrElse(0L)))
  }

  private def eventsJson: String =
    latestEvents.map(Monitor.toJson).mkString("[", ",", "]")

  private def summaryJson: String =
    monitor.summarize.map { case (step, fin, fail, secs) =>
      s"""{"step":"${Monitor.jsonEscape(step)}","finished":$fin,""" +
        s""""failed":$fail,"elapsed":$secs}"""
    }.mkString("[", ",", "]")

  /** HTML metacharacter escaping — target/step names come from
    * user-supplied design files, so they must not be able to inject
    * markup into the dashboard (jsonEscape handles quotes and control
    * chars but not `<`/`&`). */
  private def htmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def indexHtml: String = {
    val rows = latestEvents.map { e =>
      val cls = e.event match {
        case "fail" => " style=\"color:#b00\""
        case "start" => " style=\"color:#06b\""
        case _ => ""
      }
      s"<tr$cls><td>${htmlEscape(e.target)}</td><td>${htmlEscape(e.step)}</td>" +
        s"<td>${htmlEscape(e.event)}</td><td>${f"${e.elapsedSeconds}%.2f"}</td>" +
        s"<td>${e.rowcount.map(_.toString).getOrElse("---")}</td></tr>"
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>graft ETL monitor</title>
       |<meta http-equiv="refresh" content="5"></head>
       |<body><h1>graft ETL monitor</h1>
       |<p>run <code>${htmlEscape(runId)}</code> &middot;
       |${latestEvents.count(_.event == "start")} running &middot;
       |see <a href="/api/events">/api/events</a>,
       |<a href="/api/summary">/api/summary</a></p>
       |<table border="1" cellpadding="4" cellspacing="0">
       |<tr><th>relation</th><th>step</th><th>event</th>
       |<th>elapsed&nbsp;s</th><th>rows</th></tr>
       |$rows
       |</table></body></html>
       |""".stripMargin
  }

  private val handler = new com.sun.net.httpserver.HttpHandler {
    override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit =
      try {
        val path = ex.getRequestURI.getPath.stripSuffix("/")
        val reply: Option[(String, String)] = path match {
          case "" | "/index.html" => Some((indexHtml, "text/html; charset=utf-8"))
          case "/api/etl-id" =>
            Some((s"""{"id":"${Monitor.jsonEscape(runId)}"}""",
              "application/json"))
          case "/api/events" => Some((eventsJson, "application/json"))
          case "/api/summary" => Some((summaryJson, "application/json"))
          case _ => None
        }
        reply match {
          case Some((body, ctype)) =>
            val bytes = body.getBytes(StandardCharsets.UTF_8)
            ex.getResponseHeaders.set("Content-Type", ctype)
            val head = "HEAD" == ex.getRequestMethod
            ex.sendResponseHeaders(200, if (head) -1 else bytes.length.toLong)
            if (!head) ex.getResponseBody.write(bytes)
          case None =>
            // the reference redirects unknown paths to the index
            ex.getResponseHeaders.set("Location", "/")
            ex.sendResponseHeaders(301, -1)
        }
      } finally ex.close()
  }
}
