package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** The live HTTP dashboard: latest-per-(target,step) view, the
  * reference's running-first ordering, JSON endpoints, and the
  * redirect-to-index behavior — exercised over a real socket on an
  * ephemeral port. */
class MonitorServerSpec extends AnyFunSuite {

  private def get(port: Int, path: String): (Int, String, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setInstanceFollowRedirects(false)
    val code = conn.getResponseCode
    val body =
      if (code == 200)
        new String(conn.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
      else ""
    val loc = Option(conn.getHeaderField("Location")).getOrElse("")
    conn.disconnect()
    (code, body, loc)
  }

  test("serves latest events running-first, etl id, summary, and index") {
    val mon = new Monitor()
    // t1 ran twice: only the LATER event may appear (latest-per-key)
    mon.record("rep.t1", "load", "start", 0.0)
    mon.record("rep.t1", "load", "finish", 1.5, rowcount = Some(42L))
    Thread.sleep(2) // distinct ts for the ordering assertion
    mon.record("rep.t2", "load", "start", 0.0)
    Thread.sleep(2)
    mon.record("rep.t3", "extract", "fail", 0.7,
      message = Some("boom \"quoted\""))
    val srv = new MonitorServer(mon, "run-abc", requestedPort = 0).start()
    try {
      val (c1, events, _) = get(srv.port, "/api/events")
      assert(c1 == 200)
      // latest-per-key: t1's start is gone, its finish remains
      assert(!events.contains("\"target\":\"rep.t1\",\"step\":\"load\",\"event\":\"start\""))
      assert(events.contains("\"rowcount\":42"))
      // running-first: t2's start sorts before both completed events
      // even though t3's fail is newer
      assert(events.indexOf("rep.t2") < events.indexOf("rep.t3"), events)
      assert(events.indexOf("rep.t2") < events.indexOf("rep.t1"), events)
      // message escaping survives
      assert(events.contains("boom \\\"quoted\\\""))

      val (c2, id, _) = get(srv.port, "/api/etl-id")
      assert(c2 == 200 && id == """{"id":"run-abc"}""")

      val (c3, summary, _) = get(srv.port, "/api/summary")
      assert(c3 == 200)
      assert(summary.contains("\"step\":\"load\"") &&
        summary.contains("\"finished\":1"))
      assert(summary.contains("\"step\":\"extract\"") &&
        summary.contains("\"failed\":1"))

      val (c4, html, _) = get(srv.port, "/")
      assert(c4 == 200 && html.contains("<table") &&
        html.contains("rep.t3") && html.contains("run-abc"))

      // unknown path: the reference's 301-to-index, not a 404
      val (c5, _, loc) = get(srv.port, "/no/such/page")
      assert(c5 == 301 && loc == "/")

      // the view is LIVE: a new event shows on the next poll
      mon.record("rep.t4", "unload", "start", 0.0)
      val (_, events2, _) = get(srv.port, "/api/events")
      assert(events2.contains("rep.t4"))
    } finally srv.stop()
  }
}
