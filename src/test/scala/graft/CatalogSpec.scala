package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Catalog, Load, RunLog}
import graft.sources.Catalog.{FetchResponse, Fetcher, ResourceMeta}

/** Remote catalog extraction (reference etl/extract.py: retry session,
  * package_show + prefix filter, diff_resources, _download_raw) against
  * scripted fetchers — the offline stand-in for the CKAN HTTP API — plus
  * the run-log uploader (etl/upload_log.py).
  */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Fetcher that serves a fixed script of responses per URL, recording
    * calls; running past the script repeats the last entry.
    */
  private class ScriptedFetcher(script: Map[String, Seq[FetchResponse]]) extends Fetcher {
    val calls = mutable.Buffer.empty[(String, Map[String, String])]
    private val served = mutable.Map.empty[String, Int].withDefaultValue(0)
    override def get(url: String, params: Map[String, String]): FetchResponse = {
      calls += ((url, params))
      val seq = script.getOrElse(url, sys.error(s"unscripted url: $url"))
      val i = served(url); served(url) = i + 1
      seq(math.min(i, seq.size - 1))
    }
  }

  private def ok(body: String) = FetchResponse(200, body.getBytes("UTF-8"))
  private def status(code: Int) = FetchResponse(code, Array.empty)

  private val pkgJson =
    """{"success": true, "result": {"resources": [
      |  {"id": "r1", "name": "Detenciones 2023.xlsx", "url": "http://x/d1",
      |   "format": "xlsx", "last_modified": "2023-05-01T10:00:00", "size": 1234},
      |  {"id": "r2", "name": "detenciones_2024", "url": "http://x/d2.csv",
      |   "format": "CSV", "metadata_modified": "2024-02-03T04:05:06+02:00", "size": "99"},
      |  {"id": "r3", "name": "otros datos", "url": "http://x/d3",
      |   "format": "", "size": 7}
      |]}}""".stripMargin

  // ------------------------------------------------------------------
  // Retry policy (extract.py:51-70)
  // ------------------------------------------------------------------

  test("withRetries: retries forcelisted statuses with exponential backoff, then succeeds") {
    val f = new ScriptedFetcher(Map("u" -> Seq(status(503), status(429), ok("hi"))))
    val sleeps = mutable.Buffer.empty[Double]
    val r = Catalog.withRetries(f, backoffFactor = 0.6, sleeper = s => sleeps += s)
    assert(r.get("u").bodyString == "hi")
    assert(f.calls.size == 3)
    assert(sleeps.toSeq == Seq(0.6, 1.2), "urllib3 ladder: factor * 2^attempt")
  }

  test("withRetries: exhausts total and surfaces the last status; 4xx not retried") {
    val f = new ScriptedFetcher(Map("u" -> Seq(status(500))))
    val sleeps = mutable.Buffer.empty[Double]
    val r = Catalog.withRetries(f, total = 3, sleeper = s => sleeps += s)
    assert(r.get("u").status == 500)
    assert(f.calls.size == 4, "1 attempt + 3 retries")
    assert(sleeps.size == 3)

    val f404 = new ScriptedFetcher(Map("u" -> Seq(status(404))))
    assert(Catalog.withRetries(f404, sleeper = _ => ()).get("u").status == 404)
    assert(f404.calls.size == 1, "404 is not in the forcelist")
  }

  test("withRetries: transport exceptions retry too, and rethrow when exhausted") {
    var n = 0
    val flaky = new Fetcher {
      override def get(url: String, params: Map[String, String]): FetchResponse = {
        n += 1
        if (n <= 2) throw new java.io.IOException("conn reset") else ok("ok")
      }
    }
    assert(Catalog.withRetries(flaky, sleeper = _ => ()).get("u").bodyString == "ok")
    assert(n == 3)

    val dead = new Fetcher {
      override def get(url: String, params: Map[String, String]): FetchResponse =
        throw new java.io.IOException("refused")
    }
    intercept[java.io.IOException] {
      Catalog.withRetries(dead, total = 2, sleeper = _ => ()).get("u")
    }
  }

  // ------------------------------------------------------------------
  // package_show (extract.py:110-157)
  // ------------------------------------------------------------------

  test("packageShow parses resources and normalizes fingerprint fields") {
    val f = new ScriptedFetcher(Map("api" -> Seq(ok(pkgJson))))
    val rs = Catalog.packageShow(f, "api", "pkg-1")
    assert(f.calls.head == (("api", Map("id" -> "pkg-1"))))
    assert(rs.map(_.id) == Seq("r1", "r2", "r3"))
    val r1 = rs.head
    assert(r1.format == "XLSX", "format upper-cased like the reference fingerprint")
    assert(r1.lastModified == "2023-05-01T10:00:00Z", "naive timestamps assumed UTC")
    val r2 = rs(1)
    assert(r2.lastModified == "2024-02-03T02:05:06Z", "zoned timestamps convert to UTC")
    assert(r2.size == 99L, "string sizes coerce")
    assert(rs(2).lastModified == "" && rs(2).size == 7L)
  }

  test("packageShow prefix: normalized startswith, then contains fallback") {
    def show(prefix: String): Seq[String] = {
      val f = new ScriptedFetcher(Map("api" -> Seq(ok(pkgJson))))
      Catalog.packageShow(f, "api", "p", prefix).map(_.id)
    }
    // Accent-stripped, case-folded startswith (name "Detenciones 2023.xlsx").
    assert(show("DETENCIONES") == Seq("r1", "r2"))
    assert(show("'detenciones'") == Seq("r1", "r2"), "reference strips quotes")
    // No startswith hit → contains fallback ("datos" is inside r3's name).
    assert(show("datos") == Seq("r3"))
    assert(show("") == Seq("r1", "r2", "r3"))
  }

  test("packageShow raises on success=false and on HTTP failure") {
    val bad = new ScriptedFetcher(Map("api" -> Seq(ok("""{"success": false}"""))))
    intercept[RuntimeException] { Catalog.packageShow(bad, "api", "p") }
    val http = new ScriptedFetcher(Map("api" -> Seq(status(403))))
    intercept[java.io.IOException] { Catalog.packageShow(http, "api", "p") }
  }

  // ------------------------------------------------------------------
  // diff_resources (extract.py:160-184)
  // ------------------------------------------------------------------

  test("diffResources: new / changed-with-reasons / unchanged") {
    val cur = Seq(
      ResourceMeta("a", "A", "u1", "CSV", "2024-01-01T00:00:00Z", 10),
      ResourceMeta("b", "B", "u2", "CSV", "2024-01-01T00:00:00Z", 20),
      ResourceMeta("c", "C", "u3", "CSV", "2024-01-01T00:00:00Z", 30))
    val prev = Map(
      "b" -> ResourceMeta("b", "B", "u2", "CSV", "2024-01-01T00:00:00Z", 20),
      "c" -> ResourceMeta("c", "C", "u3-old", "XLSX", "2023-01-01T00:00:00Z", 30))
    val (down, same, reasons) = Catalog.diffResources(cur, prev)
    assert(down.map(_.id) == Seq("a", "c"))
    assert(same.map(_.id) == Seq("b"))
    assert(reasons == Seq(
      Catalog.DiffReason("a", "new"),
      Catalog.DiffReason("c", "last_modified,url,format")))
  }

  // ------------------------------------------------------------------
  // State file round trip + crash healing
  // ------------------------------------------------------------------

  test("catalog state round-trips and heals a half-finished swap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val statePath = s"$dir/state.json"
    val st = Map(
      "r1" -> ResourceMeta("r1", "Detenciones \"2023\"", "http://x/d1", "XLSX",
        "2023-05-01T10:00:00Z", 1234),
      "r2" -> ResourceMeta("r2", "d2", "http://x/d2.csv", "CSV", "", 99))
    Catalog.saveCatalogState(spark, statePath, st)
    assert(Catalog.loadCatalogState(spark, statePath) == st,
      "round trip including quoted names")

    // Crash window: state renamed to .old, .tmp promotion never happened.
    val f = new java.io.File(statePath)
    assert(f.renameTo(new java.io.File(statePath + ".old")))
    assert(Catalog.loadCatalogState(spark, statePath) == st, "healed from .old")
  }

  // ------------------------------------------------------------------
  // Raw naming (extract.py:189-225)
  // ------------------------------------------------------------------

  test("inferExt / safeStem / rawPath follow the reference rules") {
    def meta(name: String, url: String, fmt: String) =
      ResourceMeta("rid", name, url, fmt, "", 0)
    assert(Catalog.inferExt(meta("n", "u", "XLSX")) == ".xlsx")
    assert(Catalog.inferExt(meta("n", "http://x/f.CSV", "")) == ".csv")
    assert(Catalog.inferExt(meta("n", "http://x/f", "")) == ".bin")
    assert(Catalog.safeStem("Detenciones 2023.xlsx", "rid") == "Detenciones_2023")
    assert(Catalog.safeStem("  ", "rid") == "rid")
    assert(Catalog.safeStem("a/b:c", "rid") == "a_b_c")
    assert(Catalog.rawPath(meta("Datos 2024.csv", "u", "CSV"), "/raw/") ==
      "/raw/Datos_2024.csv")
  }

  // ------------------------------------------------------------------
  // sync end-to-end: show → diff → download → promote-after-load
  // ------------------------------------------------------------------

  test("sync downloads only new/changed resources and state promotion is caller-gated") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sync").toString
    val statePath = s"$dir/state.json"
    val f = new ScriptedFetcher(Map(
      "api" -> Seq(ok(pkgJson)),
      "http://x/d1" -> Seq(ok("xlsx-bytes")),
      "http://x/d2.csv" -> Seq(ok("a,b\n1,2\n")),
      "http://x/d3" -> Seq(ok("blob"))))

    val s1 = Catalog.sync(spark, f, "api", "pkg", "", s"$dir/raw", statePath)
    assert(s1.downloaded.size == 3 && s1.unchanged == 0)
    assert(s1.downloaded.exists(_.endsWith("Detenciones_2023.xlsx")))
    assert(s1.downloaded.exists(_.endsWith("detenciones_2024.csv")))
    assert(s1.downloaded.exists(_.endsWith("otros_datos.bin")))
    val csv = s1.downloaded.find(_.endsWith(".csv")).get
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(csv)), "UTF-8") == "a,b\n1,2\n")

    // State not promoted yet: a re-sync before saveCatalogState re-downloads.
    val f2 = new ScriptedFetcher(Map(
      "api" -> Seq(ok(pkgJson)),
      "http://x/d1" -> Seq(ok("xlsx-bytes")),
      "http://x/d2.csv" -> Seq(ok("a,b\n1,2\n")),
      "http://x/d3" -> Seq(ok("blob"))))
    assert(Catalog.sync(spark, f2, "api", "pkg", "", s"$dir/raw", statePath)
      .downloaded.size == 3)

    // Promote (the "load succeeded" step), then nothing is re-downloaded.
    Catalog.saveCatalogState(spark, statePath, s1.state)
    val f3 = new ScriptedFetcher(Map("api" -> Seq(ok(pkgJson))))
    val s3 = Catalog.sync(spark, f3, "api", "pkg", "", s"$dir/raw", statePath)
    assert(s3.downloaded.isEmpty && s3.unchanged == 3)

    // A metadata change on one resource re-downloads exactly that one.
    val bumped = pkgJson.replace(""""size": 1234""", """"size": 5678""")
    val f4 = new ScriptedFetcher(Map(
      "api" -> Seq(ok(bumped)), "http://x/d1" -> Seq(ok("new-bytes"))))
    val s4 = Catalog.sync(spark, f4, "api", "pkg", "", s"$dir/raw", statePath)
    assert(s4.downloaded.size == 1 && s4.unchanged == 2)
    assert(s4.reasons == Seq(Catalog.DiffReason("r1", "size")))
  }

  test("seedStateFromMetadata records fingerprints without downloading") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seed").toString
    val statePath = s"$dir/state.json"
    val f = new ScriptedFetcher(Map("api" -> Seq(ok(pkgJson))))
    Catalog.seedStateFromMetadata(spark, f, "api", "pkg", "", statePath)
    assert(f.calls.size == 1, "only package_show — no resource URLs fetched")
    val st = Catalog.loadCatalogState(spark, statePath)
    assert(st.keySet == Set("r1", "r2", "r3"))
    val f2 = new ScriptedFetcher(Map("api" -> Seq(ok(pkgJson))))
    assert(Catalog.sync(spark, f2, "api", "pkg", "", s"$dir/raw", statePath)
      .downloaded.isEmpty, "seeded state means nothing is 'new'")
  }

  // ------------------------------------------------------------------
  // Run-log upload (upload_log.py)
  // ------------------------------------------------------------------

  test("readLogDf keeps valid JSON lines as columns and junk lines in `raw`") {
    val dir = java.nio.file.Files.createTempDirectory("graft-log").toString
    val log = s"$dir/etl.log"
    java.nio.file.Files.write(java.nio.file.Paths.get(log),
      ("""{"ts": "2024-01-01T00:00:00Z", "level": "INFO", "msg": "start"}""" + "\n" +
        "\n" +
        "plain text warning line\n" +
        """{"ts": "2024-01-01T00:01:00Z", "level": "ERROR", "msg": "boom"}""" + "\n")
        .getBytes("UTF-8"))
    val df = RunLog.readLogDf(spark, log)
    assert(df.columns.toSet == Set("ts", "level", "msg", "raw"))
    assert(df.count() == 3, "empty lines dropped, junk kept")
    val rows = df.collect()
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("raw"))) == 1)
    assert(rows.exists(r => !r.isNullAt(r.fieldIndex("raw")) &&
      r.getString(r.fieldIndex("raw")) == "plain text warning line"))
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("level"))) == 2)
  }

  test("uploadLog pushes every parsed row through the batched retry writer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-log2").toString
    val log = s"$dir/etl.log"
    val lines = (0 until 1203).map(i => s"""{"i": $i, "msg": "m$i"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(log),
      lines.mkString("\n").getBytes("UTF-8"))
    LoadSinks.reset()
    val res = RunLog.uploadLog(spark, log, LoadSinks.collecting)
    assert(res.rowsWritten == 1203 && res.rowsFailed == 0)
    assert(LoadSinks.landed.size() == 1203)
    assert(LoadSinks.maxSeenBatch.get() <= 500, "reference chunk bound respected")
  }

  // ------------------------------------------------------------------
  // Loopback HTTP fixture: the REAL client stack, zero egress
  // ------------------------------------------------------------------

  /** In-JVM HTTP server on 127.0.0.1 — drives the PRODUCTION
    * [[Catalog.HttpFetcher]] (JDK HttpClient: real sockets, redirects,
    * timeouts) plus the retry wrapper end-to-end without leaving
    * loopback. The scripted-fetcher tests above pin the protocol logic;
    * this pins the transport the reference hits on day one
    * (extract.py:51-70 session + :258-276 download).
    */
  test("loopback HTTP: real HttpFetcher syncs end-to-end — 5xx retried, " +
      "redirect followed, unchanged skipped, mid-download failure leaves " +
      "the state file byte-identical") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    def count(path: String): Int =
      hits.merge(path, 1, (a, b) => a + b)
    def handle(path: String)(f: (HttpExchange, Int) => Unit): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        try f(ex, count(path)) finally ex.close()
      })
    def respond(ex: HttpExchange, status: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
    }
    try {
      server.start()
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      def pkg(aLm: String, withPoison: Boolean) = {
        val poison = if (withPoison)
          s""",{"id": "rp", "name": "poison", "url": "$base/dl/poison.csv",
             |  "format": "CSV", "last_modified": "2024-03-01T00:00:00", "size": 3}""".stripMargin
        else ""
        s"""{"success": true, "result": {"resources": [
           |  {"id": "ra", "name": "datos_a", "url": "$base/dl/a.csv",
           |   "format": "CSV", "last_modified": "$aLm", "size": 10},
           |  {"id": "rb", "name": "datos_b", "url": "$base/redir/b.csv",
           |   "format": "CSV", "last_modified": "2024-01-02T00:00:00", "size": 20}
           |  $poison
           |]}}""".stripMargin
      }
      @volatile var pkgBody = pkg("2024-01-01T00:00:00", withPoison = false)
      // package_show: FIRST hit 503 — the 2-attempt fetch proves the
      // retry wrapper drives the real client, not just the scripted one.
      handle("/api/3/action/package_show") { (ex, n) =>
        assert(ex.getRequestURI.getQuery == "id=pkg1", "id param encoded")
        if (n == 1) respond(ex, 503, Array.empty)
        else respond(ex, 200, pkgBody.getBytes("UTF-8"))
      }
      handle("/dl/a.csv")((ex, _) =>
        respond(ex, 200, "c\n1\n".getBytes("UTF-8")))
      // rb's catalog URL 302-redirects — allow_redirects=True semantics.
      handle("/redir/b.csv") { (ex, _) =>
        ex.getResponseHeaders.add("Location", s"$base/dl/b.csv")
        respond(ex, 302, Array.empty)
      }
      handle("/dl/b.csv")((ex, _) =>
        respond(ex, 200, "c\n2\n".getBytes("UTF-8")))
      // Poison: 404 is NOT forcelisted — fails fast, mid-sync.
      handle("/dl/poison.csv")((ex, _) => respond(ex, 404, Array.empty))

      val dir = java.nio.file.Files.createTempDirectory("graft-loop").toString
      val statePath = s"$dir/state.json"
      val fetcher = Catalog.withRetries(new Catalog.HttpFetcher(
        connectTimeoutSec = 5, readTimeoutSec = 5), sleeper = _ => ())
      val api = s"$base/api/3/action/package_show"

      // Round 1: both resources staged (one through the redirect).
      val r1 = Catalog.sync(spark, fetcher, api, "pkg1", "", s"$dir/raw", statePath)
      assert(r1.downloaded.map(new java.io.File(_).getName).sorted ==
        Seq("datos_a.csv", "datos_b.csv"))
      assert(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/raw/datos_b.csv")), "UTF-8") == "c\n2\n")
      assert(hits.get("/api/3/action/package_show") == 2, "503 then 200")
      Catalog.saveCatalogState(spark, statePath, r1.state)
      val stateBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(statePath))

      // Round 2: identical metadata — nothing re-downloaded.
      val dlBefore = (hits.get("/dl/a.csv"), hits.get("/dl/b.csv"))
      val r2 = Catalog.sync(spark, fetcher, api, "pkg1", "", s"$dir/raw", statePath)
      assert(r2.downloaded.isEmpty && r2.unchanged == 2)
      assert((hits.get("/dl/a.csv"), hits.get("/dl/b.csv")) == dlBefore,
        "unchanged resources never re-fetched")

      // Round 3: a's fingerprint moves AND a poison resource appears; the
      // download fails mid-sync (a staged before poison raised) and the
      // caller-gated promotion never runs — the state FILE is untouched,
      // so the next run re-extracts a: the reference's crash contract.
      pkgBody = pkg("2024-06-01T00:00:00", withPoison = true)
      val ex = intercept[java.io.IOException] {
        Catalog.sync(spark, fetcher, api, "pkg1", "", s"$dir/raw", statePath)
      }
      assert(ex.getMessage.contains("404"))
      assert(java.util.Arrays.equals(stateBytes,
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(statePath))),
        "state file must be byte-identical after a failed sync")
      // And the re-run after the failure re-extracts a (the moved
      // fingerprint was never promoted) — verified against a healed
      // catalog (poison gone).
      pkgBody = pkg("2024-06-01T00:00:00", withPoison = false)
      val r4 = Catalog.sync(spark, fetcher, api, "pkg1", "", s"$dir/raw", statePath)
      assert(r4.downloaded.map(new java.io.File(_).getName) == Seq("datos_a.csv") &&
        r4.reasons == Seq(Catalog.DiffReason("ra", "last_modified")))
    } finally server.stop(0)
  }
}
