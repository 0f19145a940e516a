package graft

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.collect.Collector

/** A1-A3 against an embedded coordinator stub: state filter, incremental
  * dedup sink, gzip output, auth headers, error tolerance.
  */
class CollectorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  @volatile private var detailHits = Map.empty[String, Int].withDefaultValue(0)
  @volatile private var lastUserHeader: Option[String] = None

  private val listJson =
    """[
      |  {"queryId": "20220101_000001_00001_aaaaa", "state": "FINISHED"},
      |  {"queryId": "20220101_000002_00002_bbbbb", "state": "RUNNING"},
      |  {"queryId": "20220101_000003_00003_ccccc", "state": "FAILED"},
      |  {"queryId": "20220101_000004_00004_ddddd", "state": "QUEUED"}
      |]""".stripMargin

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress(0), 0)
    port = server.getAddress.getPort
    server.createContext("/v1/query", (ex: HttpExchange) => {
      lastUserHeader = Option(ex.getRequestHeaders.getFirst("X-Trino-User"))
      val path = ex.getRequestURI.getPath
      val body: Option[String] =
        if (path == "/v1/query") Some(listJson)
        else {
          val id = path.stripPrefix("/v1/query/")
          detailHits = detailHits.updated(id, detailHits(id) + 1)
          if (id.startsWith("20220101_000003")) None // detail fetch fails
          else Some(s"""{"queryId": "$id", "state": "FINISHED", "query": "SELECT 1"}""")
        }
      body match {
        case Some(b) =>
          val bytes = b.getBytes("UTF-8")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        case None =>
          ex.sendResponseHeaders(500, -1)
      }
      ex.close()
    })
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  test("collects only done states, skips existing, tolerates failures") {
    val out = java.nio.file.Files.createTempDirectory("graft-collect").toString
    val c = new Collector(s"http://localhost:$port", user = "tester")
    // cycle 1: FINISHED ok, FAILED-detail 500s, RUNNING/QUEUED filtered
    assert(c.collectOnce(out, delayMs = 0) === 1)
    assert(lastUserHeader === Some("tester"))
    // cycle 2: nothing new — the existing file is not re-fetched
    assert(c.collectOnce(out, delayMs = 0) === 0)
    assert(detailHits("20220101_000001_00001_aaaaa") === 1)
    // gzip content round-trips as valid JSON with the id
    val path = java.nio.file.Paths.get(out, "20220101_000001_00001_aaaaa.json.gz")
    assert(java.nio.file.Files.exists(path))
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(path.toFile))
    val content = new String(in.readAllBytes(), "UTF-8")
    assert(content.contains("20220101_000001_00001_aaaaa"))
    // never asked for the RUNNING/QUEUED queries
    assert(detailHits("20220101_000002_00002_bbbbb") === 0)
  }

  test("custom endpoint prefixes the detail URL; custom header replaces both defaults") {
    // the stub only serves /v1/query, so a collector pointed at a custom
    // endpoint must fail its LIST call (proving the endpoint is honored
    // end-to-end, list and detail share it — collect.py:87,105)
    val out = java.nio.file.Files.createTempDirectory("graft-collect-ep").toString
    val wrong = new Collector(s"http://localhost:$port", endpoint = "/custom/query")
    assert(wrong.listDone() === Seq.empty)
    assert(wrong.collectOnce(out, delayMs = 0) === 0)
    // --username-request-header: the Trino default header must be ABSENT
    // when a custom (Presto-only) header is configured
    val presto = new Collector(s"http://localhost:$port", user = "tester",
      userRequestHeader = Some("X-Presto-User"))
    assert(presto.listDone().nonEmpty)
    assert(lastUserHeader === None) // X-Trino-User was not sent
  }

  test("ids are processed in sorted order (the reference's download order)") {
    val c = new Collector(s"http://localhost:$port")
    val ids = c.listDone()
    assert(ids === ids.sorted && ids.nonEmpty)
  }

  test("redirects are followed and the session cookie survives the hop (requests parity)") {
    // a coordinator behind an auth proxy: /login/query 302s to /v1/query
    // setting a session cookie; subsequent requests must present it —
    // python-requests does both implicitly, so the default client must too
    server.createContext("/login/query", (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Set-Cookie", "graftsession=s3cret; Path=/")
      ex.getResponseHeaders.add("Location", s"http://localhost:$port/v1/query")
      ex.sendResponseHeaders(302, -1)
      ex.close()
    })
    @volatile var sawCookie = false
    server.createContext("/cookiecheck/query", (ex: HttpExchange) => {
      sawCookie = Option(ex.getRequestHeaders.getFirst("Cookie"))
        .exists(_.contains("graftsession=s3cret"))
      val bytes = listJson.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    val c = new Collector(s"http://localhost:$port", endpoint = "/login/query")
    // the 302 is followed to /v1/query, which serves the list
    assert(c.listDone().nonEmpty)
    // same-origin hop: the user header still rides on the redirected call
    assert(lastUserHeader.nonEmpty)
    // and the cookie it set rides on later requests from the same session
    val c2 = new Collector(s"http://localhost:$port",
      endpoint = "/cookiecheck/query", http = {
        val client = Collector.defaultClient()
        // prime the cookie store through the login hop
        client.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://localhost:$port/login/query")).build(),
          java.net.http.HttpResponse.BodyHandlers.discarding())
        client
      })
    assert(c2.listDone().nonEmpty)
    assert(sawCookie, "session cookie was not replayed after the redirect hop")
  }

  test("cross-origin redirect strips auth and user headers (requests rebuild_auth parity)") {
    // a second server = a different origin (different port). A redirect
    // there must arrive BARE: java.net.http's own NORMAL mode would
    // re-send Authorization cross-origin, which is why Collector follows
    // redirects manually.
    val foreign = HttpServer.create(new InetSocketAddress(0), 0)
    val fport = foreign.getAddress.getPort
    @volatile var foreignAuth: Option[String] = None
    @volatile var foreignUser: Option[String] = None
    foreign.createContext("/v1/query", (ex: HttpExchange) => {
      foreignAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      foreignUser = Option(ex.getRequestHeaders.getFirst("X-Trino-User"))
      val bytes = listJson.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    foreign.start()
    try {
      server.createContext("/offsite/query", (ex: HttpExchange) => {
        ex.getResponseHeaders.add("Location", s"http://localhost:$fport/v1/query")
        ex.sendResponseHeaders(302, -1)
        ex.close()
      })
      val c = new Collector(s"http://localhost:$port", user = "tester",
        basicAuth = Some(("u", "p")), endpoint = "/offsite/query")
      assert(c.listDone().nonEmpty) // the redirect itself is still followed
      assert(foreignAuth === None,
        s"Authorization leaked to the foreign origin: $foreignAuth")
      assert(foreignUser === None, "user header leaked to the foreign origin")
    } finally foreign.stop(0)
  }

  test("sameOrigin: scheme-default ports normalize; real differences still differ") {
    import java.net.URI
    val c = new Collector(s"http://localhost:$port")
    // a proxy that adds the explicit default port is the SAME origin —
    // before r14 this hop read as foreign and shipped the request bare
    assert(c.sameOrigin(URI.create("http://coord/v1"), URI.create("http://coord:80/v1")))
    assert(c.sameOrigin(URI.create("https://coord/v1"), URI.create("https://coord:443/v1")))
    // genuinely different port / host / scheme stay cross-origin
    assert(!c.sameOrigin(URI.create("http://coord/v1"), URI.create("http://coord:8080/v1")))
    assert(!c.sameOrigin(URI.create("http://coord/v1"), URI.create("http://other/v1")))
    assert(!c.sameOrigin(URI.create("http://coord:443/v1"), URI.create("https://coord/v1")))
  }

  test("a dead coordinator yields an empty cycle, not a crash (loop survival)") {
    // connection refused is a transport exception from http.send, not a
    // status code — before r14 it killed the whole --loop poller
    val dead = new Collector("http://localhost:1") // port 1: nothing listens
    assert(dead.listDone() === Seq.empty)
    val out = java.nio.file.Files.createTempDirectory("graft-collect-dead").toString
    assert(dead.collectOnce(out, delayMs = 0) === 0)
    // malformed list body: parse failure is also an empty cycle
    server.createContext("/garbage/query", (ex: HttpExchange) => {
      val b = "not json at all".getBytes("UTF-8")
      ex.sendResponseHeaders(200, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    val garbled = new Collector(s"http://localhost:$port", endpoint = "/garbage/query")
    assert(garbled.listDone() === Seq.empty)
  }

  test("loop exits cleanly on interrupt (the documented stop mechanism)") {
    val out = java.nio.file.Files.createTempDirectory("graft-collect-loop").toString
    val c = new Collector(s"http://localhost:$port", user = "tester")
    @volatile var crashed: Option[Throwable] = None
    val t = new Thread(() => {
      try c.loop(out, delayMs = 0, loopDelayMs = 60000)
      catch { case e: Throwable => crashed = Some(e) }
    })
    t.start()
    // let the first cycle run, then interrupt mid-sleep — the
    // InterruptedException from Thread.sleep must end the loop, not
    // escape it (before r14 it crashed out of main with a stack trace)
    Thread.sleep(500)
    t.interrupt()
    t.join(10000)
    assert(!t.isAlive, "loop did not exit within 10 s of the interrupt")
    assert(crashed.isEmpty, s"loop escaped with ${crashed.map(_.toString)}")
  }
}
