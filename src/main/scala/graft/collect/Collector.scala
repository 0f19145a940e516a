package graft.collect

import java.io.FileOutputStream
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.Base64
import java.util.zip.GZIPOutputStream
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Stage 1 (reference `collect.py`): poll the coordinator REST API and save
  * one gzipped QueryInfo JSON per finished query.
  *
  * Deliberately NOT a Spark job (same as the reference): it is a light
  * driver-side poller whose output directory is what `Extract` /
  * `StreamingIngest` consume. Semantics mirrored from `collect.py:32-122`:
  * only FINISHED/FAILED queries (`:90-96`), skip ids whose output file
  * already exists (`:100-103`), per-query politeness delay (`:106`),
  * `?pretty` detail fetch (`:105`), gzip sink (`:116-117`), both
  * X-Trino-User and X-Presto-User headers plus optional basic auth
  * (`:38-48`), non-OK and per-query failures logged and skipped
  * (`:57-59`, `:112-114`).
  */
final class Collector(
    coordinator: String,
    user: String = "analyzer",
    basicAuth: Option[(String, String)] = None,
    endpoint: String = "/v1/query",
    userRequestHeader: Option[String] = None,
    http: HttpClient = Collector.defaultClient()) {

  private val mapper = new ObjectMapper()
  val doneStates: Set[String] = Set("FINISHED", "FAILED")

  // --username-request-header (collect.py:38-48): when set, send the
  // username in exactly that ONE header (warning on a non-standard name,
  // like the reference); otherwise both Trino and Presto headers.
  private val reqHeaders: Seq[(String, String)] = userRequestHeader match {
    case Some(h) =>
      if (h != "X-Trino-User" && h != "X-Presto-User")
        System.err.println(s"[collect] username request header '$h' is not " +
          "X-Trino-User or X-Presto-User, collecting JSONs might fail")
      Seq(h -> user)
    case None => Seq("X-Trino-User" -> user, "X-Presto-User" -> user)
  }

  /** Redirects are followed MANUALLY (the client is built with
    * Redirect.NEVER): java.net.http re-sends every user header —
    * Authorization included — to a cross-origin redirect target, while
    * python-requests (the reference's stack) strips auth when the host
    * changes (`Session.rebuild_auth`). So each hop re-decides: same
    * origin keeps auth + user headers, a foreign origin gets the bare
    * request (cookies still apply per the client's per-host cookie
    * store). Capped hops; an https→http downgrade is refused outright.
    */
  private val MaxRedirects = 5

  /** Scheme-default ports normalize before comparing (round 14): a
    * proxy that 302s `http://coord/...` to `http://coord:80/...` names
    * the SAME origin — without normalization the hop read as foreign
    * and silently shipped the request bare (no user header, no auth),
    * turning every fetch into an unexplained 401.
    */
  private[graft] def effectivePort(u: URI): Int =
    if (u.getPort != -1) u.getPort
    else if (u.getScheme == "https") 443
    else 80

  private[graft] def sameOrigin(a: URI, b: URI): Boolean =
    a.getScheme == b.getScheme && a.getHost == b.getHost &&
      effectivePort(a) == effectivePort(b)

  private def get(url: String): Option[String] = {
    val origin = URI.create(coordinator)
    var target = URI.create(url)
    var hops = 0
    while (hops <= MaxRedirects) {
      val b = HttpRequest.newBuilder(target)
      if (sameOrigin(origin, target)) {
        reqHeaders.foreach { case (k, v) => b.header(k, v) }
        // basic auth only when BOTH parts are present (collect.py:50-55's
        // `if all([username, password])`)
        basicAuth.filter { case (u, p) => u.nonEmpty && p.nonEmpty }.foreach { case (u, p) =>
          b.header("Authorization", "Basic " + Base64.getEncoder
            .encodeToString(s"$u:$p".getBytes(StandardCharsets.UTF_8)))
        }
      }
      val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
      val code = resp.statusCode()
      if (code / 100 == 3 && resp.headers().firstValue("Location").isPresent) {
        val loc = target.resolve(resp.headers().firstValue("Location").get())
        if (target.getScheme == "https" && loc.getScheme != "https") {
          System.err.println(s"[collect] GET $url -> https-to-http redirect to $loc refused")
          return None
        }
        target = loc
        hops += 1
      } else if (code / 100 == 2) {
        return Some(resp.body())
      } else {
        System.err.println(s"[collect] GET $url -> HTTP $code, skipping")
        return None
      }
    }
    System.err.println(s"[collect] GET $url -> more than $MaxRedirects redirects, skipping")
    None
  }

  /** ids of queries in a done state, from `GET {endpoint}` — sorted, the
    * reference's download order (`for query_id in sorted(ids)`,
    * collect.py:100). Transport/parse failures yield an EMPTY cycle, not
    * a crash (round 14): `get` only absorbs non-OK status codes — a
    * coordinator restart mid-poll surfaces as ConnectException from
    * http.send (or a malformed body as a Jackson parse error), and
    * before this guard one such transient killed the whole `--loop`
    * poller, contradicting the documented failures-logged-and-skipped
    * semantics. An interrupt still propagates as the flag so loop()
    * exits cleanly.
    */
  def listDone(): Seq[String] =
    try
      get(s"$coordinator$endpoint").toSeq.flatMap { body =>
        mapper.readTree(body).elements.asScala.collect {
          case q if Option(q.get("state")).exists(s => doneStates(s.asText)) =>
            q.get("queryId").asText
        }.toSeq
      }.sorted
    catch {
      case _: InterruptedException =>
        Thread.currentThread().interrupt(); Seq.empty
      case e: Exception =>
        System.err.println(s"[collect] list failed: ${e.getMessage} — empty cycle")
        Seq.empty
    }

  /** full QueryInfo JSON for one id (`{endpoint}/{id}?pretty` — the detail
    * URL shares the configured endpoint, collect.py:105).
    */
  def queryInfo(id: String): Option[String] =
    get(s"$coordinator$endpoint/$id?pretty")

  /** One poll cycle: fetch every done query not already on disk. Returns
    * the number of new files written.
    */
  def collectOnce(outDir: String, delayMs: Long = 100): Int = {
    Files.createDirectories(Paths.get(outDir))
    var written = 0
    listDone().foreach { id =>
      val out = Paths.get(outDir, s"$id.json.gz")
      if (!Files.exists(out)) { // incremental dedup sink (collect.py:100-103)
        try {
          queryInfo(id).foreach { json =>
            writeGzip(out, json)
            written += 1
          }
          Thread.sleep(delayMs)
        } catch {
          case _: InterruptedException =>
            // restore the flag so loop()'s isInterrupted check fires
            Thread.currentThread().interrupt()
            return written
          case e: Exception => // per-query failures don't stop the cycle
            System.err.println(s"[collect] $id failed: ${e.getMessage}")
        }
      }
    }
    written
  }

  /** `--loop` mode: poll until the thread is interrupted. The
    * inter-cycle sleep is where a restored interrupt flag actually
    * lands — Thread.sleep sees it, clears it, and throws — so the
    * graceful exit must catch InterruptedException here (round 14: the
    * while-condition check alone never fired; the documented
    * interrupt-to-stop crashed out of main with a stack trace instead).
    */
  def loop(outDir: String, delayMs: Long = 100, loopDelayMs: Long = 1000): Unit =
    try
      while (!Thread.currentThread().isInterrupted) {
        collectOnce(outDir, delayMs)
        Thread.sleep(loopDelayMs)
      }
    catch {
      case _: InterruptedException => Thread.currentThread().interrupt()
    }

  /** Gzip sink, written via a same-directory temp file + atomic rename
    * (round 14): the incremental-dedup contract treats an EXISTING file
    * as collected-forever, so a crash or disk-full mid-write must never
    * leave a truncated gzip at the final path — it would be skipped on
    * every later cycle and poison downstream extract. Falls back to a
    * plain move where the filesystem cannot do atomic renames.
    */
  private def writeGzip(path: Path, content: String): Unit = {
    val tmp = Files.createTempFile(path.getParent, path.getFileName.toString, ".tmp")
    try {
      val os = new GZIPOutputStream(new FileOutputStream(tmp.toFile))
      try os.write(content.getBytes(StandardCharsets.UTF_8))
      finally os.close()
      try Files.move(tmp, path, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          Files.move(tmp, path, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally Files.deleteIfExists(tmp)
  }
}

object Collector {
  /** Default HTTP client with the cookie semantics the reference
    * inherits from python-requests (round 12 parity): a session cookie
    * store carries Set-Cookie values across requests — a coordinator
    * behind an auth proxy that 302s through a cookie-setting login hop
    * works the same as under `requests`. Redirects are deliberately
    * NOT delegated to the client (Redirect.NEVER): [[Collector.get]]
    * follows them manually so that auth/user headers are re-decided
    * per hop instead of blindly re-sent cross-origin. A caller needing
    * different behavior injects its own client.
    */
  def defaultClient(): HttpClient =
    HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NEVER)
      .cookieHandler(new java.net.CookieManager(
        null, java.net.CookiePolicy.ACCEPT_ORIGINAL_SERVER))
      .build()
}
