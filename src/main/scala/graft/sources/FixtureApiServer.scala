package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process JSON:API fixture server — localhost-only (binds
  * 127.0.0.1:ephemeral, zero egress) plumbing that lets a
  * driver-visible query exercise the HTTP paths of
  * [[JsonApiSource]] — OAuth2 token fetch, paginated GET, and
  * crucially the OPAQUE-cursor `links.next` chain
  * (`JsonApiChainPartition`'s sequential walk, the fallback when
  * cursor URLs aren't numerically extrapolable — reference behavior:
  * the page loop at outreach_etl.py:124-131 only ever follows
  * `links.next`, so the opaque chain IS the reference's native mode).
  *
  * Pages are the CHECKED-IN fixture files (the same bytes the DuckDB
  * oracle reads), served in filename order with `links.next`
  * rewritten to an opaque token (`cursor=eyJw…`, base64-ish — nothing
  * a number parser can extrapolate) on every page but the last. Data
  * and meta ride through byte-identical fields, so a sync through
  * this server must equal the pagesDir scan of the same fixtures.
  */
class FixtureApiServer(resource: String, pagesDir: String,
                       flaky: Boolean = false) {
  private val mapper = new ObjectMapper()
  // flaky mode: every distinct URL 500s exactly ONCE before serving —
  // the transient-failure weather a real API shows; a reader without
  // bounded retry loses pages, one with it must produce the identical
  // sync result (reference behavior: the bare retry loop at
  // outreach_etl.py:152-155, minus its double-append bug)
  private val failedOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val pageFiles = {
    val fs = new java.io.File(pagesDir).listFiles()
    require(fs != null && fs.nonEmpty, s"no fixture pages in $pagesDir")
    fs.filter(_.getName.endsWith(".json")).sortBy(_.getName)
  }
  private val server =
    HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)

  def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  /** Opaque, deliberately non-numeric cursor for 1-based page `i`. */
  private def cursor(i: Int): String =
    java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString(s"""{"p":"x$i"}""".getBytes("UTF-8"))

  private def pageBody(i: Int): String = {
    val root = mapper.readTree(pageFiles(i - 1)).asInstanceOf[ObjectNode]
    val links = root.withObject("/links")
    if (i < pageFiles.length)
      links.put("next", s"$base/api/$resource?cursor=${cursor(i + 1)}")
    else links.remove("next")
    mapper.writeValueAsString(root)
  }

  private def send(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  server.createContext("/oauth/token", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val form = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      if (ex.getRequestMethod != "POST" ||
          !form.contains("grant_type=refresh_token"))
        send(ex, 400, """{"error":"bad request"}""")
      else
        send(ex, 200, """{"access_token":"tok","expires_in":7200}""")
    }
  })
  server.createContext(s"/api/$resource", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      if (flaky && failedOnce.add(ex.getRequestURI.toString))
        { send(ex, 500, """{"error":"transient"}"""); return }
      if (Option(ex.getRequestHeaders.getFirst("Authorization"))
          .forall(!_.startsWith("Bearer ")))
        { send(ex, 401, """{"error":"unauthorized"}"""); return }
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      val page = "cursor=([A-Za-z0-9_-]+)".r.findFirstMatchIn(q)
        .map(m => new String(java.util.Base64.getUrlDecoder
          .decode(m.group(1)), "UTF-8"))
        .map(s => "\"x(\\d+)\"".r.findFirstMatchIn(s).get.group(1).toInt)
        .getOrElse(1)
      send(ex, 200, pageBody(page))
    }
  })
  server.start()

  def stop(): Unit = server.stop(0)

  /** Distinct URLs that have taken their one flaky 500 — lets a
    * driven query REQUIRE the retry path actually engaged rather
    * than silently passing against a healthy server.
    */
  def flakyFailures: Int = failedOnce.size

  /** The DSv2 option set a sync needs to read through this server
    * (mock OAuth credentials — fixture-only, validated loosely).
    */
  def sourceOptions: Map[String, String] = Map(
    "url" -> s"$base/api/$resource",
    "tokenUrl" -> s"$base/oauth/token",
    "clientId" -> "cid", "clientSecret" -> "sec",
    "refreshToken" -> "ref")
}
