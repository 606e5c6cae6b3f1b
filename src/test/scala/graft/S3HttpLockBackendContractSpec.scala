package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.streaming.{ConditionalPutClient, LockBackend,
  ObjectStoreLockBackend}

/** An in-process HTTP object store speaking the S3 conditional-request
  * subset the lease needs — the compile-checked proof that
  * [[ConditionalPutClient]]'s four verbs map onto REAL conditional
  * HTTP, not just prose:
  *
  *  - `PUT` with `If-None-Match: *` — create iff absent (S3
  *    conditional writes, AWS 2024+); `412 Precondition Failed` when
  *    the key exists.
  *  - `PUT` with `If-Match: "<etag>"` — replace iff the stored etag
  *    (the content md5 of an unmultipart PUT, exactly S3's etag
  *    semantics) matches; `412` on mismatch, `404` when absent.
  *  - `DELETE` with `If-Match: "<etag>"` — compare-and-delete; same
  *    statuses.
  *  - `GET` — body + `ETag` + `Last-Modified` (RFC 1123, as S3 serves
  *    it) + `x-graft-mtime-ms`. The extra millisecond header exists
  *    ONLY because the contract spec's heartbeat test observes
  *    sub-second mtime movement; real S3 rounds `Last-Modified` to
  *    seconds, which is irrelevant at the lease's 30-minute staleness
  *    window, so a production binding can parse plain
  *    `Last-Modified`.
  *
  * Every mutation runs inside one `ConcurrentHashMap.compute` on the
  * key — the per-key arbitration S3/GCS conditional requests provide
  * server-side — so 16 racing acquirers genuinely contend here the
  * way they would against the real store. */
object S3HttpStubStore {
  private val objects = new java.util.concurrent
    .ConcurrentHashMap[String, (Array[Byte], String, Long)]()

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  private val rfc1123 = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME
    .withZone(java.time.ZoneId.of("GMT"))

  lazy val server: com.sun.net.httpserver.HttpServer = {
    val s = com.sun.net.httpserver.HttpServer
      .create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val key = java.net.URLDecoder.decode(
        ex.getRequestURI.getRawPath.stripPrefix("/"), "UTF-8")
      def header(n: String): Option[String] =
        Option(ex.getRequestHeaders.getFirst(n))
      def etagOf(h: String): String = h.stripPrefix("\"").stripSuffix("\"")
      def respond(status: Int, body: Array[Byte],
          stored: Option[(Array[Byte], String, Long)]): Unit = {
        stored.foreach { case (_, etag, mt) =>
          ex.getResponseHeaders.set("ETag", "\"" + etag + "\"")
          ex.getResponseHeaders.set("Last-Modified",
            rfc1123.format(java.time.Instant.ofEpochMilli(mt)))
          ex.getResponseHeaders.set("x-graft-mtime-ms", mt.toString)
        }
        if (body.isEmpty) ex.sendResponseHeaders(status, -1)
        else {
          ex.sendResponseHeaders(status, body.length.toLong)
          ex.getResponseBody.write(body)
        }
        ex.close()
      }
      try ex.getRequestMethod match {
        case "GET" =>
          Option(objects.get(key)) match {
            case Some(v @ (b, _, _)) => respond(200, b, Some(v))
            case None => respond(404, Array.emptyByteArray, None)
          }
        case "PUT" =>
          val body = ex.getRequestBody.readAllBytes()
          var status = 500
          objects.compute(key, (_, cur) =>
            (header("If-None-Match"), header("If-Match")) match {
              case (Some("*"), _) =>
                if (cur != null) { status = 412; cur }
                else {
                  status = 200
                  (body, md5Hex(body), System.currentTimeMillis())
                }
              case (_, Some(tag)) =>
                if (cur == null) { status = 404; cur }
                else if (cur._2 != etagOf(tag)) { status = 412; cur }
                else {
                  status = 200
                  (body, md5Hex(body), System.currentTimeMillis())
                }
              case _ => // unconditional PUT (unused by the lease)
                status = 200
                (body, md5Hex(body), System.currentTimeMillis())
            })
          respond(status, Array.emptyByteArray, None)
        case "DELETE" =>
          var status = 500
          objects.compute(key, (_, cur) =>
            header("If-Match") match {
              case Some(tag) =>
                if (cur == null) { status = 404; cur }
                else if (cur._2 != etagOf(tag)) { status = 412; cur }
                else { status = 204; null }
              case None =>
                status = 204; null // unconditional (unused)
            })
          respond(status, Array.emptyByteArray, None)
        case _ => respond(405, Array.emptyByteArray, None)
      } catch {
        case scala.util.control.NonFatal(_) =>
          respond(500, Array.emptyByteArray, None)
      }
    })
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    s.start()
    s
  }

  lazy val baseUri: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"
}

/** [[ConditionalPutClient]] over plain `java.net.http` against an
  * S3-shaped conditional-request endpoint — the production-template
  * binding (swap `baseUri` for a bucket endpoint plus auth signing
  * and the verb mapping is unchanged). Precondition failures (412,
  * and 404 where the precondition implies existence) return `false`
  * per the trait contract; any other non-2xx throws, which the lease
  * layer treats as transient contention. */
class S3HttpConditionalPutClient(baseUri: String)
    extends ConditionalPutClient {
  private val http = HttpClient.newHttpClient()

  private def uriFor(key: String) = URI.create(
    baseUri + "/" + java.net.URLEncoder.encode(key, "UTF-8"))

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  private def send(r: HttpRequest): HttpResponse[Array[Byte]] =
    http.send(r, HttpResponse.BodyHandlers.ofByteArray())

  private def condOutcome(status: Int): Boolean = status match {
    case s if s >= 200 && s < 300 => true
    case 412 | 404 => false // precondition failed / nothing to compare
    case s => throw new java.io.IOException(
      s"object store answered HTTP $s")
  }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    condOutcome(send(HttpRequest.newBuilder(uriFor(key))
      .header("If-None-Match", "*")
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()).statusCode())

  override def get(key: String): Option[(Array[Byte], Long)] = {
    val r = send(HttpRequest.newBuilder(uriFor(key)).GET().build())
    r.statusCode() match {
      case 200 =>
        // ms-precision header when the server offers one (the stub
        // does, for the contract's sub-second timing); RFC 1123
        // Last-Modified otherwise — S3's own resolution, ample for
        // the lease's minutes-scale staleness windows
        val mt = r.headers().firstValue("x-graft-mtime-ms")
          .map(_.toLong)
          .or(() => r.headers().firstValue("Last-Modified")
            .map(v => java.util.Optional.of(java.time.ZonedDateTime
              .parse(v, java.time.format.DateTimeFormatter
                .RFC_1123_DATE_TIME).toInstant.toEpochMilli).get()))
          .orElse(0L)
        Some((r.body(), mt))
      case 404 => None
      case s => throw new java.io.IOException(
        s"object store answered HTTP $s")
    }
  }

  override def putIfMatches(key: String, expect: Array[Byte],
      bytes: Array[Byte]): Boolean =
    condOutcome(send(HttpRequest.newBuilder(uriFor(key))
      .header("If-Match", "\"" + md5Hex(expect) + "\"")
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()).statusCode())

  override def deleteIfMatches(key: String,
      expect: Array[Byte]): Boolean =
    condOutcome(send(HttpRequest.newBuilder(uriFor(key))
      .header("If-Match", "\"" + md5Hex(expect) + "\"")
      .DELETE()
      .build()).statusCode())
}

/** The object-store lock logic over REAL conditional HTTP passes the
  * same at-most-one-grant contract as both shipped backends — the
  * four-verb mapping is load-bearing, not illustrative. */
class S3HttpLockBackendContractSpec extends LockBackendContractSpec {
  // ONE client for the whole spec: `backend` is called per operation
  // by the contract tests, and a fresh HttpClient per call spawns a
  // selector thread each — under full-suite load that thread/fd
  // pressure starved the churn test past its deadline (observed as a
  // suite-only flake; a real holder reuses one client too)
  private lazy val be: LockBackend =
    new ObjectStoreLockBackend(
      new S3HttpConditionalPutClient(S3HttpStubStore.baseUri))
  def backend: LockBackend = be

  def freshLock(): (FileSystem, HPath) = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-s3lockcontract").toString
    val p = new HPath(s"$tmp/.store.lock")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("the S3-shaped client is conditional at the HTTP layer: a " +
      "second If-None-Match:* PUT answers 412, and If-Match with a " +
      "stale etag can neither overwrite nor delete a lease whose " +
      "content has moved") {
    val client = new S3HttpConditionalPutClient(S3HttpStubStore.baseUri)
    val key = s"contract-direct-${java.util.UUID.randomUUID()}"
    val v1 = "token-a\n0".getBytes(StandardCharsets.UTF_8)
    val v2 = "token-a\n1".getBytes(StandardCharsets.UTF_8)
    assert(client.putIfAbsent(key, v1), "first conditional create lost")
    assert(!client.putIfAbsent(key, v2),
      "second If-None-Match:* PUT must answer 412")
    assert(client.putIfMatches(key, v1, v2), "etag-fenced replace lost")
    assert(!client.putIfMatches(key, v1, v1),
      "a PUT conditioned on the SUPERSEDED content succeeded")
    assert(!client.deleteIfMatches(key, v1),
      "a DELETE conditioned on the superseded content succeeded")
    assert(client.get(key).map(_._1.toSeq) === Some(v2.toSeq),
      "the store does not bear the fenced replacement")
    assert(client.deleteIfMatches(key, v2), "etag-fenced delete lost")
    assert(client.get(key).isEmpty)
  }
}
