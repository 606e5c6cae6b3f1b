package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.security.MessageDigest

/** Request-decoration hook for [[S3HttpConditionalPutClient]] — the
  * seam where a production deployment injects auth signing (SigV4,
  * an OAuth bearer header, a proxy token) without touching the
  * conditional-verb mapping. Implementations named via the
  * `graft.lease.s3.signer` system property must have a no-arg
  * constructor. The default is the identity (an unsigned endpoint —
  * the in-process stub the contract spec races, or a cluster-local
  * gateway that signs on the client's behalf). */
trait HttpRequestSigner {
  def sign(b: HttpRequest.Builder): HttpRequest.Builder
}

/** [[ConditionalPutClient]] over plain `java.net.http` against an
  * S3-shaped conditional-request endpoint — the SHIPPED production
  * template (zero cloud-SDK dependencies; auth is injected through
  * [[HttpRequestSigner]]):
  *
  *  - `putIfAbsent` → `PUT` with `If-None-Match: *` (S3 conditional
  *    writes, AWS 2024+; `412 Precondition Failed` when the key
  *    exists).
  *  - `putIfMatches` → `PUT` with `If-Match: "<etag>"`, the etag
  *    computed client-side as the md5 of the EXPECTED content —
  *    exactly S3's etag for an unmultipart PUT, so no read round-trip
  *    is needed to name the compare key.
  *  - `deleteIfMatches` → `DELETE` with `If-Match: "<etag>"`.
  *  - `get` → body + modification time from `x-graft-mtime-ms`
  *    (millisecond side-channel some stubs/gateways serve) or
  *    `Last-Modified` (RFC 1123 — S3's own resolution; seconds are
  *    ample for the lease's minutes-scale staleness windows).
  *
  * Precondition failures (412, and 404 where the precondition
  * implies existence) return `false` per the trait contract.
  * Throttle/transient answers (429, 500, 502, 503, 504 — S3's
  * `SlowDown` family) and connection-level IO errors retry in-place
  * with bounded full-jitter exponential backoff (see `send`); any
  * other non-2xx, or an exhausted retry budget, throws, which the
  * lease layer treats as transient contention. The full lease contract over this client against a
  * real conditional-HTTP endpoint is pinned by
  * `S3HttpLockBackendContractSpec` (the in-process stub store lives
  * in test sources — a deployment keeps THIS class and swaps only
  * `baseUri` + a signer). */
class S3HttpConditionalPutClient(
    baseUri: String,
    signer: HttpRequestSigner = S3HttpConditionalPutClient.Unsigned)
    extends ConditionalPutClient {
  // ONE process-wide client: java.net.http spawns a selector thread
  // per HttpClient, and `LockBackend.resolve` constructs a fresh
  // backend per maintenance operation — a client per instance would
  // leak a selector thread per micro-batch on a streamed ingest
  // (a per-call client already starved a 16-way contract race under
  // full-suite load, observed as a suite-only flake)
  private def http = S3HttpConditionalPutClient.sharedHttp

  // RFC 3986 path encoding ('/' preserved, space → %20 — form
  // encoding's '+' would store the object under a LITERAL '+' name
  // on real S3, invisible to any external tooling addressing the
  // logical key), which is also exactly SigV4's canonical-URI rule
  // for S3: the signer can sign the raw path verbatim
  private def uriFor(key: String) = URI.create(
    baseUri.stripSuffix("/") + "/" + SigV4.encodePath(key))

  private def md5Hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  // Throttle/transient retry — real S3 answers `503 SlowDown` (and
  // the occasional 500) under load and documents exponential backoff
  // as the required client response; a lease client without it fails
  // spuriously exactly when the store is busiest. Bounded full-jitter
  // backoff, re-SIGNING each attempt (fresh `x-amz-date`), honoring
  // `Retry-After` when the store names a wait. Retrying a conditional
  // verb whose first attempt died AFTER the server applied it is
  // ambiguous by nature; every such ambiguity here resolves fail-SAFE:
  // the retry sees its own write as a failed precondition and reports
  // `false`, so a lease is at worst orphaned into the stale-break path
  // (a bounded wedge), never granted to two holders. Config:
  // `graft.lease.s3.retries` (extra attempts, default 4),
  // `graft.lease.s3.retryBaseMs` (first backoff, default 100),
  // `graft.lease.s3.retryCapMs` (per-sleep cap, default 2000).
  private def intProp(name: String, dflt: Long): Long =
    sys.props.get(name).map(_.trim.toLong).getOrElse(dflt)
  protected def maxRetries: Int =
    intProp("graft.lease.s3.retries", 4L).toInt
  protected def retryBaseMs: Long =
    intProp("graft.lease.s3.retryBaseMs", 100L)
  protected def retryCapMs: Long =
    intProp("graft.lease.s3.retryCapMs", 2000L)

  /** Overridable for deterministic spec clocks. */
  protected def sleep(ms: Long): Unit = Thread.sleep(ms)

  /** Full-jitter backoff for `attempt` (0-based): uniform in
    * [expo/2, expo] where expo = min(cap, base·2^attempt); a
    * server-named `Retry-After` overrides the exponent (still
    * capped — a store asking for minutes must not stall a lease
    * poll loop that long). */
  protected def backoffMs(attempt: Int, retryAfterS: Option[Long]): Long = {
    // a misbehaving store is exactly what this layer exists for, so
    // the header it serves is sanitized too: non-positive or
    // overflow-large Retry-After values fall back to the schedule
    val expo = math.max(1L, retryAfterS match {
      case Some(s) if s > 0 =>
        math.min(retryCapMs, math.min(s, 86_400L) * 1000L)
      case _ =>
        math.min(retryCapMs, math.max(1L, retryBaseMs) << math.min(attempt, 20))
    })
    val lo = expo / 2
    lo + java.util.concurrent.ThreadLocalRandom.current()
      .nextLong(expo - lo + 1)
  }

  private val retryableStatus = Set(429, 500, 502, 503, 504)

  private def send(b: HttpRequest.Builder): HttpResponse[Array[Byte]] = {
    var attempt = 0
    while (true) {
      val outcome =
        try Right(http.send(signer.sign(b).build(),
          HttpResponse.BodyHandlers.ofByteArray()))
        catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right(r) if !retryableStatus(r.statusCode()) => return r
        case Right(r) if attempt >= maxRetries =>
          throw new java.io.IOException(
            s"object store answered HTTP ${r.statusCode()} after " +
              s"${attempt + 1} attempts")
        case Left(e) if attempt >= maxRetries => throw e
        case _ =>
          val retryAfterS = outcome.toOption.flatMap { r =>
            val h = r.headers().firstValue("Retry-After")
            if (h.isPresent) h.get.trim.toLongOption else None
          }
          sleep(backoffMs(attempt, retryAfterS))
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def condOutcome(status: Int): Boolean = status match {
    case s if s >= 200 && s < 300 => true
    case 412 | 404 => false // precondition failed / nothing to compare
    case s => throw new java.io.IOException(
      s"object store answered HTTP $s")
  }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    condOutcome(send(HttpRequest.newBuilder(uriFor(key))
      .header("If-None-Match", "*")
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes)))
      .statusCode())

  override def get(key: String): Option[(Array[Byte], Long)] = {
    val r = send(HttpRequest.newBuilder(uriFor(key)).GET())
    r.statusCode() match {
      case 200 =>
        // ms-precision header when the server offers one; RFC 1123
        // Last-Modified otherwise. A store serving NEITHER gives no
        // staleness evidence at all — report "now", so such a lease
        // never reads as stale: it fails toward a waiter timeout (a
        // loud wedge an operator resolves), never toward breaking a
        // LIVE lease that merely looks epoch-old (the 0L default
        // would make every lease instantly breakable there)
        val mt = r.headers().firstValue("x-graft-mtime-ms")
          .map(_.toLong)
          .or(() => r.headers().firstValue("Last-Modified")
            .map(v => java.util.Optional.of(java.time.ZonedDateTime
              .parse(v, java.time.format.DateTimeFormatter
                .RFC_1123_DATE_TIME).toInstant.toEpochMilli).get()))
          .orElse(System.currentTimeMillis())
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
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes)))
      .statusCode())

  override def deleteIfMatches(key: String,
      expect: Array[Byte]): Boolean =
    condOutcome(send(HttpRequest.newBuilder(uriFor(key))
      .header("If-Match", "\"" + md5Hex(expect) + "\"")
      .DELETE())
      .statusCode())
}

object S3HttpConditionalPutClient {
  /** The default signer: requests go out as built. */
  object Unsigned extends HttpRequestSigner {
    override def sign(b: HttpRequest.Builder): HttpRequest.Builder = b
  }

  private lazy val sharedHttp: HttpClient = HttpClient.newHttpClient()

  /** Endpoint + signer from process config — the path
    * [[S3HttpLockBackend]]'s no-arg constructor (the shape
    * `graft.lease.backend` requires) resolves through:
    *
    *  - endpoint: system property `graft.lease.s3.endpoint`, else
    *    env `GRAFT_LEASE_S3_ENDPOINT` (required — a lease with no
    *    store to talk to must fail at construction, loudly, not at
    *    the first acquire).
    *  - signer: system property `graft.lease.s3.signer` naming a
    *    no-arg [[HttpRequestSigner]] FQCN; absent = unsigned. */
  def fromSystemConfig(): S3HttpConditionalPutClient = {
    val endpoint = sys.props.get("graft.lease.s3.endpoint")
      .orElse(sys.env.get("GRAFT_LEASE_S3_ENDPOINT"))
      .getOrElse(throw new IllegalStateException(
        "S3HttpLockBackend needs an endpoint: set the " +
          "graft.lease.s3.endpoint system property (or the " +
          "GRAFT_LEASE_S3_ENDPOINT env var) to the bucket's base URI"))
    val signer = sys.props.get("graft.lease.s3.signer") match {
      case None => Unsigned
      case Some(cn) => Class.forName(cn).getDeclaredConstructor()
        .newInstance().asInstanceOf[HttpRequestSigner]
    }
    new S3HttpConditionalPutClient(endpoint, signer)
  }
}

/** The nameable form: `graft.lease.backend=graft.streaming.
  * S3HttpLockBackend` (plus the endpoint/signer properties above)
  * gives every standing store's lease the conditional-put semantics
  * over real HTTP — the no-arg-constructor shape
  * [[LockBackend.resolve]] instantiates. */
class S3HttpLockBackend
    extends ObjectStoreLockBackend(
      S3HttpConditionalPutClient.fromSystemConfig())
