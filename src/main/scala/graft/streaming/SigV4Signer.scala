package graft.streaming

import java.net.URI
import java.net.http.HttpRequest
import java.nio.charset.StandardCharsets.UTF_8

/** Pure-JVM AWS Signature Version 4 — the published algorithm
  * (HMAC-SHA256 over a canonical request; see AWS's "Signature
  * Version 4 signing process" doc, whose `iam.amazonaws.com`
  * worked example pins this implementation in SigV4Spec), with
  * ZERO SDK dependencies. Each derivation step is exposed on its
  * own so the spec can assert the published intermediate values
  * (signing key, canonical request, final signature), not just an
  * end-to-end opaque header.
  *
  * Scope notes for the lease client this serves:
  *  - Payload is declared `UNSIGNED-PAYLOAD` (S3 accepts it over
  *    HTTPS; it is what keeps [[HttpRequestSigner]]'s builder-only
  *    seam sufficient — `java.net.http` cannot re-read a
  *    `BodyPublisher`).
  *  - The canonical URI is the request's raw path VERBATIM —
  *    S3's rule (no normalization, no double-encoding), which is
  *    exactly right because [[S3HttpConditionalPutClient]] already
  *    sends RFC 3986 path encoding via [[SigV4.encodePath]].
  */
object SigV4 {
  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  def sha256Hex(s: String): String = hex(sha256(s.getBytes(UTF_8)))

  def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val m = javax.crypto.Mac.getInstance("HmacSHA256")
    m.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    m.doFinal(data.getBytes(UTF_8))
  }

  /** SHA-256 of the empty string — the payload hash of every
    * body-less request when a caller signs payloads for real. */
  val EmptyPayloadHash: String =
    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"

  /** RFC 3986 / AWS-canonical URI encoding: unreserved bytes
    * (`A-Z a-z 0-9 - . _ ~`) pass through, `/` is preserved as the
    * segment separator when `preserveSlash`, every other byte of the
    * UTF-8 encoding becomes uppercase `%XX` — the encoding S3
    * expects on the wire AND in the canonical request (space is
    * `%20`, never `+`; form encoding's `+` would silently store a
    * key under a different name than the logical one). */
  def uriEncode(s: String, preserveSlash: Boolean): String = {
    val sb = new StringBuilder
    s.getBytes(UTF_8).foreach { byte =>
      val c = (byte & 0xff).toChar
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' ||
        c == '~'
      if (unreserved || (preserveSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${byte & 0xff}%02X")
    }
    sb.toString
  }

  /** Object-key → URL path encoding for the S3-shaped client. */
  def encodePath(key: String): String = uriEncode(key, preserveSlash = true)

  /** The canonical query string: each name/value URI-encoded
    * (slash NOT preserved inside values), sorted by encoded name
    * then encoded value, joined `name=value&…`. Empty for the
    * lease's own requests; implemented in full so the signer is a
    * general S3 client component, pinned by the published vector's
    * `Action=ListUsers&Version=2010-05-08` query. */
  def canonicalQuery(rawQuery: String): String =
    if (rawQuery == null || rawQuery.isEmpty) ""
    else rawQuery.split("&").filter(_.nonEmpty).map { p =>
      val i = p.indexOf('=')
      val (n, v) = if (i < 0) (p, "") else (p.take(i), p.drop(i + 1))
      // the raw query is already on-the-wire encoded; decode first so
      // canonical re-encoding is not double encoding
      (uriEncode(java.net.URLDecoder.decode(n, "UTF-8"), false),
        uriEncode(java.net.URLDecoder.decode(v, "UTF-8"), false))
    }.sorted.map { case (n, v) => s"$n=$v" }.mkString("&")

  /** Task 1 — the canonical request. `headers` are (name, value)
    * pairs; names lowercase here, values trimmed with internal runs
    * of spaces collapsed (the published canonicalization). */
  def canonicalRequest(method: String, canonicalUri: String,
      canonicalQueryString: String, headers: Seq[(String, String)],
      payloadHash: String): String = {
    val hs = headers
      .map { case (k, v) =>
        (k.toLowerCase, v.trim.replaceAll("[ ]+", " ")) }
      .sortBy(_._1)
    val signedHeaders = hs.map(_._1).mkString(";")
    method + "\n" +
      (if (canonicalUri.isEmpty) "/" else canonicalUri) + "\n" +
      canonicalQueryString + "\n" +
      hs.map { case (k, v) => s"$k:$v\n" }.mkString + "\n" +
      signedHeaders + "\n" + payloadHash
  }

  /** Task 2 — the string to sign. `scope` is
    * `yyyyMMdd/region/service/aws4_request`. */
  def stringToSign(amzDate: String, scope: String,
      canonical: String): String =
    "AWS4-HMAC-SHA256\n" + amzDate + "\n" + scope + "\n" +
      sha256Hex(canonical)

  /** Task 3 — the derived signing key (date-scoped, never the raw
    * secret on any wire-adjacent computation). */
  def signingKey(secret: String, date: String, region: String,
      service: String): Array[Byte] =
    hmac(hmac(hmac(hmac(("AWS4" + secret).getBytes(UTF_8), date),
      region), service), "aws4_request")

  /** Tasks 1–4 end to end → (signedHeaders, signature-hex). */
  def signature(secret: String, amzDate: String, region: String,
      service: String, method: String, canonicalUri: String,
      canonicalQueryString: String, headers: Seq[(String, String)],
      payloadHash: String): (String, String) = {
    val date = amzDate.take(8)
    val scope = s"$date/$region/$service/aws4_request"
    val cr = canonicalRequest(method, canonicalUri,
      canonicalQueryString, headers, payloadHash)
    val sts = stringToSign(amzDate, scope, cr)
    val sig = hex(hmac(signingKey(secret, date, region, service), sts))
    (headers.map(_._1.toLowerCase).sorted.mkString(";"), sig)
  }

  /** The `Authorization` header value. */
  def authorization(accessKeyId: String, amzDate: String,
      region: String, service: String, signedHeaders: String,
      sig: String): String =
    s"AWS4-HMAC-SHA256 Credential=$accessKeyId/${amzDate.take(8)}/" +
      s"$region/$service/aws4_request, SignedHeaders=$signedHeaders, " +
      s"Signature=$sig"

  /** The host header `java.net.http` will put on the wire for this
    * URI (it forbids setting `Host` explicitly, so the signer must
    * PREDICT it): authority without a default port. The stub-store
    * verification recomputes from the RECEIVED Host header, so a
    * wrong prediction fails the live-wire spec rather than hiding. */
  def hostFor(uri: URI): String = {
    val default = uri.getScheme match {
      case "https" => 443
      case _ => 80
    }
    if (uri.getPort == -1 || uri.getPort == default) uri.getHost
    else s"${uri.getHost}:${uri.getPort}"
  }
}

/** [[HttpRequestSigner]] speaking AWS SigV4 — the in-tree FQCN a
  * production S3 deployment names in `graft.lease.s3.signer` (the
  * last line it previously had to write itself). Configuration, in
  * precedence order (fail-fast at construction when credentials are
  * absent — a signer with nothing to sign with must not surface as
  * 403s at the first acquire):
  *
  *  - access key: `graft.lease.s3.accessKey` system property, else
  *    `AWS_ACCESS_KEY_ID`.
  *  - secret key: `graft.lease.s3.secretKey`, else
  *    `AWS_SECRET_ACCESS_KEY`.
  *  - session token (optional, STS): `graft.lease.s3.sessionToken`,
  *    else `AWS_SESSION_TOKEN` — sent AND signed as
  *    `x-amz-security-token`.
  *  - region: `graft.lease.s3.region`, else `AWS_REGION`, else
  *    `AWS_DEFAULT_REGION`, else `us-east-1`.
  *  - service: `graft.lease.s3.service`, default `s3`.
  *
  * Signs `host`, `x-amz-date`, `x-amz-content-sha256`
  * (`UNSIGNED-PAYLOAD` — see [[SigV4]]) and, when present, the
  * session token; conditional-verb headers (`If-Match`,
  * `If-None-Match`) ride unsigned, as S3 permits for standard HTTP
  * headers. One-liner deployment:
  * `-Dgraft.lease.backend=graft.streaming.S3HttpLockBackend
  *  -Dgraft.lease.s3.endpoint=https://bucket.s3.region.amazonaws.com
  *  -Dgraft.lease.s3.signer=graft.streaming.SigV4Signer` with the
  * usual `AWS_*` env.
  *
  * Credentials are re-resolved on EVERY sign (see the field notes):
  * an STS refresher that rotates the `graft.lease.s3.*` properties
  * mid-job takes effect on the next request, so a long-lived lease
  * client survives token expiry instead of 403-ing forever. */
class SigV4Signer extends HttpRequestSigner {
  private def conf(prop: String, env: String): Option[String] =
    sys.props.get(prop).orElse(sys.env.get(env)).filter(_.nonEmpty)

  // Credentials are re-RESOLVED on every sign, not cached at
  // construction: STS session tokens expire (1-12 h TTL), and a
  // streamed ingest's lease client outlives them — a refresher that
  // rotates the `graft.lease.s3.*` system properties mid-job takes
  // effect on the next signed request, instead of every lease verb
  // 403-ing forever with nothing naming the expired token. (Env vars
  // are process-immutable on the JVM, so rotation happens through
  // the properties; the env remains the static-credential path.)
  // Resolution is ATOMIC over the triple: a sign uses the current
  // access+secret+token together when both keys are present —
  // rotation can never pair a new secret with a stale token — and
  // falls back to the construction-time snapshot when the live
  // config has been cleared rather than rotated, so a scope that
  // configured, constructed, and moved on keeps working.
  // Construction still fail-fasts when NO credentials are configured
  // — a signer with nothing to sign with must not surface as 403s at
  // the first acquire.
  private case class Creds(access: String, secret: String,
      token: Option[String])

  private val creds0 = Creds(
    conf("graft.lease.s3.accessKey", "AWS_ACCESS_KEY_ID")
      .getOrElse(throw new IllegalStateException(
        "SigV4Signer needs credentials: set the " +
          "graft.lease.s3.accessKey system property (or the " +
          "AWS_ACCESS_KEY_ID env var)")),
    conf("graft.lease.s3.secretKey", "AWS_SECRET_ACCESS_KEY")
      .getOrElse(throw new IllegalStateException(
        "SigV4Signer needs credentials: set the " +
          "graft.lease.s3.secretKey system property (or the " +
          "AWS_SECRET_ACCESS_KEY env var)")),
    conf("graft.lease.s3.sessionToken", "AWS_SESSION_TOKEN"))

  private def currentCreds: Creds =
    (conf("graft.lease.s3.accessKey", "AWS_ACCESS_KEY_ID"),
      conf("graft.lease.s3.secretKey", "AWS_SECRET_ACCESS_KEY")) match {
      case (Some(a), Some(s)) =>
        Creds(a, s, conf("graft.lease.s3.sessionToken",
          "AWS_SESSION_TOKEN"))
      case _ => creds0
    }
  private val region = conf("graft.lease.s3.region", "AWS_REGION")
    .orElse(sys.env.get("AWS_DEFAULT_REGION").filter(_.nonEmpty))
    .getOrElse("us-east-1")
  private val service =
    sys.props.get("graft.lease.s3.service").getOrElse("s3")

  /** Overridable for deterministic spec clocks. */
  protected def now(): java.time.Instant = java.time.Instant.now()

  private val amzFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyyMMdd'T'HHmmss'Z'")
    .withZone(java.time.ZoneOffset.UTC)

  override def sign(b: HttpRequest.Builder): HttpRequest.Builder = {
    // builders carry no getters: probe a throwaway build for the
    // method/URI the canonical request needs (body is never read —
    // UNSIGNED-PAYLOAD exists exactly so it need not be)
    val probe = b.copy().build()
    val uri = probe.uri()
    val amzDate = amzFmt.format(now())
    val payloadHash = "UNSIGNED-PAYLOAD"
    // ONE atomic resolution per sign: a rotation landing mid-call
    // must not split the signed triple from the sent one
    val c = currentCreds
    val headers = Seq(
      "host" -> SigV4.hostFor(uri),
      "x-amz-content-sha256" -> payloadHash,
      "x-amz-date" -> amzDate) ++
      c.token.map("x-amz-security-token" -> _)
    val rawPath = Option(uri.getRawPath).filter(_.nonEmpty)
      .getOrElse("/")
    val (signedHeaders, sig) = SigV4.signature(c.secret, amzDate,
      region, service, probe.method(), rawPath,
      SigV4.canonicalQuery(uri.getRawQuery), headers, payloadHash)
    val signed = b
      .setHeader("x-amz-date", amzDate)
      .setHeader("x-amz-content-sha256", payloadHash)
      .setHeader("Authorization", SigV4.authorization(c.access,
        amzDate, region, service, signedHeaders, sig))
    c.token.fold(signed)(t =>
      signed.setHeader("x-amz-security-token", t))
  }
}
