package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SigV4

/** Algorithm CONFORMANCE for the pure-JVM SigV4 implementation,
  * pinned to the worked example AWS publishes in its "Signature
  * Version 4 signing process" documentation (the `iam.amazonaws.com`
  * `ListUsers` request, secret `wJalrXUtnFEMI/...EXAMPLEKEY`, date
  * `20150830T123600Z`) — THREE independent anchors along the
  * derivation (canonical-request hash, signing key, final
  * signature), so a defect localizes to the task that broke rather
  * than surfacing only as an opaque end-to-end mismatch. The
  * wire-binding half (does the signer predict what `java.net.http`
  * actually sends?) lives in S3HttpLockBackendContractSpec's
  * verifying `sigv4/` prefix. */
class SigV4Spec extends AnyFunSuite {
  private val secret = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
  private val amzDate = "20150830T123600Z"
  private val headers = Seq(
    "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
    "host" -> "iam.amazonaws.com",
    "x-amz-date" -> amzDate)

  private def canonical = SigV4.canonicalRequest("GET", "/",
    SigV4.canonicalQuery("Action=ListUsers&Version=2010-05-08"),
    headers, SigV4.EmptyPayloadHash)

  test("task 1: the canonical request hashes to AWS's published " +
      "value (query sorted, headers lowercased/sorted/trimmed)") {
    assert(SigV4.sha256Hex(canonical) ===
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("task 3: the derived signing key matches AWS's published hex") {
    assert(SigV4.hex(SigV4.signingKey(secret, "20150830",
      "us-east-1", "iam")) ===
      "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9")
  }

  test("tasks 1-4 end to end: the final signature and Authorization " +
      "header match AWS's published example") {
    val (signedHeaders, sig) = SigV4.signature(secret, amzDate,
      "us-east-1", "iam", "GET", "/",
      SigV4.canonicalQuery("Action=ListUsers&Version=2010-05-08"),
      headers, SigV4.EmptyPayloadHash)
    assert(signedHeaders === "content-type;host;x-amz-date")
    assert(sig ===
      "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    assert(SigV4.authorization("AKIDEXAMPLE", amzDate, "us-east-1",
      "iam", signedHeaders, sig) ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/" +
        "iam/aws4_request, SignedHeaders=content-type;host;x-amz-date, " +
        s"Signature=$sig")
  }

  test("uriEncode follows the AWS canonical rules: unreserved bytes " +
      "pass, space is %20 (never '+'), '+' is %2B, '/' survives only " +
      "in path mode, UTF-8 multibyte percent-encodes uppercase") {
    assert(SigV4.encodePath("a b+c/d~e") === "a%20b%2Bc/d~e")
    assert(SigV4.uriEncode("a b+c/d~e", preserveSlash = false) ===
      "a%20b%2Bc%2Fd~e")
    assert(SigV4.uriEncode("ä", preserveSlash = false) === "%C3%A4")
    assert(SigV4.uriEncode("AZaz09-._~", preserveSlash = false) ===
      "AZaz09-._~")
  }

  test("canonicalQuery sorts by encoded name then value, handles " +
      "valueless params, and re-encodes without double encoding") {
    assert(SigV4.canonicalQuery("b=2&a=1") === "a=1&b=2")
    assert(SigV4.canonicalQuery("flag&a=x%20y") === "a=x%20y&flag=")
    assert(SigV4.canonicalQuery(null) === "")
    assert(SigV4.canonicalQuery("") === "")
  }

  test("hostFor predicts java.net.http's Host header: explicit " +
      "non-default ports appear, default and absent ports do not") {
    import java.net.URI
    assert(SigV4.hostFor(URI.create("http://127.0.0.1:8123/k")) ===
      "127.0.0.1:8123")
    assert(SigV4.hostFor(URI.create("https://b.s3.amazonaws.com/k")) ===
      "b.s3.amazonaws.com")
    assert(SigV4.hostFor(URI.create("https://b.example.com:443/k")) ===
      "b.example.com")
    assert(SigV4.hostFor(URI.create("http://h.example.com:80/k")) ===
      "h.example.com")
  }
}
