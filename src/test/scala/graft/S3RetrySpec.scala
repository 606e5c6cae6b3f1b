package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.S3HttpConditionalPutClient

/** Throttle-retry contract of the shipped S3 client: real S3 answers
  * `503 SlowDown` (and occasional 500s) under load and documents
  * exponential backoff as the REQUIRED client response — a lease
  * client without it fails spuriously exactly when the store is
  * busiest. The stub's `flaky/<n>/…` prefix 503s the first n
  * requests per key, so these cases drive the retry loop over real
  * HTTP; the sleep hook is overridden to record rather than wait, so
  * the backoff SCHEDULE is asserted deterministically. */
class S3RetrySpec extends AnyFunSuite {

  private class RecordingClient(extraRetries: Int = 4)
      extends S3HttpConditionalPutClient(S3HttpStubStore.baseUri) {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    override protected def maxRetries: Int = extraRetries
    override protected def sleep(ms: Long): Unit = sleeps += ms
  }

  private class BackoffProbe
      extends S3HttpConditionalPutClient(S3HttpStubStore.baseUri) {
    def backoff(a: Int, ra: Option[Long]): Long = backoffMs(a, ra)
  }

  test("putIfAbsent rides out three 503s and lands: one sleep per " +
      "retry, each inside the full-jitter envelope [expo/2, expo] " +
      "with expo = min(cap, base<<attempt)") {
    val c = new RecordingClient()
    val key = s"flaky/3/${java.util.UUID.randomUUID()}"
    assert(c.putIfAbsent(key,
      "token-r\n0".getBytes(StandardCharsets.UTF_8)),
      "the create must succeed once the throttle lifts")
    assert(c.sleeps.size === 3, s"3 throttled attempts → 3 backoffs, " +
      s"got ${c.sleeps}")
    c.sleeps.zipWithIndex.foreach { case (s, i) =>
      val expo = math.min(2000L, 100L << i)
      assert(s >= expo / 2 && s <= expo,
        s"backoff $i = $s ms outside [${expo / 2}, $expo]")
    }
    assert(c.get(key).isDefined, "the retried PUT genuinely landed")
  }

  test("an exhausted retry budget throws an IOException naming the " +
      "status and attempt count — the lease layer's transient signal") {
    val c = new RecordingClient(extraRetries = 2)
    val key = s"flaky/99/${java.util.UUID.randomUUID()}"
    val e = intercept[java.io.IOException] { c.get(key) }
    assert(e.getMessage.contains("503"), s"got: ${e.getMessage}")
    assert(e.getMessage.contains("3 attempts"), s"got: ${e.getMessage}")
    assert(c.sleeps.size === 2,
      "2 extra attempts → exactly 2 backoffs before giving up")
  }

  test("a server-named Retry-After overrides the exponent (still " +
      "capped and jittered): the first backoff jumps straight to the " +
      "named wait's envelope instead of the base's") {
    val c = new RecordingClient()
    val k = s"flakyra/1/${java.util.UUID.randomUUID()}"
    assert(c.get(k).isEmpty,
      "after the throttle lifts the key is absent but the store healthy")
    assert(c.sleeps.size === 1)
    assert(c.sleeps.head >= 1000L && c.sleeps.head <= 2000L,
      s"Retry-After: 2 → envelope [1000, 2000], got ${c.sleeps.head} " +
        "(the base schedule's first sleep is ≤ 100 ms, so this " +
        "distinguishes the named wait from the default)")
  }

  test("a 403 is NOT retried — auth failure is deterministic, and " +
      "hammering a store that already said no is how clients get " +
      "banned") {
    val c = new RecordingClient()
    val key = s"signed/${java.util.UUID.randomUUID()}"
    val e = intercept[java.io.IOException] {
      c.putIfAbsent(key, "x".getBytes(StandardCharsets.UTF_8))
    }
    assert(e.getMessage.contains("403"))
    assert(c.sleeps.isEmpty, "no backoff on a non-retryable status")
  }

  test("backoffMs sanitizes a misbehaving store's Retry-After: " +
      "non-positive values fall back to the schedule and " +
      "overflow-large ones clamp to the cap — the retry layer exists " +
      "for misbehaving stores, so the header they serve must not be " +
      "able to crash the loop with an unexpected exception type") {
    val c = new BackoffProbe
    val neg = c.backoff(0, Some(-1L))
    assert(neg >= 50L && neg <= 100L,
      s"negative Retry-After must use the base schedule, got $neg")
    val huge = c.backoff(0, Some(Long.MaxValue / 100L))
    assert(huge >= 1000L && huge <= 2000L,
      s"overflow-large Retry-After must clamp to the cap, got $huge")
    val zero = c.backoff(0, Some(0L))
    assert(zero >= 50L && zero <= 100L)
  }

  test("a 412 precondition failure is NOT retried — it is the " +
      "contract's `false`, not a transient") {
    val c = new RecordingClient()
    val key = s"retry-pre/${java.util.UUID.randomUUID()}"
    assert(c.putIfAbsent(key, "a".getBytes(StandardCharsets.UTF_8)))
    assert(!c.putIfAbsent(key, "b".getBytes(StandardCharsets.UTF_8)))
    assert(c.sleeps.isEmpty, "the losing create answers false with " +
      "zero retries — contention is the caller's branch, not an error")
  }
}
