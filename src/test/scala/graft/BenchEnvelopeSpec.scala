package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's quiet-envelope ledger logic: parse tolerance,
  * the 1.5×-over flag with its sub-half-second floor, and the
  * tighten-only merge that refreshes the committed file. */
class BenchEnvelopeSpec extends AnyFunSuite {

  test("parse reads the flat ledger shape and an absent/corrupt file " +
      "degrades to no flags") {
    val m = BenchEnvelope.parse(
      "{\n  \"q01_pricing\": 1.25,\n  \"q02_topk\": 0.8,\n" +
        "  \"q100_nll\": 2e-1\n}\n")
    assert(m === Map("q01_pricing" -> 1.25, "q02_topk" -> 0.8,
      "q100_nll" -> 0.2))
    assert(BenchEnvelope.parse("") === Map.empty)
    assert(BenchEnvelope.parse("not json at all") === Map.empty)
  }

  test("over flags exactly the >1.5x AND >0.3s-over non-trivial " +
      "queries, sorted; unknown queries, sub-half-second ones, and " +
      "ratio-only misses on a lucky seed never flag") {
    val ledger = Map("qa" -> 1.0, "qb" -> 1.0, "qc" -> 0.2,
      "qd" -> 2.0, "qf" -> 0.4)
    val results = Seq(
      ("qb", 1.6), // 1.6x, +0.6 s -> flagged
      ("qa", 1.4), // within envelope
      ("qc", 0.4), // 2x its envelope but under the 0.5 s floor
      ("qd", 2.9), // 1.45x -> within
      ("qe", 9.9), // no ledger entry -> cannot flag
      ("qf", 0.65)) // 1.63x but only +0.25 s -> jitter, not flagged
    assert(BenchEnvelope.over(results, ledger) === Seq("qb"))
    assert(BenchEnvelope.over(results, Map.empty) === Seq.empty)
  }

  test("the COMMITTED ledger parses and covers the query surface — " +
      "a truncated or corrupt bench_envelope.json would silently " +
      "disable the over_envelope instrument") {
    val f = new java.io.File("bench_envelope.json")
    assert(f.exists(), "committed ledger missing from the repo root")
    val m = BenchEnvelope.parse(new String(
      java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
    assert(m.size >= 200,
      s"ledger covers only ${m.size} queries — expected the full suite")
    assert((m -- BenchEnvelope.MetaKeys).values
      .forall(v => v > 0 && v < 600),
      "ledger carries a non-positive or absurd query entry")
    assert(m.keys.forall(k => k.startsWith("q") ||
      BenchEnvelope.MetaKeys.contains(k)),
      "ledger carries a non-query, non-stamp key")
    assert(m.get("_sf").contains(0.1),
      "committed ledger must be stamped with its scale factor")
    assert(m.contains("_host_cpus") && m.contains("_host_mem_gb"),
      "committed ledger must be stamped with its host fingerprint — " +
        "an unstamped ledger silently rewrites itself on a faster " +
        "host and cries wolf on a slower one")
  }

  test("hostStamp + hostMatches: same host (exact cpus/mem, membw " +
      "bucket within the ±1 contention tolerance) matches; a " +
      "different machine shape or a >2x membw class does not; an " +
      "UNSTAMPED ledger is trusted for back-compat") {
    val here = BenchEnvelope.hostStamp(32, 125L, 0.28)
    assert(here("_host_cpus") === 32.0 && here("_host_mem_gb") === 125.0)
    assert(here("_host_membw_bucket") === -2.0) // floor(log2 0.28)
    // same host, probe drifted under contention (0.28 -> 0.9 s): one
    // bucket over, still within tolerance — a degraded run must not
    // misread as a foreign machine
    assert(BenchEnvelope.hostMatches(here,
      BenchEnvelope.hostStamp(32, 125L, 0.9)))
    // different core count or memory = foreign, however close the probe
    assert(!BenchEnvelope.hostMatches(here,
      BenchEnvelope.hostStamp(64, 125L, 0.28)))
    assert(!BenchEnvelope.hostMatches(here,
      BenchEnvelope.hostStamp(32, 256L, 0.28)))
    // same shape but a 8x membw class (0.28 -> 2.4 s, bucket -2 -> 1):
    // a genuinely different machine speed reads foreign
    assert(!BenchEnvelope.hostMatches(here,
      BenchEnvelope.hostStamp(32, 125L, 2.4)))
    // a probe that could not run (-1) omits the bucket and the bucket
    // is then not compared; an unstamped prior ledger always matches
    assert(!BenchEnvelope.hostStamp(32, 125L, -1.0)
      .contains("_host_membw_bucket"))
    assert(BenchEnvelope.hostMatches(here,
      BenchEnvelope.hostStamp(32, 125L, -1.0)))
    assert(BenchEnvelope.hostMatches(Map("qa" -> 1.0), here))
    // an unreadable memory size (the platform bean is not
    // com.sun.management → 0) is OMITTED, not stamped 0 — a 0 stamp
    // would read the same physical host as permanently foreign under
    // a different JVM flavor, silently blocking every tighten-merge
    val noMem = BenchEnvelope.hostStamp(32, 0L, 0.28)
    assert(!noMem.contains("_host_mem_gb"))
    assert(BenchEnvelope.hostMatches(here, noMem))
    assert(BenchEnvelope.hostMatches(noMem, here))
  }

  test("merged only ever tightens, admits new queries at first " +
      "reading, and drops errored (non-positive) times; render is " +
      "sorted and re-parses to the same ledger") {
    val ledger = Map("qa" -> 1.0, "qb" -> 2.0)
    val m = BenchEnvelope.merged(ledger,
      Seq(("qa", 1.5), ("qb", 1.2), ("qn", 0.7), ("qerr", -1.0)))
    assert(m === Map("qa" -> 1.0, "qb" -> 1.2, "qn" -> 0.7))
    val rendered = BenchEnvelope.render(m)
    assert(rendered.linesIterator.toSeq.count(_.contains(":")) === 3)
    assert(BenchEnvelope.parse(rendered) === m)
  }
}
