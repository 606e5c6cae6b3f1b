package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Sampling}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "aa", 100L), (2L, "aa", 90L), (3L, "aa", 80L), (4L, "aa", 80L),
    (5L, "bb", 50L), (6L, "bb", 60L)
  ).toDF("id", "key", "len")

  test("capPerKey keeps at most n per key, highest-ordered first") {
    val kept = Curation.capPerKey(docs, Seq("key"),
      Seq(col("len").desc, col("id").asc), 2)
    assert(rows(kept.select("id").orderBy("id")).flatten == Seq(1L, 2L, 5L, 6L))
  }

  test("capPerKey tie-break is deterministic (id asc within equal len)") {
    val kept = Curation.capPerKey(docs, Seq("key"),
      Seq(col("len").desc, col("id").asc), 3)
    // len 80 tie between id 3 and 4 -> id 3 wins the third slot
    assert(rows(kept.filter($"key" === "aa").select("id").orderBy("id"))
      .flatten == Seq(1L, 2L, 3L))
  }

  test("stratifiedSample: 256 keeps all, 0 keeps none, subset in between") {
    val d = (1L to 200L).toDF("id")
    assert(Curation.stratifiedSample(d, $"id", lit(256)).count() == 200)
    assert(Curation.stratifiedSample(d, $"id", lit(0)).count() == 0)
    val half = Curation.stratifiedSample(d, $"id", lit(128))
    val n = half.count()
    assert(n > 0 && n < 200)
    // stable: same rows regardless of partitioning
    val re = Curation.stratifiedSample(d.repartition(7), $"id", lit(128))
    assert(rows(half.orderBy("id")) == rows(re.orderBy("id")))
  }

  test("quantileFilter keeps rows at or above the per-group cutoff") {
    val kept = Curation.quantileFilter(docs, "key", "len", 0.5)
    val aa = kept.filter($"key" === "aa")
    // p50 of (100,90,80,80) = 85 -> keeps 100 and 90
    assert(rows(aa.select("id").orderBy("id")).flatten == Seq(1L, 2L))
    assert(rows(aa.select("cutoff").distinct()).flatten == Seq(85.0))
    // approx variant keeps a superset-or-equal at this tiny scale
    val approx = Curation.quantileFilter(docs, "key", "len", 0.5, exact = false)
    assert(approx.filter($"key" === "aa").count() >= 2)
  }

  test("normalizeText folds case, strips punctuation, collapses whitespace") {
    val out = strDf("t", Seq(Some("  Hello,   WORLD!! (x=1)  "), Some(""),
        Some("###"), None))
      .select(Curation.normalizeText($"t").as("n"))
    assert(rows(out).flatten == Seq("hello world x 1", "", "", null))
  }

  test("normalizeText is idempotent") {
    val once = Curation.normalizeText($"t")
    val twice = Curation.normalizeText(Curation.normalizeText($"t"))
    val d = strDf("t", Seq(Some("A--b  C!"), Some("x"), Some("  ")))
    assert(rows(d.select(once)) == rows(d.select(twice)))
  }

  test("chunkTokens boundaries: empty, exact window, one-past") {
    def chunks(text: String) = rows(
      Curation.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", chunkSize = 4, stride = 3)
        .select("chunk_idx", "chunk_tokens").orderBy("chunk_idx"))
    assert(chunks("") == Seq())
    assert(chunks("a b c d") == Seq(Seq(0L, 4L), Seq(1L, 1L))) // start 3 < 4
    assert(chunks("a b c") == Seq(Seq(0L, 3L)))
    assert(chunks("a b c d e") == Seq(Seq(0L, 4L), Seq(1L, 2L)))
  }

  test("chunkTokens consecutive full chunks overlap by chunkSize - stride") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = Curation.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", chunkSize = 4, stride = 3)
    // starts 0,3,6,9 -> sizes 4,4,4,1
    assert(rows(out.select("chunk_tokens").orderBy("chunk_idx")).flatten ==
      Seq(4L, 4L, 4L, 1L))
  }

  test("pmiBigrams: collocated pair scores above independent pair") {
    // "new york" always adjacent; "a"/"b" co-occur only incidentally
    val corpus = Seq.fill(6)("new york a b") ++ Seq.fill(6)("b a new york")
    val out = Curation.pmiBigrams(corpus.toDF("text"), "text", minCount = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("new york") > out("a b"))
    // every adjacent occurrence counted: 12 of "new york"
    val counts = Curation.pmiBigrams(corpus.toDF("text"), "text", minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("new york") == 12L)
  }

  test("packSequences cuts the ordered stream every seqLen tokens") {
    val chunks = Seq((0L, 0L, 0L, 60L), (0L, 1L, 1L, 60L), (0L, 2L, 2L, 60L),
      (0L, 3L, 3L, 60L), (1L, 10L, 0L, 100L), (1L, 11L, 0L, 50L))
      .toDF("shard", "doc", "idx", "tok")
    val out = Curation.packSequences(chunks, Seq("shard"),
      Seq(col("doc"), col("idx")), "tok", seqLen = 128)
    // shard 0: cum-before 0,60,120,180 -> packs 0,0,0,1
    assert(rows(out.filter($"shard" === 0).select("pack_id").orderBy("doc"))
      .flatten == Seq(0L, 0L, 0L, 1L))
    // shard 1 packs independently: cum-before 0,100 -> packs 0,0
    assert(rows(out.filter($"shard" === 1).select("pack_id").orderBy("doc"))
      .flatten == Seq(0L, 0L))
    // nothing dropped or duplicated
    assert(out.count() == 6)
  }

  test("fixedSample returns exactly n rows, stable across partitioning") {
    val d = (1L to 500L).toDF("id")
    val s1 = Curation.fixedSample(d, $"id", 40)
    assert(s1.count() == 40)
    val s2 = Curation.fixedSample(d.repartition(13), $"id", 40)
    assert(rows(s1.orderBy("id")) == rows(s2.orderBy("id")))
    assert(!s1.columns.contains("__sort_key"))
  }

  test("rebalanceMix downsamples heavy keys toward the target weights") {
    // key "big" has 300 rows, "small" 100; equal weights -> big should be
    // cut to ~200 (the uniform target), small kept fully (never upsampled)
    val d = ((1L to 300L).map(i => (i, "big")) ++
      (301L to 400L).map(i => (i, "small"))).toDF("id", "key")
    val out = Curation.rebalanceMix(d, "key", $"id", _ => lit(1.0))
    val byKey = out.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey("small") == 100)       // threshold 256 -> all kept
    assert(byKey("big") < 300 && byKey("big") > 100) // ~2/3 of 256 bucket
    // deterministic
    val again = Curation.rebalanceMix(d.repartition(5), "key", $"id", _ => lit(1.0))
    assert(rows(out.orderBy("id")) == rows(again.orderBy("id")))
  }

  test("shard is deterministic, in range, and consistent with splitBucket") {
    val d = (1L to 100L).toDF("id")
    val out = d.select($"id", Curation.shard($"id", 8).as("s"),
      (Sampling.splitBucket($"id") % 8).as("ref"))
    assert(out.filter($"s" < 0 || $"s" >= 8).count() == 0)
    assert(out.filter($"s" =!= $"ref").count() == 0)
    // all 8 shards populated at n=100
    assert(out.select("s").distinct().count() == 8)
  }

  test("blocklistFilter drops suffix matches including subdomains") {
    val d = Seq(
      (1L, "a.bad.example"),     // subdomain of a blocked suffix
      (2L, "bad.example"),       // exact blocked domain
      (3L, "notbad.example"),    // ends with "bad.example" -> suffix-blocked
      (4L, "good.example")
    ).toDF("id", "domain")
    val bl = Seq("bad.example").toDF("suffix")
    val kept = Curation.blocklistFilter(d, $"domain", bl, "suffix")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(4L))
  }

  test("prioritySample: exact n, weight-monotone inclusion, " +
      "deterministic, non-positive weights excluded") {
    val df = (0 until 500).map(i => (i.toLong, if (i < 250) 1.0 else 10.0))
      .toDF("id", "w")
    val s1 = Curation.prioritySample(df, $"id", $"w", 100)
    assert(s1.count() === 100)
    // 10x-weighted rows should dominate the sample (E ~ 90+)
    val heavy = s1.filter($"id" >= 250).count()
    assert(heavy > 60, s"heavy-weight rows underrepresented: $heavy")
    val ids1 = s1.select("id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.prioritySample(df.repartition(7), $"id", $"w", 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // weight <= 0 rows can never be drawn, even when n exceeds the rest
    val mixed = df.withColumn("w",
      when($"id" < 250, lit(-1.0)).otherwise($"w"))
    val s3 = Curation.prioritySample(mixed, $"id", $"w", 300)
    assert(s3.count() === 250)
    assert(s3.filter($"id" < 250).count() === 0)
  }

  test("upsampleMix: integer weights give exact epochs, fractional " +
      "weights land between floor and ceil, zero drops, deterministic") {
    val df = (0 until 400).map(i => (i.toLong, s"doc$i")).toDF("id", "txt")
    // weight 2.0: exactly two copies of every row, reps 1 and 2
    val two = Curation.upsampleMix(df, $"id", lit(2.0))
    assert(two.count() === 800L)
    assert(two.groupBy("id").count().filter($"count" =!= 2).count() === 0L)
    assert(two.agg(max("rep")).head().getInt(0) === 2)
    // weight 1.5: every row once, ~half twice (md5 coin, E = 1.5)
    val mid = Curation.upsampleMix(df, $"id", lit(1.5))
    val n = mid.count()
    assert(n >= 400L && n <= 800L, s"got $n")
    assert(math.abs(n - 600L) < 80, s"coin far off fair: $n")
    assert(mid.groupBy("id").count().filter($"count" < 1).count() === 0L)
    // weight 0.5: subsample, no row twice
    val half = Curation.upsampleMix(df, $"id", lit(0.5))
    assert(half.groupBy("id").count().filter($"count" > 1).count() === 0L)
    val nh = half.count()
    assert(math.abs(nh - 200L) < 60, s"got $nh")
    // weight <= 0 drops everything
    assert(Curation.upsampleMix(df, $"id", lit(0.0)).count() === 0L)
    // partition-stable: identical (id, rep) multiset under a re-layout
    val a = mid.select("id", "rep").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = Curation.upsampleMix(df.repartition(13), $"id", lit(1.5))
      .select("id", "rep").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a === b)
  }

  test("tokenBudgetAllocation: budget spent exactly, saturated sources " +
      "capped at capacity, unsaturated allocations proportional to " +
      "weight; non-binding budget saturates everything") {
    import spark.implicits._
    // capacities 30/200/500, weights 0.5/0.3/0.2 of a 400 budget:
    // A's fair share 200 > 30 -> capped; its unspent share re-flows
    val docs = (Seq.fill(3)(("a", 10.0)) ++ Seq.fill(4)(("b", 50.0)) ++
      Seq.fill(5)(("c", 100.0))).toDF("source", "tok")
    val w = Seq(("a", 5.0), ("b", 3.0), ("c", 2.0)).toDF("source", "weight")
    val r = Curation.tokenBudgetAllocation(docs, $"source", $"tok", w, 400.0)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(3), x.getBoolean(5))).toMap
    assert(r("a") === ((30.0, 30.0, true)))    // capped at capacity
    // first water level (400 − 30) / (0.3 + 0.2) = 740 asks b for
    // 740 · 0.3 = 222 > 200 — b saturates too; c takes the rest
    assert(r("b") === ((200.0, 200.0, true)))
    assert(r("c") === ((500.0, 170.0, false))) // (400 − 230) / 0.2 · 0.2
    assert(r.values.map(_._2).sum === 400.0)       // budget spent exactly
    // non-binding budget: everyone saturates, take_rate 1 everywhere
    val all = Curation.tokenBudgetAllocation(docs, $"source", $"tok", w,
        budget = 1e6)
      .collect().map(x => (x.getDouble(3), x.getDouble(4), x.getBoolean(5)))
    assert(all.forall { case (alloc, rate, sat) => sat && rate === 1.0 })
    assert(all.map(_._1).sum === 730.0)            // = total capacity
    // duplicate weight rows collapse (summed) instead of fanning the
    // capacity row out and charging phantom capacity
    val wdup = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0))
      .toDF("source", "weight")
    val docsAb = (Seq.fill(3)(("a", 10.0)) ++ Seq.fill(4)(("b", 50.0)))
      .toDF("source", "tok")
    val dup = Curation.tokenBudgetAllocation(docsAb, $"source", $"tok",
        wdup, 100.0)
      .collect().map(x => x.getString(0) -> (x.getDouble(3))).toMap
    assert(dup.size === 2)                 // one row per source
    assert(dup("a") === 30.0 && dup("b") === 70.0) // budget spent once
    // extreme weight skew: the saturated mass sums to ~1 in doubles,
    // but the unsaturated source must take λ·w, not its capacity
    val wskew = Seq(("a", 1e13), ("b", 1.0)).toDF("source", "weight")
    val skewDocs = (Seq.fill(1)(("a", 50.0)) ++ Seq.fill(1)(("b", 1000.0)))
      .toDF("source", "tok")
    val skew = Curation.tokenBudgetAllocation(skewDocs, $"source", $"tok",
        wskew, 100.0)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(3), x.getBoolean(5))).toMap
    assert(skew("a") === ((50.0, true)))
    assert(skew("b")._2 === false)
    assert(math.abs(skew.values.map(_._1).sum - 100.0) < 1e-3,
      s"budget overspent under weight skew: $skew")
  }

  test("budgetedSample: saturated sources keep every document; kept " +
      "fraction of the rate-limited source tracks its take_rate; " +
      "deterministic across partitioning") {
    import spark.implicits._
    val docs = ((0 until 30).map(i => (i.toLong, "a", 10.0)) ++
      (100 until 500).map(i => (i.toLong, "b", 50.0)))
      .toDF("doc_id", "source", "tok")
    val w = Seq(("a", 5.0), ("b", 5.0)).toDF("source", "weight")
    // a saturates (cap 300 < its 5000 fair share of 10000? budget
    // 10300 vs total 20300: a's share 5150 > 300 -> saturated)
    val alloc = Curation.tokenBudgetAllocation(docs, $"source", $"tok",
      w, budget = 10300.0)
    val kept = Curation.budgetedSample(docs, $"source", $"doc_id", alloc)
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("a") === 30L) // saturated: take_rate 1, all kept
    // b's rate = 10000/20000 = 0.5 -> md5 coin keeps ~half (binomial
    // tolerance), exact count pinned by determinism below
    assert(bySrc("b") > 120L && bySrc("b") < 280L)
    val again = Curation.budgetedSample(docs.repartition(13), $"source",
        $"doc_id", alloc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === kept.select("doc_id").collect()
      .map(_.getLong(0)).toSet)
  }
}
