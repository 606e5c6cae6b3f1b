package graft

import org.apache.spark.sql.functions._
import graft.ops._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
    (4L, "completely different words about spark engines and parquet files"),
    (5L, "dog lazy the over jumps fox brown quick the")  // reordered 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps smallest id") {
    val r = Dedup.exact(docs, "text", "doc_id")
      .filter(col("n_copies") > 1).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("keep_id") === 1L)
    assert(r.head.getAs[Long]("n_copies") === 2L)
  }

  test("minhash factoring gate: both paths emit the identical pair set") {
    def pairs(factor: Boolean) =
      Dedup.minhashCandidatePairs(docs, "text", "doc_id",
          numHashes = 8, bands = 4, shingleSize = 3,
          factorExactGroups = Some(factor))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val factored = pairs(true)
    val direct = pairs(false)
    assert(factored === direct)
    assert(factored.contains((1L, 2L))) // the exact-dup pair survives both
  }

  test("resolveClusters: pairsDistinct skip-dedup path = default path " +
      "on oriented distinct pairs") {
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3,
      factorExactGroups = Some(false))
    def clusters(skip: Boolean) =
      Dedup.resolveClusters(pairs, pairsDistinct = skip)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSkip = clusters(true)
    val viaDedup = clusters(false)
    assert(viaSkip === viaDedup)
    assert(viaSkip.nonEmpty)
  }

  test("hashBandPairs: pigeonhole recall — every pair within " +
      "maxHamming < bands is found, including prefix-bit flips") {
    // h2 differs from h1 only in the TOP bit — a single-prefix
    // blocking (simhashPairs-style) would bucket them apart; the
    // banded blocking must still pair them. h3 differs in 7 scattered
    // bits (one per band boundary region, < bands = 8 -> guaranteed);
    // h4 is far from everything (33 bits).
    val h1 = 0x0F0F0F0F0F0F0F0FL
    val h2 = h1 ^ (1L << 63)
    val h3 = h1 ^ 0x0101010101010100L // 7 bits, each in its own band
    val h4 = h1 ^ 0x1FF07FE03FF80F01L
    val df = Seq((1L, h1), (2L, h2), (3L, h3), (4L, h4))
      .toDF("id", "h")
    val got = Dedup.hashBandPairs(df, "h", "id", bits = 64, bands = 8,
        maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 1L), (1L, 3L, 7L)),
      s"banded pairs diverged: $got")
    // degenerate guard: maxHamming must stay below bands
    intercept[IllegalArgumentException] {
      Dedup.hashBandPairs(df, "h", "id", bits = 64, bands = 8,
        maxHamming = 8)
    }
  }

  test("fingerprint dedup also catches word-order shuffles") {
    val r = Dedup.byFingerprint(docs, "text", "doc_id")
      .filter(col("n_copies") > 1).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_copies") === 3L) // 1, 2, 5
  }

  test("minhash LSH surfaces the near-dup pair without all-pairs compare") {
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // exact dups always collide
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc out
  }

  test("ngram jaccard: exact dup = 1.0, near dup high, unrelated low") {
    // no-blocking is an explicit opt-in (lit(1)) — fine for 5 docs,
    // an O(n^2) cross-join at corpus scale
    val j = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
      minJaccard = 0.0, blockingKey = _ => lit(1))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((1L, 3L)) > 0.5)
    assert(j((1L, 4L)) === 0.0)
  }

  test("prefixFilterJaccardPairs == brute-force exact pairs (recall 1.0)") {
    for (t <- Seq(0.3, 0.5, 0.9)) {
      val brute = Dedup.ngramJaccardPairs(docs, "text", "doc_id", n = 3,
          minJaccard = t, blockingKey = _ => lit(1))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pf = Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
          n = 3, minJaccard = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pf === brute, s"prefix-filter diverged from brute force at t=$t")
    }
  }

  test("prefixFilterJaccardPairs: exactness holds on a mixed-overlap corpus") {
    // 40 docs over a tiny vocabulary: dense overlap structure, many
    // borderline pairs — the regime where a wrong prefix bound or size
    // filter actually loses pairs
    import org.scalacheck.{Gen, rng}
    val vocab = Gen.listOfN(10,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
    val corpus = (0 until 40).map { i =>
      (i.toLong, vocab.apply(Gen.Parameters.default, rng.Seed(7L + i))
        .get.mkString(" "))
    }.toDF("doc_id", "text")
    val brute = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", n = 2,
        minJaccard = 0.25, blockingKey = _ => lit(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pf = Dedup.prefixFilterJaccardPairs(corpus, "text", "doc_id",
        n = 2, minJaccard = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pf === brute)
    assert(brute.nonEmpty, "fixture produced no qualifying pairs — weaken it")
  }

  test("prefixFilterContainmentPairs == brute force; catches the quote " +
      "Jaccard dilutes") {
    // doc 6 is wholly contained in doc 7's long text: containment(6->7)
    // = 1.0 while the Jaccard is far below any dedup threshold
    val quoted = docs.union(Seq(
      (6L, "alpha beta gamma delta"),
      (7L, "alpha beta gamma delta " +
        (1 to 30).map(i => s"filler$i word$i").mkString(" "))
    ).toDF("doc_id", "text"))
    for (t <- Seq(0.4, 0.8, 1.0)) {
      val pf = Dedup.prefixFilterContainmentPairs(quoted, "text",
          "doc_id", n = 3, minContainment = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      // brute force over the ordered cross product
      val sets = quoted.select(col("doc_id"),
          array_distinct(graft.ops.Text.shingles(col("text"), 3)).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val brute = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
        c = sa.intersect(sb).size.toDouble / sa.size if c >= t
      } yield (a, b, math.rint(c * 1e6) / 1e6)).toSet
      assert(pf === brute, s"containment diverged at t=$t")
      if (t <= 1.0) assert(pf.exists(p => p._1 == 6L && p._2 == 7L),
        s"quoted doc not caught at t=$t")
    }
    // the Jaccard join at the same threshold does NOT see the quote
    val j = Dedup.prefixFilterJaccardPairs(quoted, "text", "doc_id",
        n = 3, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!j.contains((6L, 7L)))
  }

  test("prefix-filter joins: randomized parity across seeds and " +
      "thresholds (property)") {
    // three independently-seeded corpora with different overlap
    // regimes; the exactness claim must hold on all of them, for both
    // the symmetric and the asymmetric join
    import org.scalacheck.{Gen, rng}
    for (seed <- Seq(101L, 202L, 303L)) {
      val vocabSize = 4 + (seed % 5).toInt
      val words = (0 until vocabSize).map(i => s"w$i")
      val gen = Gen.choose(3, 14).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(words)))
      val corpus = (0 until 30).map { i =>
        (i.toLong, gen.apply(Gen.Parameters.default, rng.Seed(seed + i))
          .get.mkString(" "))
      }.toDF("doc_id", "text")
      val t = 0.2 + (seed % 3) * 0.15
      val bruteJ = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
          n = 2, minJaccard = t, blockingKey = _ => lit(1))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val pfJ = Dedup.prefixFilterJaccardPairs(corpus, "text", "doc_id",
          n = 2, minJaccard = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(pfJ === bruteJ, s"jaccard diverged: seed=$seed t=$t")
      val sets = corpus.select(col("doc_id"),
          array_distinct(graft.ops.Text.shingles(col("text"), 2)).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val bruteC = (for {
        (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
        c = sa.intersect(sb).size.toDouble / sa.size if c >= t
      } yield (a, b, math.rint(c * 1e6) / 1e6)).toSet
      val pfC = Dedup.prefixFilterContainmentPairs(corpus, "text",
          "doc_id", n = 2, minContainment = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(pfC === bruteC, s"containment diverged: seed=$seed t=$t")
    }
  }

  test("prefixFilterJaccardPairs edges: t=1 finds only exact-set dups; " +
      "t=0 rejected") {
    val r = Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r.toSet === Set((1L, 2L, 1.0)))
    intercept[IllegalArgumentException] {
      Dedup.prefixFilterJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 0.0)
    }
  }

  test("admitAgainstJaccardIndex: exact-threshold admission vs store " +
      "and in-batch; result independent of the frozen order choice") {
    val store = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words about spark engines and parquet"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (11L, "the quick brown fox jumps over the lazy dog"),  // exact store dup
      (13L, "the quick brown fox jumps over the lazy cat"),  // near store dup
      (15L, "entirely novel sentence with its own vocabulary set here"),
      (17L, "entirely novel sentence with its own vocabulary set there"),
      // 17 is 15's in-batch near-dup; 19 is unrelated
      (19L, "rivers carve canyons slowly through layered sandstone walls"))
      .toDF("doc_id", "text")
    val all = store.unionByName(batch)
    def admitted(dfTable: org.apache.spark.sql.DataFrame): Set[Long] = {
      val (arrays, prefix) = Dedup.jaccardIndexTables(store, "text",
        "doc_id", n = 3, minJaccard = 0.5, dfTable)
      Dedup.admitAgainstJaccardIndex(batch, "text", "doc_id", arrays,
          prefix, n = 3, minJaccard = 0.5, dfTable)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val frozen = Dedup.shingleDfTable(all, "text", 3)
    val got = admitted(frozen)
    // brute-force expectation from exact Jaccard alone
    val sets = all.select(col("doc_id"),
        array_distinct(graft.ops.Text.shingles(col("text"), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    def jac(a: Long, b: Long) = {
      val (x, y) = (sets(a), sets(b))
      x.intersect(y).size.toDouble / x.union(y).size
    }
    val batchIds = Seq(11L, 13L, 15L, 17L, 19L)
    val want = batchIds.filter { b =>
      !Seq(0L, 2L).exists(s => jac(b, s) >= 0.5) &&
        !batchIds.filter(_ < b).exists(p => jac(b, p) >= 0.5)
    }.toSet
    assert(got === want)
    assert(got === Set(15L, 19L), s"fixture expectation drifted: $got")
    // EXACTNESS is order-independent: an empty frozen table (all df 0,
    // digest tie-break = pure hash order) admits the identical set —
    // the order only shapes candidate counts, never the result
    import spark.implicits._
    val hashOrder = Seq.empty[(String, Long)].toDF("h", "df")
    assert(admitted(hashOrder) === want)
  }

  test("prefix length and size filter are FP-safe at representability " +
      "boundaries (100*0.55 = 55.000000000000007 must not shorten the " +
      "prefix or prune the boundary pair)") {
    // sweep every (size, hundredth-threshold) pair against exact
    // BigDecimal arithmetic: the 1e-9 nudge must make the DataFrame
    // expression EQUAL the exact value everywhere in range
    val thresholds = Seq(0.4, 0.5, 0.55, 0.6, 0.7, 0.75, 0.8, 0.9)
    val szs = spark.range(1, 201).toDF("sz")
    for (t <- thresholds) {
      val got = szs.select(col("sz"),
          Dedup.prefixLenExpr(col("sz"), t).as("pl"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      for (sz <- 1 to 200) {
        val exact = sz - (BigDecimal(sz) * BigDecimal(t))
          .setScale(0, BigDecimal.RoundingMode.CEILING).toInt + 1
        assert(got(sz.toLong) === exact, s"sz=$sz t=$t")
      }
    }
    // the boundary pair the naive filter pruned: |a|=55, |b|=100,
    // t=0.55 — 100*0.55 <= 55 is FALSE in doubles, yet J can be 0.55
    val pair = Seq((55, 100), (54, 100)).toDF("sa", "sb")
      .select(col("sa"), col("sb"),
        Dedup.sizeCompatible(col("sa"), col("sb"), 0.55).as("ok"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getBoolean(2))
      .toMap
    assert(pair((55, 100)), "genuine J=0.55 boundary pair pruned")
    assert(!pair((54, 100)), "size filter lost its bite")
  }

  test("keepCanonical drops exactly the larger-id side of each pair") {
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3)
    val dropped = pairs.collect().map(_.getLong(1)).toSet
    val kept = Dedup.keepCanonical(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 2L, 3L, 4L, 5L) -- dropped)
    assert(kept.contains(1L)) // smallest id always survives
    assert(!kept.contains(2L)) // exact dup of 1 always dropped
  }

  test("simhash pairs: exact dups at hamming 0; near dups close") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id",
      bits = 32, prefixBits = 2, maxHamming = 12)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0L))
  }

  test("boundedBucketPairs invariant: any cap yields the uncapped pair set") {
    // random-ish corpus from a 5-word vocabulary: buckets of mixed sizes,
    // so small caps route SOME buckets through the join path and others
    // through the array path in the same run
    import org.scalacheck.{Gen, rng}
    val vocab = Gen.listOfN(8, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    val docs = (0 until 40).map { i =>
      (i.toLong, vocab.apply(Gen.Parameters.default, rng.Seed(42L + i))
        .get.mkString(" "))
    }.toDF("doc_id", "text")
    def run(cap: Int) = Dedup.simhashPairs(docs, "text", "doc_id",
      bits = 32, prefixBits = 2, maxHamming = 32, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val uncapped = run(100000)
    assert(uncapped.nonEmpty)
    for (cap <- Seq(2, 3, 7))
      assert(run(cap) === uncapped, s"cap=$cap diverged")
  }

  test("degenerate all-duplicates corpus: capped expansion = uncapped pair set") {
    // 60 identical docs land in ONE bucket. With maxBucket=8 the bucket
    // takes the join path (no whole-bucket array row); the pair set must
    // be exactly C(60,2) and identical to the array-path result.
    val dup = spark.range(60).selectExpr("id AS doc_id",
      "'same boilerplate text repeated everywhere' AS text")
    def run(cap: Int) = Dedup.simhashPairs(dup, "text", "doc_id",
      bits = 32, prefixBits = 2, maxHamming = 32, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = run(8)
    assert(capped.size === 60 * 59 / 2)
    assert(capped === run(100000))

    val mh = Dedup.minhashCandidatePairs(dup, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.size === 60 * 59 / 2)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)), // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Array(1.0f, 0.0f, 0.0f, 0.0f))  // identical to 0
  ).toDF("vec_id", "embedding")

  test("cosine: identical = 1, orthogonal = 0, opposite = -1") {
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(1.0, 0.0), Array(-1.0, 0.0))).toDF("a", "b")
    val r = rows(df.select(round(Similarity.cosine(col("a"), col("b")), 9))).flatten
    assert(r === Seq(1.0, 0.0, -1.0))
  }

  test("bruteForceTopK ranks by similarity with id tiebreak") {
    val q = array(Seq(1.0, 0.0, 0.0, 0.0).map(lit): _*)
    val top = Similarity.bruteForceTopK(vecs, "embedding", "vec_id", q, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(top === Seq(0L, 4L, 1L)) // ids 0,4 tie at cos=1, id asc
  }

  test("crossTopK excludes self and returns k per query") {
    val qs = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    val r = Similarity.crossTopK(vecs, qs, "embedding", "vec_id", "qid", 2)
      .collect()
    assert(r.length === 2)
    assert(!r.exists(_.getAs[Long]("vec_id") == 0L))
    assert(r.map(_.getAs[Long]("vec_id")).toSet === Set(4L, 1L))
  }

  test("hardNegatives: same-label excluded, rank order by cosine then id") {
    val labeled = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),  // same label as 0: excluded
      (2L, Array(0.8f, 0.2f, 0.0f, 0.0f), 1),  // best cross-label negative
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val q = labeled.filter(col("vec_id") === 0)
    val r = Similarity.hardNegatives(labeled, q, "embedding", "vec_id",
      "label", k = 3).orderBy("rank").collect()
    assert(r.map(_.getAs[Long]("neg_id")).toSeq === Seq(2L, 3L, 4L))
    assert(!r.exists(_.getAs[Int]("neg_label") == 0)) // never its own label
    assert(r.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
    // the top negative really is the hard one (closest cross-label)
    assert(r.head.getAs[Double]("cosine_sim") > 0.9)
  }

  test("signLshBucket: identical vectors share a bucket, opposite do not") {
    val b = vecs.select(col("vec_id"),
      Similarity.signLshBucket(col("embedding"), 4, 8).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(0L) === b(4L))
    assert(b(0L) !== b(3L)) // all 8 plane signs flip
  }

  test("ivfTopK: probes only nearest clusters, finds the exact neighbor") {
    import org.apache.spark.sql.DataFrame
    val centroids: DataFrame = vecs.filter(col("vec_id").isin(0L, 2L))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val q = array(Seq(1.0, 0.05, 0.0, 0.0).map(lit): _*)
    val r = Similarity.ivfTopK(vecs, "embedding", "vec_id", centroids, q,
      nprobe = 1, k = 3).collect()
    // query is ~x-axis -> probes centroid 0's cluster: {0, 1, 4} (3 is
    // opposite, assigned to 0's cluster too but ranks below; 2 unprobed)
    assert(r.map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L, 3L, 4L)))
    assert(r.head.getAs[Double]("cosine_sim") > 0.99) // exact-ish match on top
    assert(!r.map(_.getLong(0)).contains(2L)) // orthogonal cluster not probed
  }

  test("adaptive probing widens at cluster boundaries and recovers recall") {
    import org.apache.spark.sql.DataFrame
    val centroids: DataFrame = vecs.filter(col("vec_id").isin(0L, 2L))
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // query just off 45° between the two centroids (slightly toward
    // y): nprobe=1 probes the y cluster {2, 3}, but the TRUE top-2
    // {1, 2} straddles both clusters — the boundary case a fixed
    // probe count gets wrong
    val q = array(Seq(1.0, 1.05, 0.0, 0.0).map(lit): _*)
    val fixed = Similarity.probedCentroidsAdaptive(centroids, q,
        nprobe = 1, widenMargin = -1.0)
      .collect().map(_.getLong(0)).toSet
    assert(fixed.size === 1)
    val widened = Similarity.probedCentroidsAdaptive(centroids, q,
        nprobe = 1, widenMargin = 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(widened === Set(0L, 2L),
      "equidistant centroids must both be probed under widening")
    // margins expose the signal: rank-2 centroid within ~0 of best
    val m = Similarity.centroidMargins(centroids, q)
      .collect().map(r => r.getAs[Long]("cluster") ->
        r.getAs[Double]("margin")).toMap
    assert(m.values.forall(_ < 0.05))
    // true top-2 {1, 2} straddles the clusters — with nprobe=1 only
    // the y side is reachable, so recall@2 is capped at 1/2;
    // widening recovers both sides
    val brute = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      q, 2).collect().map(_.getLong(0)).toSet
    def ivfIds(widen: Double) =
      Similarity.ivfTopK(vecs, "embedding", "vec_id", centroids, q,
          nprobe = 1, k = 2, widenMargin = widen)
        .collect().map(_.getLong(0)).toSet
    assert(ivfIds(-1.0).intersect(brute).size < brute.size)
    assert(ivfIds(0.05) === brute)
  }

  test("embeddingNearDupPairs finds the identical pair") {
    val pairs = Similarity.embeddingNearDupPairs(vecs, "embedding", "vec_id",
      dim = 4, planes = 2, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
  }
}

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Aggregators
  import graft.ops.Aggregators.{Scored, ScoredId}

  test("TopK aggregator matches the window formulation exactly") {
    // 3 groups x 50 candidates with score collisions to exercise tiebreaks
    val scored = (for {
      g <- 0L until 3L
      i <- 0L until 50L
    } yield Scored(g, i, (i % 7).toDouble)).toDS().repartition(4)

    val agg = Aggregators.groupedTopK(scored, 5)
      .collect().map { case (g, items) => g -> items }.toMap

    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("group").orderBy(col("score").desc, col("id"))
    val win = scored.toDF().withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5).orderBy("group", "rk")
      .collect().groupBy(_.getLong(0)).map { case (g, rows) =>
        g -> rows.toSeq.map(r => ScoredId(r.getLong(1), r.getDouble(2)))
      }

    assert(agg === win)
    // deterministic tiebreak: equal scores resolve by ascending id
    assert(agg(0L).map(_.id) === Seq(6L, 13L, 20L, 27L, 34L))
  }

  test("Cms sketch: never undercounts, bounded overcount, partition-stable") {
    // known frequencies: tok0 x 1000, tok1 x 500, tok2 x 10, absent x 0
    val tokens = (Seq.fill(1000)("tok0") ++ Seq.fill(500)("tok1") ++
      Seq.fill(10)("tok2") ++ (0 until 2000).map(i => s"noise$i")).toDS()
    val probes = Seq("tok0", "tok1", "tok2", "absent")
    val truth = Map("tok0" -> 1000L, "tok1" -> 500L, "tok2" -> 10L,
      "absent" -> 0L)
    val n = tokens.count()
    val eps = 0.01
    val est = Aggregators.cmsFrequencies(tokens.repartition(8), probes, eps)
      .collect().toMap
    probes.foreach { p =>
      assert(est(p) >= truth(p), s"$p undercounted: ${est(p)} < ${truth(p)}")
      assert(est(p) <= truth(p) + (eps * n).toLong + 1,
        s"$p overcount beyond eps*N: ${est(p)} vs ${truth(p)}")
    }
    // commutativity + fixed seed: identical estimates under any partitioning
    val est2 = Aggregators.cmsFrequencies(tokens.repartition(3), probes, eps)
      .collect().toMap
    assert(est === est2)
  }
}

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOf: latest right row at-or-before left ts per key; null before any") {
    val left = Seq((1L, 10, 100L), (1L, 25, 101L), (2L, 5, 102L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 10, 1.0, 900L), (1L, 20, 2.0, 901L), (2L, 7, 9.0, 902L))
      .toDF("k", "ts", "v", "rid")
    val r = Joins.asOf(left, right, Seq("k"), "ts", "ts", "v", "rid")
      .orderBy("lid").collect()
    // left(1,10): right at ts=10 qualifies (<=); left(1,25): latest is ts=20
    assert(r.map(x => Option(x.getAs[Any]("asof_value"))).toSeq ===
      Seq(Some(1.0), Some(2.0), None)) // (2,5) precedes right(2,7) -> null
  }

  test("asOf: a matched right row with null value yields null, not a stale value") {
    val left = Seq((1L, 30, 100L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 10, Some(5.0), 900L), (1L, 20, None: Option[Double], 901L))
      .toDF("k", "ts", "v", "rid")
    val r = Joins.asOf(left, right, Seq("k"), "ts", "ts", "v", "rid").collect()
    // latest right row (ts=20) matches; its value is genuinely null —
    // must NOT resurrect the older ts=10 value
    assert(r.head.isNullAt(r.head.fieldIndex("asof_value")))
  }

  test("asOf: duplicate right ts resolved by highest tieBreak") {
    val left = Seq((1L, 10, 100L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 10, 1.0, 900L), (1L, 10, 2.0, 901L))
      .toDF("k", "ts", "v", "rid")
    val r = Joins.asOf(left, right, Seq("k"), "ts", "ts", "v", "rid").collect()
    assert(r.head.getAs[Double]("asof_value") === 2.0)
  }

  test("fuzzy join: bounded edit distance, case-insensitive, length prefilter") {
    val bookings = Seq((1L, "Palma"), (2L, "palmma"), (3L, "Berlin"))
      .toDF("bid", "hotelort")
    val pages = Seq(("palma", 10L), ("munich", 11L)).toDF("slug", "page_id")
    val r = Joins.fuzzy(bookings, pages, "hotelort", "slug", maxDist = 1)
      .select("bid", "page_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // Palma: exact (case-folded); palmma: one insertion; Berlin: no match
    assert(r === Set((1L, 10L), (2L, 10L)))
  }

  test("bandJoin: lo inclusive, hi exclusive") {
    val fact = Seq(0.0, 9.99, 10.0, 19.99, 20.0).toDF("v")
    val bands = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0)).toDF("band", "lo", "hi")
    val r = Joins.bandJoin(fact, bands, "v", "lo", "hi")
      .groupBy("band").count().orderBy("band").collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r === Seq(("a", 2L), ("b", 2L))) // 20.0 falls outside both
  }

  test("bucketedRangeJoin == naive theta join, inclusive bounds, " +
      "cell-boundary cases covered") {
    val pts = (0L to 400L by 7L).map(t => (t, t)).toDF("pid", "t")
    // intervals of assorted lengths incl. zero-width, cell-aligned and
    // cell-straddling ones
    val ivs = Seq((1L, 0L, 0L), (2L, 5L, 25L), (3L, 99L, 101L),
      (4L, 100L, 199L), (5L, 150L, 310L), (6L, 399L, 420L))
      .toDF("iid", "s", "e")
    val got = Joins.bucketedRangeJoin(pts, ivs, "t", "s", "e",
        cellWidth = 100L, maxCells = 4)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val want = pts.join(ivs, col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(got === want)
    assert(want.contains((0L, 1L)), "zero-width inclusive interval matched")
    // an interval spanning >= maxCells cells fails loudly
    val wide = Seq((9L, 0L, 500L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      Joins.bucketedRangeJoin(pts, wide, "t", "s", "e",
        cellWidth = 100L, maxCells = 4).collect()
    }
    assert(ex.getMessage.contains("bucketedRangeJoin") ||
      ex.getCause != null)
  }

  test("hashBandIndex admission: far rows admitted, near/store dups " +
      "suppressed, nulls admitted") {
    val h1 = 0x0F0F0F0F0F0F0F0FL
    val store = Seq((0L, h1), (2L, 0x7777777777777777L)).toDF("id", "h")
    val index = Dedup.hashBandIndex(store, "h", "id", bits = 64, bands = 8)
    val batch = Seq(
      (10L, Some(h1)),                       // exact store dup -> out
      (11L, Some(h1 ^ (1L << 63))),          // hamming 1 to store -> out
      (12L, Some(0x1FF07FE03FF80F01L ^ h1)), // far from everything -> in
      (13L, Some(0x1FF07FE03FF80F01L ^ h1)), // same-batch dup of 12 -> out
      (14L, None)                            // null hash -> admitted
    ).toDF("id", "h")
    val admitted = Dedup.admitAgainstHashIndex(batch, "h", "id", index,
        bits = 64, bands = 8, maxHamming = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(12L, 14L))
    // and the audit pairs carry the exact hamming
    val pairs = Dedup.pairsAgainstHashIndex(batch, "h", "id", index,
        bits = 64, bands = 8, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((0L, 10L, 0L), (0L, 11L, 1L)))
  }
}
