package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Profiling, Retrieval, TimeSeries}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------------- BM25

  test("bm25: rare terms outscore common terms; tf saturates") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "apple banana")).toDF("doc_id", "text")
    val r = Retrieval.bm25(docs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getString(1)) -> x.getDouble(4))
      .toMap
    // cherry appears in 1/3 docs, apple in 3/3: cherry's idf dominates
    assert(r((2L, "cherry")) > r((2L, "apple")))
    // same (term, dl): doc 1 has tf=2 for apple vs doc 3's tf=1, but
    // doc 1 is longer — score still higher, by less than 2x (saturation)
    assert(r((1L, "apple")) > r((3L, "apple")))
    assert(r((1L, "apple")) < 2.0 * r((3L, "apple")))
  }

  test("bm25: idf is the plus-one variant (never negative)") {
    // a term in EVERY doc gets idf = ln(1 + 0.5/(N+0.5)) > 0
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    val scores = Retrieval.bm25(docs, "doc_id", "text")
      .select("bm25").as[Double].collect()
    assert(scores.forall(_ > 0.0))
  }

  test("bm25Search: sums matched terms only, docs without a match drop") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple durian"),
      (3L, "elderberry fig")).toDF("doc_id", "text")
    val r = Retrieval.bm25Search(docs, "doc_id", "text",
        Seq("apple", "cherry"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2))))
      .toMap
    assert(r(1L)._1 === 2L) // apple + cherry
    assert(r(2L)._1 === 1L) // apple only
    assert(!r.contains(3L)) // no query term
    // doc 1 matches the rarer cherry too: total score must exceed doc 2
    assert(r(1L)._2 > r(2L)._2)
  }

  // ----------------------------------------------------------------- DSIR

  test("dsirWeights: target-like docs weigh above raw-like docs") {
    // target docs speak "aa bb", raw docs speak "zz yy"; a fresh doc in
    // target vocabulary must outweigh a fresh doc in raw vocabulary
    val docs = Seq(
      (1L, "aa bb aa bb", true), (2L, "aa bb bb aa", true),
      (3L, "zz yy zz yy", false), (4L, "yy zz yy zz", false),
      (5L, "aa bb", false), (6L, "zz yy", false)).toDF("id", "text", "tgt")
    val w = Retrieval.dsirWeights(docs, "id", "text", col("tgt"))
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(w(5L) > w(6L))
    // same ordering on the in-model docs (smoothing shifts absolute
    // values on a corpus this small, but never the ranking)
    assert(w(1L) > w(3L) && w(2L) > w(4L))
  }

  test("dsirWeights: n_toks counts occurrences, empty docs drop") {
    val docs = Seq((1L, "a a a", true), (2L, "", false))
      .toDF("id", "text", "tgt")
    val r = Retrieval.dsirWeights(docs, "id", "text", col("tgt")).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 3L)
  }

  // ----------------------------------------- temperature-scaled mixing

  test("temperatureMix: alpha<1 flattens; alpha=1 is the raw mix") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("src")
    val t = Retrieval.temperatureMix(df, "src", 0.3, 1000L)
      .collect().map(x => x.getString(0) -> (x.getDouble(2), x.getDouble(3)))
      .toMap
    // flattening: small source's share rises, big source's falls
    assert(t("small")._2 > t("small")._1)
    assert(t("big")._2 < t("big")._1)
    val raw = Retrieval.temperatureMix(df, "src", 1.0, 1000L)
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(math.abs(raw("big") - 0.9) < 1e-12)
    assert(math.abs(raw("small") - 0.1) < 1e-12)
  }

  // ------------------------------------------------------- MAD outliers

  test("madOutliers: extreme values cannot drag the threshold") {
    // 9 points at 100±2 plus one at 10000: classic mean/std z-score
    // would swallow the outlier into the threshold; MAD flags it
    val df = (Seq(98.0, 99.0, 99.0, 100.0, 100.0, 100.0, 101.0, 101.0,
      102.0, 10000.0)).map(("g", _)).toDF("g", "v")
    val r = Profiling.madOutliers(df, "g", "v").collect().head
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("med") === 100.0)
    assert(r.getAs[Double]("mad") === 1.0)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("madOutliers: constant group has zero MAD and no outliers") {
    val df = Seq(("g", 5.0), ("g", 5.0), ("g", 5.0)).toDF("g", "v")
    val r = Profiling.madOutliers(df, "g", "v").collect().head
    assert(r.getAs[Double]("mad") === 0.0)
    assert(r.getAs[Long]("n_outliers") === 0L)
  }

  // --------------------------------------------------------------- EWMA

  test("ewma: matches the sequential recursion") {
    // s1=10; s2=.2*20+.8*10=12; s3=.2*0+.8*12=9.6
    val df = Seq((1L, 1, 10.0), (1L, 2, 20.0), (1L, 3, 0.0))
      .toDF("k", "t", "v")
    val r = TimeSeries.ewma(df, "k", Seq(col("t").asc), "v", 0.2)
      .collect().head
    assert(r.getAs[Long]("n_obs") === 3L)
    assert(math.abs(r.getAs[Double]("ewma") - 9.6) < 1e-12)
  }

  test("ewma: single observation returns itself; keys are isolated") {
    val df = Seq((1L, 1, 42.0), (2L, 1, 1.0), (2L, 2, 2.0))
      .toDF("k", "t", "v")
    val r = TimeSeries.ewma(df, "k", Seq(col("t").asc), "v", 0.5)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(math.abs(r(1L) - 42.0) < 1e-12)
    assert(math.abs(r(2L) - 1.5) < 1e-12) // .5*2 + .5*1
  }

  // ----------------------------------------- substring dup windows

  test("substringDupWindows: shared run flagged in both docs") {
    val shared = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"unique preamble one $shared trailing text a"),
      (2L, s"different lead-in xx $shared other ending b"),
      (3L, "totally unrelated content with nothing shared here at all"))
      .toDF("doc_id", "text")
    val r = Dedup.substringDupWindows(docs, "doc_id", "text",
        windowChars = 20, sampleMod = 1)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("n_dup_windows"), x.getAs[Double]("dup_frac"))).toMap
    assert(r(1L)._1 > 0 && r(2L)._1 > 0)
    assert(r(3L)._1 === 0L && r(3L)._2 === 0.0)
  }

  test("substringDupWindows: content-defined selection survives shifts") {
    // the same 200-char run embedded at offsets that differ by a prime:
    // hash-mod selection must pick the SAME windows inside the run in
    // both docs (positional stride sampling would miss every one)
    val shared = (1 to 40).map(i => f"w$i%03d").mkString(" ") // 239 chars
    val docs = Seq(
      (1L, s"a $shared"),
      (2L, s"completely different longer prefix xyz $shared"))
      .toDF("doc_id", "text")
    val r = Dedup.substringDupWindows(docs, "doc_id", "text",
        windowChars = 20, sampleMod = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("n_windows"), x.getAs[Long]("n_dup_windows"))).toMap
    assert(r(1L)._2 > 0 && r(2L)._2 > 0)
    // every selected window inside the shared suffix matches across
    // docs, so dup counts can differ only by prefix-straddling windows
    assert(math.abs(r(1L)._2 - r(2L)._2) <= 14) // < windowChars
  }

  test("substringDupWindows: rolling-hash mode agrees with md5 mode") {
    // at sampleMod=1 both modes keep every window and dup detection is
    // exact window equality — counts must coincide exactly
    val shared = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"unique preamble one $shared trailing text a"),
      (2L, s"different lead-in xx $shared other ending b"),
      (3L, "totally unrelated content with nothing shared here at all"))
      .toDF("doc_id", "text")
    def counts(rolling: Boolean) =
      Dedup.substringDupWindows(docs, "doc_id", "text",
          windowChars = 20, sampleMod = 1, rollingHash = rolling)
        .collect().map(x => x.getLong(0) ->
          ((x.getAs[Long]("n_windows"), x.getAs[Long]("n_dup_windows"))))
        .toMap
    assert(counts(rolling = true) === counts(rolling = false))
  }

  test("substringDupWindows: short docs, whole-text window, empty-safe") {
    val docs = Seq((1L, "tiny"), (2L, "tiny"), (3L, "other"), (4L, ""))
      .toDF("doc_id", "text")
    val r = Dedup.substringDupWindows(docs, "doc_id", "text", 40, 1)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("n_windows"), x.getAs[Long]("n_dup_windows"))).toMap
    assert(r(1L) === ((1L, 1L)))
    assert(r(2L) === ((1L, 1L)))
    assert(r(3L) === ((1L, 0L)))
    assert(r.contains(4L)) // empty text still yields a row
  }

  test("hashedLinearScore = sigmoid(bias + per-token bucket weights)") {
    val w = (0 until 64).map(i => i / 64.0)
    // replicate Sampling.splitBucket (first md5 hex byte) on the JVM
    def bucket(tok: String): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      Integer.parseInt(hex.substring(0, 2), 16) % 64
    }
    def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val df = Seq((1L, "alpha beta BETA"), (2L, ""))
      .toDF("id", "text")
      .unionByName(Seq(3L).toDF("id").withColumn("text",
        lit(null).cast("string")))
    val out = df.select(col("id"),
        graft.ops.Text.hashedLinearScore(col("text"), w, 0.125).as("s"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // tokens lowercase, so BETA and beta share a bucket
    assert(out(1L) === Some(sigmoid(
      0.125 + w(bucket("alpha")) + 2 * w(bucket("beta")))))
    assert(out(2L) === Some(sigmoid(0.125))) // no tokens -> bias only
    assert(out(3L) === None) // null text stays null, not silently 0
  }
}
