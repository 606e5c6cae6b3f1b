package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.fastMd5

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("fastMd5 is value-identical to built-in md5 (codegen path)") {
    val df = (Seq("", "a", "hello world", "äöü unicode ✓") ++
      (0 until 200).map(i => s"doc $i payload")).toDF("s")
    val bad = df.filter(fastMd5(col("s")) =!= md5(col("s").cast("binary"))).count()
    assert(bad === 0)
  }

  test("fastMd5 is value-identical in interpreted mode") {
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val df = Seq("x", "interpreted row", "").toDF("s")
      val r = df.select(fastMd5(col("s")).as("f"), md5(col("s").cast("binary")).as("b"))
        .collect()
      r.foreach(row => assert(row.getString(0) === row.getString(1)))
    }
  }

  test("nfcNormalize composes decomposed sequences identically in both " +
      "modes, is identity on NFC text, and propagates null") {
    import graft.functions.GraftFunctions.nfcNormalize
    val decomposed = "cafe\u0301 und u\u0308ber" // combining marks
    val composed = "caf\u00e9 und \u00fcber"     // single codepoints
    Seq(true, false).foreach { codegen =>
      withSqlConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" ->
          (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        val df = Seq(Some(decomposed), Some(composed), Some("plain ascii"),
          Some(""), None).toDF("s")
        val got = df.select(nfcNormalize(col("s"))).collect().map(_.get(0))
        assert(got(0) === composed)      // composed
        assert(got(1) === composed)      // already NFC: unchanged
        assert(got(2) === "plain ascii") // fast path identity
        assert(got(3) === "")
        assert(got(4) == null)
        // the dedup-keying consequence: raw digests differ, NFC collide
        val keys = Seq(decomposed, composed).toDF("s")
          .select(fastMd5(col("s")).as("raw"),
            fastMd5(nfcNormalize(col("s"))).as("nfc")).collect()
        assert(keys(0).getString(0) !== keys(1).getString(0))
        assert(keys(0).getString(1) === keys(1).getString(1))
      }
    }
    // wrong input type fails analysis, not codegen
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(nfcNormalize(col("n"))).collect()
    }
  }

  test("intersectCount == size(array_intersect) in both modes, incl. " +
      "duplicate/null-element and null-array edges") {
    import graft.functions.GraftFunctions.intersectCount
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 40).map(i => s"tok$i")
    val rows = (1 to 60).map { _ =>
      (Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))),
        Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))))
    } ++ Seq(
      (Seq("a", "a", "b"), Seq("a", "c")),   // duplicates count once
      (Seq.empty[String], Seq("a")),
      (Seq("x"), Seq.empty[String]))
    val df = rows.toDF("a", "b")
    Seq(true, false).foreach { codegen =>
      withSqlConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" ->
          (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        val bad = df.select(
            intersectCount(col("a"), col("b")).as("fused"),
            size(array_intersect(col("a"), col("b"))).cast("long")
              .as("builtin"))
          .filter(!(col("fused") <=> col("builtin"))).count()
        assert(bad === 0, s"codegen=$codegen")
      }
    }
    // null elements never match (set built-ins treat null as a member;
    // our arrays are digest-distinct and null-free by construction, so
    // the contract only promises null elements DON'T count)
    val withNullElem = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING)) a, " +
        "array(CAST(NULL AS STRING), 'b') b")
    assert(withNullElem.select(intersectCount(col("a"), col("b")))
      .head().getLong(0) === 0L)
    // null array propagates
    val nullArr = Seq((Some(Seq("a")), None: Option[Seq[String]]))
      .toDF("a", "b")
    assert(nullArr.select(intersectCount(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("deflateRatio: repetitive text compresses far below prose, " +
      "deterministic in both modes, null/empty edges") {
    import graft.functions.GraftFunctions.deflateRatio
    val spam = ("buy cheap pills " * 200).trim
    val prose = "The glacier retreated over nine thousand years, " +
      "leaving a chain of moraine lakes whose outflow carved the " +
      "valley into terraces that farmers later walled with stone. " +
      "Each terrace drains through culverts older than the maps " +
      "that record them, and the village below measures its seasons " +
      "by which channels run loud after the early snows."
    Seq(true, false).foreach { codegen =>
      withSqlConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" ->
          (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        val r = Seq(Some(spam), Some(prose), Some(""), None).toDF("s")
          .select(deflateRatio(col("s"))).collect().map(_.get(0))
        val spamR = r(0).asInstanceOf[Double]
        val proseR = r(1).asInstanceOf[Double]
        assert(spamR < 0.1, s"spam ratio $spamR not tiny")
        assert(proseR > 0.4, s"prose ratio $proseR not prose-like")
        assert(spamR < proseR / 3)
        assert(r(2) == null && r(3) == null)
      }
    }
    // partition-stable and run-stable (fixed Deflater level, raw mode)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), deflateRatio(col("text")).as("r"))
    val a = docs.collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = docs.repartition(7).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a === b)
    // SQL surface matches the DataFrame op
    graft.functions.GraftExtensions.registerOn(spark)
    val viaSql = spark.sql(s"SELECT graft_deflate_ratio('$prose')")
      .head().getDouble(0)
    assert(viaSql ===
      spark.range(1).select(deflateRatio(lit(prose))).head().getDouble(0))
  }

  test("cosine expression is bit-identical to the HOF fold it replaced") {
    import org.apache.spark.sql.Column
    import graft.ops.Similarity
    // the round-1 higher-order-function formulation, kept here as the
    // reference semantics for the fused codegen'd CosineSimExpression
    def hofCosine(a: Column, b: Column): Column = {
      def dot(x: Column, y: Column): Column =
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      def norm(x: Column): Column =
        sqrt(aggregate(x, lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double")))
      dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))
    }
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 50).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    } :+ ((Array.fill(64)(0.0f), Array.fill(64)(1.0f))) // zero vector -> null
    val df = vecs.toDF("a", "b")
    Seq(true, false).foreach { codegen =>
      withSqlConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" ->
          (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        val bad = df.select(
            Similarity.cosine(col("a"), col("b")).as("fused"),
            hofCosine(col("a"), col("b")).as("hof"))
          // bit-exact: NOT a tolerance compare (null-safe equality)
          .filter(!(col("fused") <=> col("hof"))).count()
        assert(bad === 0, s"codegen=$codegen")
      }
    }
    // unequal lengths and null elements degrade to null like the HOF tree
    val edge = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assert(edge.select(Similarity.cosine(col("a"), col("b"))).head().isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT cast(array(1.0, NULL) AS ARRAY<DOUBLE>) a, array(1.0d, 2.0d) b")
    assert(withNullElem.select(Similarity.cosine(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("simhash expression is bit-identical to the HOF fold it replaced") {
    import org.apache.spark.sql.Column
    import graft.ops.Text
    // the round-1 higher-order-function formulation as reference semantics
    def hofSimhash(text: Column, bits: Int): Column = {
      val hexChars = bits / 4
      val tokenBits = transform(Text.tokens(text),
        t => conv(substring(fastMd5(t), 1, hexChars), 16, 10).cast("long"))
      val shifts = sequence(lit(bits - 1), lit(0), lit(-1))
      val counts = aggregate(tokenBits, array_repeat(lit(0), bits),
        (acc, l) => zip_with(acc, shifts,
          (a, sft) => a + (call_function("shiftright", l, sft.cast("int"))
            .bitwiseAND(lit(1L)).cast("int") * 2 - 1)))
      val powers = transform(sequence(lit(0), lit(bits - 1)),
        j => call_function("shiftleft", lit(1L), j.cast("int")))
      val packed = aggregate(
        zip_with(counts, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))),
        lit(0L), (a, v) => a + v)
      when(text.isNull || size(Text.tokens(text)) === 0, lit(0L))
        .otherwise(packed)
    }
    val docs = (Seq("", "   ", "one", "a b c d e f g",
      "The quick brown fox jumps over the lazy dog") ++
      (0 until 100).map(i => s"synthetic doc $i with words ${i % 7}"))
      .map(Option(_)) :+ (None: Option[String])
    val df = docs.toDF("t")
    Seq(true, false).foreach { codegen =>
      withSqlConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" ->
          (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        Seq(16, 32).foreach { bits =>
          val bad = df.select(Text.simhash(col("t"), bits).as("fused"),
              hofSimhash(col("t"), bits).as("hof"))
            .filter(!(col("fused") <=> col("hof"))).count()
          assert(bad === 0, s"codegen=$codegen bits=$bits")
        }
      }
    }
  }

  test("l2Sq expression is bit-identical to the HOF fold it replaced") {
    // the original Quantize.l2sq formulation as reference semantics
    def hofL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val rnd = new scala.util.Random(11)
    val vecs = (1 to 50).map { _ =>
      (Array.fill(16)(rnd.nextDouble() * 2 - 1),
        Array.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    val df = vecs.toDF("a", "b")
    Seq(true, false).foreach { codegen =>
      withSqlConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" ->
          (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        val bad = df.select(
            graft.functions.GraftFunctions.l2Sq(col("a"), col("b"))
              .as("fused"),
            hofL2(col("a"), col("b")).as("hof"))
          .filter(!(col("fused") <=> col("hof"))).count()
        assert(bad === 0, s"codegen=$codegen")
      }
    }
    // float inputs, unequal lengths and null elements match the fold
    val fl = Seq((Array(1.0f, 2.5f), Array(0.5f, -1.0f))).toDF("a", "b")
    val Seq(Seq(fv, hv)) = rows(fl.select(
      graft.functions.GraftFunctions.l2Sq(col("a"), col("b")),
      hofL2(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double")))))
    assert(fv === hv)
    val edge = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(edge.select(graft.functions.GraftFunctions
      .l2Sq(col("a"), col("b"))).head().isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT cast(array(1.0, NULL) AS ARRAY<DOUBLE>) a, array(1.0d, 2.0d) b")
    assert(withNullElem.select(graft.functions.GraftFunctions
      .l2Sq(col("a"), col("b"))).head().isNullAt(0))
  }

  test("curation lifts: SQL surface matches the DataFrame ops") {
    graft.functions.GraftExtensions.registerOn(spark)
    import graft.ops.{Curation, Sampling}
    val r = spark.sql(
      """SELECT graft_normalize_text('  Hey, YOU!! (x=1) '),
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)),
        |  graft_l2sq(array(1.0d, 2.0d), array(3.0d, 4.0d)),
        |  graft_split_bucket(42),
        |  graft_nfc('café'),
        |  graft_intersect_count(array('a', 'b', 'c'),
        |    array('b', 'c', 'd'))""".stripMargin).head()
    val d = spark.range(1).select(
      Curation.normalizeText(lit("  Hey, YOU!! (x=1) ")),
      graft.functions.GraftFunctions.dotProduct(
        array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))),
      graft.functions.GraftFunctions.l2Sq(
        array(lit(1.0), lit(2.0)), array(lit(3.0), lit(4.0))),
      Sampling.splitBucket(lit(42)),
      graft.functions.GraftFunctions.nfcNormalize(lit("café")),
      graft.functions.GraftFunctions.intersectCount(
        array(lit("a"), lit("b"), lit("c")),
        array(lit("b"), lit("c"), lit("d")))).head()
    assert(r === d)
    assert(r.getString(0) === "hey you x 1")
    assert(r.getDouble(1) === 11.0)
    assert(r.getDouble(2) === 8.0)
    assert(r.getString(4) === "café")
    assert(r.getLong(5) === 2L)
  }

  test("graft_wordpiece / graft_linear_score: SQL matches the DataFrame ops") {
    graft.functions.GraftExtensions.registerOn(spark)
    import graft.ops.Text
    val doc = "hello sparking the zq"
    val viaSql = spark.sql(
      s"""SELECT graft_wordpiece('$doc',
         |         array('he', 'llo', 'spark', 'ing', 'the', 's')) AS p,
         |  graft_linear_score('alpha beta beta',
         |    array(0.25, -0.5), 0.125) AS sc""".stripMargin).head()
    val viaDf = spark.range(1).select(
      Text.greedyPieces(lit(doc),
        Seq("he", "llo", "spark", "ing", "the", "s")).as("p"),
      Text.hashedLinearScore(lit("alpha beta beta"),
        Seq(0.25, -0.5), 0.125).as("sc")).head()
    assert(viaSql === viaDf)
    assert(viaSql.getSeq[String](0) ===
      Seq("he", "llo", "spark", "ing", "the", "z", "q"))
    // non-literal model parameters are rejected with the standard error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).toDF("i").createOrReplaceTempView("t_wp")
      spark.sql(
        "SELECT graft_wordpiece('x', array(CAST(i AS STRING))) FROM t_wp")
        .collect()
    }
    assert(e.getCondition === "NON_FOLDABLE_ARGUMENT")
  }

  test("graft_bpe_encode: SQL matches the DataFrame op") {
    graft.functions.GraftExtensions.registerOn(spark)
    import graft.ops.Bpe
    val doc = "aaa abab c++"
    val rules = Seq(Bpe.MergeRule(1, "a", "a", "aa", 0L),
      Bpe.MergeRule(2, "a", "b", "ab", 0L),
      Bpe.MergeRule(3, "ab", "ab", "abab", 0L))
    val viaSql = spark.sql(
      s"""SELECT graft_bpe_encode('$doc',
         |  array('a', 'a', 'ab'), array('a', 'b', 'ab')) AS p""".stripMargin)
      .head().getSeq[String](0)
    val viaDf = spark.range(1)
      .select(Bpe.encodeFast(lit(doc), rules).as("p"))
      .head().getSeq[String](0)
    assert(viaSql === viaDf)
    assert(viaSql === Seq("aa", "a", "abab", "c++"))
    // mismatched rule arrays are rejected at analysis
    val e = intercept[Exception] {
      spark.sql("SELECT graft_bpe_encode('x', array('a'), array('b', 'c'))")
        .collect()
    }
    assert(e.getMessage.contains("same length"))
  }

  test("minhash signature expression matches the HOF fold it replaced") {
    import org.apache.spark.sql.Column
    import graft.ops.Text
    val numHashes = 8
    def hofSig(text: Column): Column = {
      val hArr = transform(Text.shingles(text, 3), s => Text.shingleHash(s))
      val params = array((0 until numHashes).map { i =>
        val (a, b) = Text.minhashParams(i)
        struct(lit(a).as("a"), lit(b).as("b"))
      }: _*)
      aggregate(hArr, array_repeat(lit(Text.MinhashMod), numHashes),
        (acc, hv) => zip_with(acc, params,
          (m, p) => least(m,
            (hv * p.getField("a") + p.getField("b")) % Text.MinhashMod)))
    }
    val (as, bs) = (0 until numHashes).map(Text.minhashParams).unzip
    def fusedSig(text: Column): Column =
      graft.functions.GraftFunctions.minhashSig(
        Text.shingles(text, 3), as, bs, Text.MinhashMod)
    val docs = Seq("", "one", "a b", "a b c",
      "the quick brown fox jumps over the lazy dog again and again") ++
      (0 until 50).map(i => s"doc $i body text with shared phrases ${i % 5}")
    val df = docs.toDF("t")
    val bad = df.select(fusedSig(col("t")).as("f"), hofSig(col("t")).as("h"))
      .filter(!(col("f") <=> col("h"))).count()
    assert(bad === 0)
  }

  test("graft_rolling_fingerprints: SQL surface matches the DataFrame op") {
    graft.functions.GraftExtensions.registerOn(spark)
    import graft.functions.GraftFunctions.rollingFingerprints
    val doc = "the quick brown fox jumps over the lazy dog again and again"
    val viaSql = spark.sql(
      s"SELECT graft_rolling_fingerprints('$doc', 10, 2) AS f")
      .head().getSeq[Long](0)
    val viaDf = spark.range(1)
      .select(rollingFingerprints(lit(doc), 10, 2).as("f"))
      .head().getSeq[Long](0)
    assert(viaSql === viaDf && viaSql.nonEmpty)
    // non-literal window arg is an analysis error, not a codegen crash
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_rolling_fingerprints('x', 1 + 1, 2)")
    }
    assert(e.getCondition == "NON_FOLDABLE_ARGUMENT")
    assert(e.getMessage.contains("graft_rolling_fingerprints") &&
      e.getMessage.contains("windowChars"))
  }

  test("graft_md5 is callable from raw SQL after extensions registration") {
    graft.functions.GraftExtensions.registerOn(spark)
    val r = spark.sql(
      "SELECT graft_md5('abc') AS f, md5(cast('abc' AS BINARY)) AS b").head()
    assert(r.getString(0) === r.getString(1))
    // the extensions class itself applies cleanly (spark.sql.extensions path)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }

  test("lifted SQL functions agree with the DataFrame ops they wrap") {
    graft.functions.GraftExtensions.registerOn(spark)
    import graft.ops.{Similarity, Text}
    val doc = "Der schnelle braune Fuchs springt. The quick brown fox!"
    spark.createDataFrame(Seq(Tuple1(doc))).toDF("t")
      .createOrReplaceTempView("lift_docs")
    val viaSql = spark.sql(
      """SELECT graft_token_count(t), graft_bpe_token_count(t),
        |  graft_quality_score(t), graft_lang_id(t), graft_fingerprint(t),
        |  graft_rolling_hash(t), graft_simhash(t),
        |  graft_repetition_ratio(t),
        |  graft_cosine(array(1.0d, 0.0d), array(0.6d, 0.8d)),
        |  graft_canonical_url('HTTPS://WWW.Example.de/A/?x=1'),
        |  graft_redact_pii(t), graft_flesch(t),
        |  graft_token_entropy(t), graft_top_token(t)
        |FROM lift_docs""".stripMargin).head()
    import graft.ops.Urls
    val viaDf = spark.table("lift_docs").select(
      Text.tokenCount(col("t")), Text.bpeIshTokenCount(col("t")),
      Text.qualityScore(col("t")), Text.langId(col("t")),
      Text.fingerprint(col("t")), Text.rollingHash(col("t")),
      Text.simhash(col("t")), Text.repetitionRatio(col("t")),
      Similarity.cosine(array(lit(1.0), lit(0.0)),
        array(lit(0.6), lit(0.8))),
      Urls.canonicalize(lit("HTTPS://WWW.Example.de/A/?x=1")),
      Text.redactPii(col("t")), Text.fleschReadingEase(col("t")),
      Text.tokenEntropy(Text.tokens(col("t"))),
      Text.topToken(Text.tokens(col("t")))).head()
    assert(viaSql.toSeq === viaDf.toSeq)
    assert(viaSql.getDouble(8) === 0.6) // cosine sanity
    assert(viaSql.getString(9) === "example.de/a")
  }

  test("wrong arity on a lifted SQL function raises a standard AnalysisException") {
    graft.functions.GraftExtensions.registerOn(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cosine(array(1.0d))").collect()
    }
    assert(e.getCondition === "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
  }

  test("fastMd5 propagates null") {
    val r = rows(strDf("s", Seq(None)).select(fastMd5(col("s"))))
    assert(r.head.head === null)
  }

  test("rollingFingerprints: identical interpreted and codegen'd") {
    import graft.functions.GraftFunctions.rollingFingerprints
    val df = (Seq("", "a", "tiny", "the quick brown fox jumps over") ++
      (0 until 50).map(i => s"document $i with some shared boilerplate " +
        "tail that is long enough to roll through")).toDF("s")
    val codegen = df.select(rollingFingerprints(col("s"), 20, 3).as("f"))
      .collect().map(_.getSeq[Long](0))
    withSqlConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(rollingFingerprints(col("s"), 20, 3).as("f"))
        .collect().map(_.getSeq[Long](0))
      codegen.zip(interp).foreach { case (c, i) => assert(c === i) }
    }
  }

  test("rollingFingerprints: sampleMod=1 keeps every window position") {
    import graft.functions.GraftFunctions.rollingFingerprints
    val df = Seq("abcdefgh", "abc", "").toDF("s")
    val n = df.select(length(col("s")).as("len"),
        size(rollingFingerprints(col("s"), 5, 1)).as("k"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(n(8) === 4) // positions 0..3
    assert(n(3) === 1) // whole-string window
    assert(n(0) === 1) // empty window
  }

  test("md5Fingerprints: bit-identical to the md5 HOF chain it replaced") {
    import graft.functions.GraftFunctions.md5Fingerprints
    // the exact expression substringDupWindows used before the fusion —
    // the q136 oracle replays this arithmetic, so the fused expression
    // must match it cell-for-cell (incl. empty, short, multi-byte and
    // supplementary-plane inputs, where substr counts CODE POINTS)
    def hofChain(w: Int, mod: Int) =
      expr(s"filter(transform(sequence(1, greatest(char_length(s)" +
        s" - ${w - 1}, 1), 1), p -> md5(substr(s, p, " +
        s"$w))), h -> cast(conv(substr(h, 1, 3), 16, 10) " +
        s"as int) % $mod = 0)")
    val docs = Seq("", "a", "tiny", "äöü ümlauts héllo wörld",
      "emoji 😀 beyond the bmp 🤖 and back",
      "the quick brown fox jumps over the lazy dog again and again") ++
      (0 until 40).map(i => s"doc $i shares this exact boilerplate " +
        "sentence that is comfortably longer than one window")
    val df = docs.toDF("s")
    for ((w, mod) <- Seq((40, 20), (10, 3), (5, 1))) {
      val fused = df.select(md5Fingerprints(col("s"), w, mod).as("f"))
        .collect().map(_.getSeq[String](0))
      val hof = df.select(hofChain(w, mod).as("f"))
        .collect().map(_.getSeq[String](0))
      fused.zip(hof).foreach { case (a, b) => assert(a === b) }
    }
    // the chain's null contract is an EMPTY array, not null (greatest
    // floors the sequence bound at 1 and the null md5 is filter-dropped)
    // — the fused column matches it exactly
    val nulls = strDf("s", Seq(None))
    assert(rows(nulls.select(md5Fingerprints(col("s"), 40, 20))).head.head
      === Seq.empty)
    assert(rows(nulls.select(hofChain(40, 20))).head.head === Seq.empty)
  }

  test("rollingFingerprints: shared runs fingerprint identically at any offset") {
    import graft.functions.GraftFunctions.rollingFingerprints
    val shared = "0123456789abcdefghijklmnopqrstuvwxyz"
    val df = Seq(s"X$shared", s"YYYYYYY$shared").toDF("s")
    val sets = df.select(rollingFingerprints(col("s"), 10, 2).as("f"))
      .collect().map(_.getSeq[Long](0).toSet)
    // every selected window fully inside `shared` appears in both docs
    val common = sets(0) intersect sets(1)
    assert(common.nonEmpty)
    // windows fully inside shared: 36-10+1 = 27 positions, ~half selected;
    // non-shared windows are at most windowChars-1 per doc
    assert(common.size >= 8)
  }

}
