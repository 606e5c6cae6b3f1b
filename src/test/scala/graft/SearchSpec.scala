package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Learning, Retrieval, Similarity, Text}

/** Specs for the search / corpus-hygiene pack: decontamination,
  * bottom-k sketches, random projection, reciprocal-rank fusion. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- ngramContamination

  test("ngramContamination flags docs sharing n-grams with the benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // contains bench 3-gram
      (2L, "entirely unrelated content about spark plans"),
      (3L, "quick brown fox news tonight")                 // shares "quick brown fox"
    ).toDF("id", "text")
    val bench = Seq(
      (100L, "a quick brown fox appears in the benchmark")
    ).toDF("id", "text")
    val out = Dedup.ngramContamination(corpus, bench, "text", "id", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    // doc 1: 7 distinct 3-grams, exactly "the quick brown"? no — bench
    // has "a quick brown","quick brown fox","brown fox appears",... only
    // "quick brown fox" is shared.
    assert(out(1L)._1 === 7)
    assert(out(1L)._2 === 1 && out(1L)._3)
    assert(out(2L)._2 === 0 && !out(2L)._3)
    assert(out(3L)._2 === 1 && out(3L)._3)
  }

  test("ngramContamination: docs shorter than n use the whole-text shingle") {
    val corpus = Seq((1L, "tiny doc"), (2L, "other words")).toDF("id", "text")
    val bench = Seq((9L, "tiny doc")).toDF("id", "text")
    val out = Dedup.ngramContamination(corpus, bench, "text", "id", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) === 1) // whole-text shingle collides
    assert(out(2L) === 0)
  }

  // ---------------------------------------------------- bottom-k sketch

  test("bottomKSketches keeps the k smallest distinct token digests") {
    val df = Seq.tabulate(40)(i => ("k1", s"tok$i")) ++
      Seq.tabulate(40)(i => ("k1", s"tok$i")) // duplicates collapse
    val sk = Dedup.bottomKSketches(df.toDF("key", "tok"), "key", "tok", 5)
      .collect()
    assert(sk.length === 5)
    val hs = sk.map(_.getString(1)).toSeq
    assert(hs === hs.sorted) // the 5 smallest, in order via rk
  }

  test("sketchJaccard is exact when vocabularies fit inside the sketch") {
    // A = {a,b,c,d}, B = {c,d,e,f}: J = 2/6
    val toks = Seq("a", "b", "c", "d").map(("A", _)) ++
      Seq("c", "d", "e", "f").map(("B", _))
    val sk = Dedup.bottomKSketches(toks.toDF("key", "tok"), "key", "tok", 16)
    val r = Dedup.sketchJaccardPairs(sk, "key", 16).collect().head
    assert(r.getString(0) === "A" && r.getString(1) === "B")
    assert(r.getLong(2) === 2)
    assert(math.abs(r.getDouble(3) - 2.0 / 6.0) < 1e-6)
  }

  test("sketchJaccard: disjoint and identical vocabularies") {
    val toks = Seq("a", "b").map(("A", _)) ++ Seq("a", "b").map(("B", _)) ++
      Seq("x", "y").map(("C", _))
    val sk = Dedup.bottomKSketches(toks.toDF("key", "tok"), "key", "tok", 8)
    val m = Dedup.sketchJaccardPairs(sk, "key", 8).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(m(("A", "B")) === 1.0)
    assert(m(("A", "C")) === 0.0)
    assert(m(("B", "C")) === 0.0)
  }

  // -------------------------------------------------- random projection

  test("randomProject applies the deterministic sign matrix") {
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val df = Seq(Tuple1(v)).toDF("emb")
    val out = df.select(Similarity.randomProject(col("emb"), 8, 3).as("p"))
      .collect().head.getSeq[Double](0)
    val expected = (0 until 3).map { j =>
      (0 until 8).map(d => v(d).toDouble * Similarity.planeSign(j, d)).sum
    }
    assert(out.length === 3)
    out.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-9) }
  }

  test("randomProject approximately preserves relative distances") {
    // JL with ±1 signs: E[||proj||²] = outDim · ||v||²; parallel vectors
    // stay parallel exactly.
    val v = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val v2 = v.map(_ * 2.0f)
    val df = Seq((1L, v), (2L, v2)).toDF("id", "emb")
    val out = df.select(col("id"),
        Similarity.randomProject(col("emb"), 16, 4).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    out(1L).zip(out(2L)).foreach { case (a, b) =>
      assert(math.abs(b - 2 * a) < 1e-6)
    }
  }

  // ------------------------------------------------------ greedyPieces

  test("greedyPieces segments greedily with single-char fallback") {
    val vocab = Seq("he", "llo", "spark", "ing", "the", "s")
    val df = Seq((1L, "hello sparking the zq")).toDF("id", "text")
    val out = df.select(Text.greedyPieces(col("text"), vocab).as("p"))
      .collect().head.getSeq[String](0)
    // "zq": no piece matches -> per-char fallback
    assert(out === Seq("he", "llo", "spark", "ing", "the", "z", "q"))
  }

  test("greedyPieces: longest match wins over shorter prefixes") {
    val vocab = Seq("a", "ab", "abc", "d")
    val out = Seq(Tuple1("abcd")).toDF("text")
      .select(Text.greedyPieces(col("text"), vocab).as("p"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("abc", "d"))
  }

  test("greedyPiecesTrie is piece-identical to the fold formulation") {
    val vocab = Seq("he", "llo", "spark", "ing", "the", "s", "a", "ab",
      "abc", "x", "für", "fü", "naï", "中", "中文", "😀")
    val texts = Seq(
      "hello sparking the zq", "abcd abcabc", "xxxxxx xxxxxxxxxxxxxxxxxxxx",
      "für naïve 中文中文 😀😀q mixed", "", "   ",
      "ß upper ẞ", "longwordwithnopieces")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    Seq(true, false).foreach { codegen =>
      withSqlConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" ->
          (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        val bad = df.filter(
          Text.greedyPiecesTrie(col("text"), vocab, maxPiecesPerWord = 5)
            =!= Text.greedyPieces(col("text"), vocab, maxPiecesPerWord = 5))
          .count()
        assert(bad === 0)
      }
    }
  }

  test("greedyPiecesTrie: 10k-piece vocabulary matches an independent replay") {
    // exactly 10,000 distinct pieces: all strings over "abcdef" in
    // length order (every length-1..5 string, then 670 length-6) — the
    // production-vocab scale the fold formulation cannot touch
    val alphabet = "abcdef"
    val vocab = Iterator.iterate(Seq("")) { prev =>
      prev.flatMap(p => alphabet.map(c => p + c))
    }.drop(1).flatten.take(10000).toSeq
    assert(vocab.size === 10000 && vocab.distinct.size === 10000)
    val vs = vocab.toSet
    // independent Scala replay of the greedy rule (longest prefix in
    // vocab, 1-char fallback, 16-piece cap per word)
    def ref(text: String): Seq[String] =
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var pos = 0
        var steps = 0
        while (pos < w.length && steps < 16) {
          val end = (w.length to (pos + 1) by -1)
            .find(e => vs.contains(w.substring(pos, e))).getOrElse(pos + 1)
          out += w.substring(pos, end)
          pos = end
          steps += 1
        }
        out.toSeq
      }
    // 'z' never appears in any piece -> exercises the fallback; word
    // lengths up to 40 exercise the 16-piece cap
    val rnd = new scala.util.Random(42)
    val texts = (0 until 80).map { _ =>
      (0 until 8).map { _ =>
        val len = 1 + rnd.nextInt(40)
        (0 until len).map(_ => "abcdefz"(rnd.nextInt(7))).mkString
      }.mkString(" ")
    }
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), Text.greedyPiecesTrie(col("text"), vocab).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === ref(t), s"doc $i diverged")
    }
  }

  test("greedyPieces truncates at maxPiecesPerWord; empty text is empty") {
    val vocab = Seq("x")
    val out = Seq(Tuple1("xxxxxx")).toDF("text")
      .select(Text.greedyPieces(col("text"), vocab, maxPiecesPerWord = 4)
        .as("p")).collect().head.getSeq[String](0)
    assert(out === Seq("x", "x", "x", "x"))
    val empty = Seq(Tuple1("   ")).toDF("text")
      .select(Text.greedyPieces(col("text"), vocab).as("p"))
      .collect().head.getSeq[String](0)
    assert(empty.isEmpty)
  }

  // ----------------------------------------------- incremental dedup

  test("pairsAgainstIndex finds store collisions and classifies exact") {
    val store = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "completely different store content here")).toDF("id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // exact copy of 1
      (11L, "unrelated fresh arrival text")).toDF("id", "text")
    val idx = Dedup.minhashIndex(store, "text", "id")
    val pairs = Dedup.pairsAgainstIndex(batch, "text", "id", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(pairs.contains((1L, 10L, true)))
    assert(!pairs.exists(_._2 == 11L))
  }

  test("admitAgainstIndex: store hit and in-batch lowest-id both suppress") {
    val store = Seq((1L, "the quick brown fox jumps over fences daily"))
      .toDF("id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over fences daily"), // hits store
      (11L, "novel content one two three four five six"),
      (12L, "novel content one two three four five six"),   // loses to 11
      (13L, "another singleton that collides with nothing"))
      .toDF("id", "text")
    val idx = Dedup.minhashIndex(store, "text", "id")
    val adm = Dedup.admitAgainstIndex(batch, "text", "id", idx)
      .select("id").as[Long].collect().toSet
    assert(adm === Set(11L, 13L))
  }

  test("null-text docs never band, always admit; short texts still dedup") {
    // two NULL-text docs straddling the store/batch split: their
    // minhash is undefined, so — like the SQL replay where their
    // band_hash is NULL and never equi-joins — they produce NO index
    // rows, NO pairs, and are always admitted. Short non-null texts
    // take the whole-text shingle fallback on both engines and dedup
    // normally.
    val store = Seq((1L, null: String), (2L, "tiny"),
      (3L, "real store document with plenty of words here"))
      .toDF("id", "text")
    val batch = Seq((10L, null: String), (11L, "tiny"),
      (12L, "real store document with plenty of words here"))
      .toDF("id", "text")
    val idx = Dedup.minhashIndex(store, "text", "id")
    assert(idx.where(col("id") === 1L).count() === 0)
    assert(idx.where(col("id") === 2L).count() > 0)
    val pairs = Dedup.pairsAgainstIndex(batch, "text", "id", idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((2L, 11L), (3L, 12L)))
    val adm = Dedup.admitAgainstIndex(batch, "text", "id", idx)
      .select("id").as[Long].collect().toSet
    assert(adm === Set(10L))
    // same contract in the batch pair op: the nulls pair with nothing,
    // including each other
    val selfPairs = Dedup.minhashCandidatePairs(
        store.unionByName(batch), "text", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(selfPairs === Set((2L, 11L), (3L, 12L)))
  }

  // ---------------------------------------------------------- training

  test("trainLinear replays the exact GD recurrence (binary fractions)") {
    // one indicative bucket per class: every update is an exact binary
    // fraction, so the recurrence is checkable to the last bit
    val feats = Seq((1L, 0, 1.0), (2L, 1, 1.0)).toDF("doc_id", "bucket", "cnt")
    val labels = Seq((1L, 1.0), (2L, 0.0)).toDF("doc_id", "y")
    val w = Learning.trainLinear(feats, labels, buckets = 2, lr = 0.5,
      iters = 3)
    // w0: 0 -> .5*(1/2)= .25 -> +.5*(.75/2)= .4375 -> +.5*(.5625/2)
    assert(w(0) === 0.578125)
    assert(w(1) === 0.0)
    val before = Learning.mse(feats, labels, Array(0.0, 0.0))
    val after = Learning.mse(feats, labels, w)
    assert(after < before)
  }

  test("trainLinearDist matches the array recurrence bit-for-bit") {
    val feats = Seq((1L, 0, 1.0), (2L, 1, 1.0)).toDF("doc_id", "bucket", "cnt")
    val labels = Seq((1L, 1.0), (2L, 0.0)).toDF("doc_id", "y")
    val wArr = Learning.trainLinear(feats, labels, buckets = 2, lr = 0.5,
      iters = 3)
    val wDf = Learning.trainLinearDist(feats, labels, buckets = 2,
        lr = 0.5, iters = 3)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(wDf(0) === wArr(0) && wDf(1) === wArr(1))
  }

  test("applyLinear scores identically to the row-local scorer") {
    // exact binary-fraction weights: summation order cannot move the
    // double, so the broadcast-join path must equal the fold exactly
    val weights = (0 until 16).map(i => ((i * 5 + 3) % 9 - 4) / 8.0)
    val bias = 0.25
    val docs = Seq((1L, "alpha beta beta gamma"), (2L, "one two"),
      (3L, "alpha alpha alpha alpha")).toDF("doc_id", "text")
    val viaJoin = Learning.applyLinear(
        Learning.hashedFeatures(docs, "doc_id", "text", weights.length),
        Learning.weightsDf(spark, weights), bias)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaFold = docs.select(col("doc_id"),
        Text.hashedLinearScore(col("text"), weights, bias).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaJoin === viaFold)
  }

  test("hashedFeatures counts tokens per md5 bucket") {
    val docs = Seq((1L, "alpha alpha beta")).toDF("id", "text")
    val f = Learning.hashedFeatures(docs, "id", "text", 64).collect()
      .map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(f.values.sum === 3.0)
    assert(f.values.toSeq.sorted === Seq(1.0, 2.0)) // alpha=2, beta=1
  }

  // --------------------------------------------------------------- PCA

  test("gram matrix is symmetric and matches a hand computation") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f)), Tuple1(Array(3.0f, 4.0f)))
      .toDF("emb")
    val g = Similarity.gram(df, "emb", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(g((0, 0)) === 10.0) // 1 + 9
    assert(g((1, 1)) === 20.0) // 4 + 16
    assert(g((0, 1)) === 14.0) // 2 + 12
    assert(g((0, 1)) === g((1, 0)))
  }

  test("topPrincipalComponent recovers a dominant axis") {
    // vectors clustered along (3,4)/5 with a tiny orthogonal wiggle
    val base = Array(0.6f, 0.8f)
    val df = Seq(
      Tuple1(base.map(_ * 2f)), Tuple1(base.map(_ * -3f)),
      Tuple1(Array(0.61f, 0.79f)), Tuple1(Array(-0.8f * 0.01f, 0.6f * 0.01f))
    ).toDF("emb")
    val (e, lam) = Similarity.topPrincipalComponent(df, "emb", 2, 20)
    val alignment = math.abs(e(0) * 0.6 + e(1) * 0.8)
    assert(alignment > 0.999)
    assert(lam > 0)
    assert(math.abs(e.map(x => x * x).sum - 1.0) < 1e-12) // unit norm
  }

  test("topPrincipalComponents: deflation yields orthogonal components") {
    // two clearly separated variance directions
    val df = Seq(
      Tuple1(Array(10f, 0f, 0f)), Tuple1(Array(-9f, 0f, 0f)),
      Tuple1(Array(0f, 3f, 0f)), Tuple1(Array(0f, -3.1f, 0f)),
      Tuple1(Array(0f, 0f, 0.5f))).toDF("emb")
    val comps = Similarity.topPrincipalComponents(df, "emb", 3, 30, k = 2)
    val (e1, l1) = comps(0)
    val (e2, l2) = comps(1)
    assert(math.abs(e1(0)) > 0.999) // x-axis dominates
    assert(math.abs(e2(1)) > 0.999) // y-axis second
    assert(l1 > l2 && l2 > 0)
    val dot = e1.zip(e2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6)
  }

  // --------------------------------------------------------------- RRF

  test("rrfFuse combines ranks; docs missing from one list contribute 0") {
    val lex = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("id", "score")
    val sem = Seq((2L, 0.9), (4L, 0.8)).toDF("id", "score")
    val out = Retrieval.rrfFuse(lex, sem, "id", "score", depth = 10, k0 = 60)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))).toMap
    def rrf(r: Long) = 1.0 / (60 + r)
    assert(out(1L)._1 === Some(1L) && out(1L)._2 === None)
    assert(math.abs(out(1L)._3 - rrf(1)) < 1e-6)
    assert(out(2L)._1 === Some(2L) && out(2L)._2 === Some(1L))
    assert(math.abs(out(2L)._3 - (rrf(2) + rrf(1))) < 1e-6)
    assert(out(4L)._1 === None && out(4L)._2 === Some(2L))
    // doc 2 (in both lists) outranks everything
    val best = out.maxBy(_._2._3)._1
    assert(best === 2L)
  }

  test("rrfFuse truncates each list to depth before fusing") {
    val lex = (1L to 50L).map(i => (i, 100.0 - i)).toDF("id", "score")
    val sem = Seq((49L, 0.5)).toDF("id", "score")
    val out = Retrieval.rrfFuse(lex, sem, "id", "score", depth = 10)
      .collect().map(r => r.getLong(0)).toSet
    // lex ranks 11..50 are cut; 49 survives only via the sem list
    assert(out === ((1L to 10L).toSet + 49L))
  }
}
