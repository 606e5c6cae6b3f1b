package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainBpe learns the expected merges on a hand-checkable corpus") {
    // "aa" appears 3x in "aaaa"-heavy words: pair (a,a) dominates,
    // then (aa,aa) chains onto the first merge's output
    val docs = Seq(
      (1L, "aaaa aaaa ab"),
      (2L, "aaaa cd")).toDF("doc_id", "text")
    val rules = Bpe.trainBpe(docs, "text", 3)
    // pair counts over {aaaa:3, ab:1, cd:1}: (a,a) = 3 words x 3
    // positions = 9 -> merge 1 = aa; then each aaaa is [aa,aa]:
    // (aa,aa) = 3 -> merge 2 = aaaa; remaining pairs (a,b) and (c,d)
    // tie at 1 -> lexicographic tie-break picks (a,b)
    assert(rules.map(r => (r.left, r.right, r.merged)) === Seq(
      ("a", "a", "aa"), ("aa", "aa", "aaaa"), ("a", "b", "ab")))
    assert(rules.map(_.pair_count) === Seq(9L, 3L, 1L))
  }

  test("merge pass is greedy left-to-right non-overlapping") {
    // [a,a,a] under (a,a) must become [aa,a] — not [a,aa] and not a
    // double-merge; the packed-replace formulation guarantees it
    val df = Seq(Tuple1("aaa bbbb")).toDF("text")
    val rules = Seq(Bpe.MergeRule(1, "a", "a", "aa", 0L),
      Bpe.MergeRule(2, "b", "b", "bb", 0L))
    val out = df.select(Bpe.encode(col("text"), rules).as("p"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("aa", "a", "bb", "bb"))
  }

  test("encode applies merges in adoption order, not longest-match") {
    // rules: (a,b)->ab then (ab,c)->abc. Greedy longest-match against
    // the vocab {ab, abc} would also give abc — but order matters when
    // an EARLIER merge consumes what a later one needs: with (b,c)
    // adopted first, "abc" becomes [a, bc] even though ab is a rule
    val df = Seq(Tuple1("abc")).toDF("text")
    val orderA = Seq(Bpe.MergeRule(1, "a", "b", "ab", 0L),
      Bpe.MergeRule(2, "ab", "c", "abc", 0L))
    val orderB = Seq(Bpe.MergeRule(1, "b", "c", "bc", 0L),
      Bpe.MergeRule(2, "a", "b", "ab", 0L))
    def enc(rules: Seq[Bpe.MergeRule]) =
      df.select(Bpe.encode(col("text"), rules).as("p"))
        .collect().head.getSeq[String](0)
    assert(enc(orderA) === Seq("abc"))
    assert(enc(orderB) === Seq("a", "bc"))
  }

  test("encode passes non-alphanumeric tokens through unsegmented") {
    val df = Seq(Tuple1("aa für c++")).toDF("text")
    val rules = Seq(Bpe.MergeRule(1, "a", "a", "aa", 0L))
    val out = df.select(Bpe.encode(col("text"), rules).as("p"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("aa", "für", "c++"))
  }

  test("wordHistogram filters to [a-z0-9]+ and lowercases") {
    val docs = Seq((1L, "The THE c++ data9 für")).toDF("doc_id", "text")
    val h = Bpe.wordHistogram(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(h === Map("the" -> 2L, "data9" -> 1L))
  }

  test("encodeFast (rank-map expression) is piece-identical to the replace chain") {
    // a trained table (the validity condition the min-rank loop's
    // equivalence rests on) over a corpus with chained merges
    val corpus = Seq(
      (1L, "aaaa aaaa aaab the the then there"),
      (2L, "data data base database for c++")).toDF("doc_id", "text")
    val rules = Bpe.trainBpe(corpus, "text", 12)
    assert(rules.size === 12)
    val probe = corpus.unionByName(Seq(
      (3L, "unseen aaaathe dataaaa"),          // fresh combinations
      (4L, "für 中文 x"), (5L, "   "), (6L, "aab")).toDF("doc_id", "text"))
    Seq(true, false).foreach { codegen =>
      withSqlConf("spark.sql.codegen.wholeStage" -> codegen.toString,
        "spark.sql.codegen.factoryMode" ->
          (if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")) {
        val bad = probe.filter(
          Bpe.encodeFast(col("text"), rules)
            =!= Bpe.encode(col("text"), rules)).count()
        assert(bad === 0)
      }
    }
  }

  test("encodeFast plan size is independent of the rule count") {
    // 6 rules vs 120 rules: the replace chain grows per rule, the
    // rank-map expression does not — its plan string stays put
    val corpus = Seq((1L, ("ab " * 40) + ("abc " * 20) + "abcd abcde"))
      .toDF("doc_id", "text")
    val few = Bpe.trainBpe(corpus, "text", 3)
    val wide = (0 until 120).map { i =>
      Bpe.MergeRule(i + 1, s"x${i % 10}", s"y${i / 10}", s"x${i % 10}y${i / 10}", 0L)
    }
    def planLen(rules: Seq[Bpe.MergeRule]) =
      corpus.select(Bpe.encodeFast(col("text"), rules).as("p"))
        .queryExecution.optimizedPlan.toString.length
    val ratio = planLen(wide).toDouble / planLen(few)
    assert(ratio < 1.5, s"plan grew with rule count: ratio $ratio")
  }

  test("empty rule table: both paths fall back to per-char pieces") {
    val df = Seq(Tuple1("abc de")).toDF("text")
    def out(c: org.apache.spark.sql.Column) =
      df.select(c.as("p")).collect().head.getSeq[String](0)
    val expected = Seq("a", "b", "c", "d", "e")
    assert(out(Bpe.encode(col("text"), Nil)) === expected)
    assert(out(Bpe.encodeFast(col("text"), Nil)) === expected)
  }

  test("empty and null texts encode to empty piece arrays") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val rules = Seq(Bpe.MergeRule(1, "a", "a", "aa", 0L))
    val out = df.select(size(Bpe.encode(col("text"), rules)).as("n"))
      .collect().map(_.getInt(0))
    assert(out === Seq(0, 0))
  }
}
