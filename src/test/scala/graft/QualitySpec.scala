package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Scale, Similarity, Text, Warehouse}

/** Unit coverage for the quality-filter / maintenance ops behind
  * q117-q122: tokenLines chunking, line-dup stats, script profile,
  * Gopher stats edge cases, int8 quantization round-trip, two-phase
  * distinct and aggregate-delta merge. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ tokenLines

  test("tokenLines chunks tokens into fixed-width space-joined lines") {
    val df = Seq("a b c d e f g").toDF("t")
      .select(Text.tokenLines(Text.tokens(col("t")), 3).as("l"))
    assert(rows(df).head.head == Seq("a b c", "d e f", "g"))
  }

  test("tokenLines on empty text yields an empty line array") {
    val df = Seq("", "   ").toDF("t")
      .select(size(Text.tokenLines(Text.tokens(col("t")), 3)).as("n"))
    assert(rows(df).flatten == Seq(0, 0))
  }

  // ---------------------------------------------------------- lineDupStats

  test("lineDupStats counts repeated lines and their characters") {
    val df = Seq(Seq("aa", "bb", "aa", "cc", "aa")).toDF("lines")
      .select(Text.lineDupStats(col("lines")).as("st"))
      .select("st.n_lines", "st.dup_line_frac", "st.dup_char_frac")
    val Seq(n, lf, cf) = rows(df).head
    assert(n == 5L)
    assert(lf == 0.4) // 2 of 5 lines repeat an earlier line
    assert(cf == 4.0 / 10.0) // 4 of 10 chars are inside repeats
  }

  test("lineDupStats on no-dup and empty arrays is all zeros") {
    val df = Seq(Seq("a", "b"), Seq.empty[String]).toDF("lines")
      .select(Text.lineDupStats(col("lines")).as("st"))
      .select("st.dup_line_frac", "st.dup_char_frac")
    assert(rows(df) == Seq(Seq(0.0, 0.0), Seq(0.0, 0.0)))
  }

  // --------------------------------------------------------- scriptProfile

  test("scriptProfile fractions sum to 1 and spot mojibake") {
    val df = Seq("ab 12.�…").toDF("t")
      .select(Text.scriptProfile(col("t")).as("p"))
      .select("p.n_chars", "p.latin_frac", "p.digit_frac", "p.space_frac",
        "p.punct_frac", "p.non_ascii_frac", "p.n_replacement")
    val Seq(n, lat, dig, sp, pu, na, rep) = rows(df).head
    assert(n == 8L)
    assert(lat == 2.0 / 8 && dig == 2.0 / 8 && sp == 1.0 / 8)
    assert(pu == 1.0 / 8) // the '.'
    assert(na == 2.0 / 8) // U+FFFD + U+2026
    assert(rep == 1L)
  }

  test("scriptProfile is null-safe") {
    val df = strDf("t", Seq(None))
      .select(Text.scriptProfile(col("t")).as("p"))
      .select("p.n_chars", "p.latin_frac")
    assert(rows(df).head == Seq(0L, 0.0))
  }

  // ----------------------------------------------------------- gopherStats

  test("gopherStats passes clean prose and fails a word-count runt") {
    val good = (("the quick brown fox jumps over a lazy dog and " * 5) +
      "it is this that was for on with as at by").trim
    val df = Seq(good, "tiny doc").toDF("t")
      .select(Curation.gopherStats(col("t"),
        Text.tokenLines(Text.tokens(col("t")), 6)).as("g"))
      .select("g.n_words", "g.pass")
    val out = rows(df)
    assert(out.head(1) == true)
    assert(out(1) == Seq(2L, false))
  }

  test("gopherStats flags bullet-heavy and symbol-heavy documents") {
    val bullets = Seq.fill(40)("- item listed here").mkString(" \n ")
    val hashy = ("tag " * 40).trim + " " + ("# " * 30).trim
    val df = Seq(bullets, hashy).toDF("t")
      .select(Curation.gopherStats(col("t"),
        split(col("t"), "\\s*\\n\\s*")).as("g"))
      .select("g.bullet_line_frac", "g.symbol_word_ratio", "g.pass")
    val out = rows(df)
    assert(out.head.head == 1.0 && out.head(2) == false)
    assert(out(1)(1).asInstanceOf[Double] > 0.1 && out(1)(2) == false)
  }

  // --------------------------------------------------------- quantizeInt8

  test("int8 quantization reconstructs within one quantization step") {
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
        (2L, Seq(12.7f, -12.7f, 6.35f, 0.1f)))
      .toDF("id", "v")
      .select(col("id"), transform(col("v"), _.cast("double")).as("xd"),
        Similarity.quantizeInt8(col("v")).as("qz"))
      .select(col("id"), col("qz.scale").as("scale"),
        aggregate(zip_with(col("xd"), Similarity.dequantizeInt8(col("qz")),
          (a, b) => abs(a - b)), lit(0.0), (m, e) => greatest(m, e))
          .as("err"),
        aggregate(col("qz.q"), lit(true),
          (ok, q) => ok && q >= -127.0 && q <= 127.0 && q === floor(q))
          .as("integral"))
    rows(df).foreach { case Seq(_, scale: Double, err: Double, ok) =>
      assert(err <= scale / 2 + 1e-12) // nearest-step rounding
      assert(ok == true)
    }
  }

  test("quantizeInt8 of a zero vector yields null steps, not a crash") {
    val df = Seq(Seq(0.0f, 0.0f)).toDF("v")
      .select(Similarity.quantizeInt8(col("v")).getField("q").as("q"))
    assert(rows(df).head.head.asInstanceOf[Iterable[_]].forall(_ == null))
  }

  // -------------------------------------------- twoPhaseDistinctCount

  test("twoPhaseDistinctCount equals countDistinct") {
    val df = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 9), ("b", 9))
      .toDF("k", "v")
    val got = Scale.twoPhaseDistinctCount(df, Seq("k"), "v", "n")
    assert(rows(got.orderBy("k")) == Seq(Seq("a", 2L), Seq("b", 1L)))
  }

  // --------------------------------------------------- mergeAggDelta

  test("mergeAggDelta equals a full recompute, including one-sided keys") {
    val base = Seq(("a", 2L, 10.0), ("b", 1L, 5.0)).toDF("k", "n", "s")
    val delta = Seq(("b", 3L, 7.0), ("c", 1L, 1.0)).toDF("k", "n", "s")
    val got = Warehouse.mergeAggDelta(base, delta, Seq("k"), Seq("n", "s"))
    assert(rows(got.select("k", "n", "s").orderBy("k")) ==
      Seq(Seq("a", 2L, 10.0), Seq("b", 4L, 12.0), Seq("c", 1L, 1.0)))
  }
}
