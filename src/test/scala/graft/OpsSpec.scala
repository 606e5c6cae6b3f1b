package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** Unit tests for the core expression library (SURVEY §5.2). */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def levels(url: String): Seq[Any] = {
    val df = Seq(url).toDF("u")
    rows(Urls.withUrlLevels(df, "u").select(
      "root", "directory", "page_level1", "page_level2")).head
  }

  test("full URL decomposes into host + path levels") {
    assert(levels("https://www.x.de/a/b/c") === Seq("www.x.de", "a", "b", "c"))
  }

  test("short URL yields nulls beyond path length") {
    assert(levels("https://www.x.de") === Seq("www.x.de", null, null, null))
    assert(levels("https://www.x.de/a") === Seq("www.x.de", "a", null, null))
  }

  test("trailing slash does not fabricate a segment") {
    assert(levels("https://www.x.de/a/") === Seq("www.x.de", "a", null, null))
  }

  test("null URL yields all-null levels") {
    val df = strDf("u", Seq(None))
    assert(rows(Urls.withUrlLevels(df, "u")
      .select("root", "directory")).head === Seq(null, null))
  }

  test("websiteType: internal vs whitelabel (negative lookahead) vs external") {
    val internal = "https?://www\\.x\\.de.*"
    val wl = "https?://(?!www\\.)[a-zA-Z0-9-]+\\.x\\.de.*"
    val df = Seq("https://www.x.de/p", "https://blog.x.de/p", "https://y.com/p")
      .toDF("u")
    assert(rows(df.select(Urls.websiteType(col("u"), internal, wl)))
      .flatten === Seq("Internal", "Whitelabel", "External"))
  }

  test("doctype: extension match is case-insensitive and query-string-safe") {
    val df = Seq("https://x.de/a.JPG", "https://x.de/a.png?x=1", "https://x.de/a")
      .toDF("u")
    assert(rows(df.select(Urls.doctype(col("u"), Seq("jpg", "png"))))
      .flatten === Seq("Picture", "Picture", "HTML"))
  }
}

class CastsSpec extends SparkSpec {
  import spark.implicits._

  test("localeDecimal parses German decimals, nulls junk") {
    val df = Seq("1.234,56", "12,5", "1.000.000,00", "junk", "").toDF("p")
    assert(rows(df.select(Casts.localeDecimal(col("p")))).flatten ===
      Seq(1234.56, 12.5, 1000000.0, null, null))
  }

  test("coerceLong: junk -> 0, valid -> value (pd.to_numeric coerce+fillna)") {
    val df = Seq("42", "x1", null).toDF("c")
    assert(rows(df.select(Casts.coerceLong(col("c")))).flatten === Seq(42L, 0L, 0L))
  }

  test("fillDouble: null/junk -> 0.0 (intended semantics of quirk Q1)") {
    val df = Seq("1.5", "nope", null).toDF("c")
    assert(rows(df.select(Casts.fillDouble(col("c")))).flatten === Seq(1.5, 0.0, 0.0))
  }

  test("concatSkipNull skips nulls like the reference's notna() filter") {
    val df = Seq((Some("a"), None: Option[String], Some("c"))).toDF("x", "y", "z")
    assert(rows(df.select(Casts.concatSkipNull(", ",
      Seq(col("x"), col("y"), col("z"))))).flatten === Seq("a, c"))
  }

  test("mergeChunkColumns treats null chunks as empty strings") {
    val df = Seq((Some("a"), None: Option[String], Some("c"))).toDF("x", "y", "z")
    assert(rows(df.select(Casts.mergeChunkColumns(
      Seq(col("x"), col("y"), col("z"))))).flatten === Seq("ac"))
  }
}

class NamesSpec extends SparkSpec {
  import spark.implicits._

  test("normalize: whitespace/hyphen/quote -> _, lowercased") {
    assert(Names.normalize("Status Code") === "status_code")
    assert(Names.normalize("Meta-Description 1") === "meta_description_1")
    assert(Names.normalize("""a"b'c""") === "a_b_c")
  }

  test("normalize is idempotent") {
    val names = Seq("Crawl Depth", "Unique-Inlinks", "ok_name", "A  B-C")
    names.foreach(n => assert(Names.normalize(Names.normalize(n)) === Names.normalize(n)))
  }

  test("keepMatching / dropMatching project by column-name regex") {
    val df = Seq((1, 2, 3)).toDF("content_1", "content_2", "other")
    assert(Names.keepMatching(df, "^content_.*").columns.toSeq ===
      Seq("content_1", "content_2"))
    assert(Names.dropMatching(df, "^content_.*").columns.toSeq === Seq("other"))
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Sampling

  test("splitLabel: deterministic, roughly 80/10/10, stable under growth") {
    val ids = (0L until 2000L).toDF("id")
    val counts = ids.select(Sampling.splitLabel(col("id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1450 && counts("train") < 1750) // ~79.7%
    assert(counts("val") > 120 && counts("val") < 300)
    assert(counts("test") > 120 && counts("test") < 300)
    // stability: the same id maps to the same split in a different frame
    val again = Seq(42L).toDF("id")
      .select(Sampling.splitLabel(col("id"))).head().getString(0)
    val first = ids.filter(col("id") === 42L)
      .select(Sampling.splitLabel(col("id"))).head().getString(0)
    assert(again === first)
  }
}

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[A](c: org.apache.spark.sql.Column, text: String): Any =
    rows(Seq(text).toDF("t").select(c)).head.head

  test("tokens lowercases, splits on runs of whitespace, drops empties") {
    assert(one(Text.tokens(col("t")), "  Hello   WORLD  ") === Seq("hello", "world"))
    assert(one(Text.tokenCount(col("t")), "a b  c") === 3)
    assert(one(Text.tokenCount(col("t")), "   ") === 0)
  }

  test("tokenCount of null is 0") {
    assert(rows(strDf("t", Seq(None)).select(Text.tokenCount(col("t"))))
      .head.head === 0)
  }

  test("bpeIshTokenCount: letter runs, digit runs, single punct") {
    assert(one(Text.bpeIshTokenCount(col("t")), "ab12cd, x!") === 6)
  }

  test("stopwordCount matches case-insensitively on word boundaries") {
    assert(one(Text.stopwordCount(col("t")), "The cat and THE hat, band") === 3)
  }

  test("shingles: sliding word n-grams; short docs collapse to one") {
    assert(one(Text.shingles(col("t"), 3), "a b c d") === Seq("a b c", "b c d"))
    assert(one(Text.shingles(col("t"), 3), "a b") === Seq("a b"))
  }

  test("rollingHash is order-SENSITIVE and deterministic") {
    val df = Seq("a b c", "c b a", "a b c", "").toDF("t")
    val hs = rows(df.select(Text.rollingHash(col("t")))).flatten
      .map(_.asInstanceOf[Long])
    assert(hs(0) === hs(2)) // identical text, identical hash
    assert(hs(0) !== hs(1)) // reordered tokens change the hash
    assert(hs(3) === 0L)    // empty text folds to the seed
    assert(hs.forall(h => h >= 0 && h < 2147483647L))
  }

  test("fingerprint is word-order and duplication insensitive") {
    val df = Seq("b a a c", "c b a").toDF("t")
    val fps = rows(df.select(Text.fingerprint(col("t")))).flatten
    assert(fps.head === fps(1))
  }

  test("simhash: identical texts equal, hamming 0; empty text -> 0") {
    val df = Seq("the quick brown fox", "the quick brown fox", "").toDF("t")
    val hs = rows(df.select(Text.simhash(col("t"), 32))).flatten
    assert(hs.head === hs(1))
    assert(hs(2) === 0L)
    val hd = rows(Seq((hs.head.asInstanceOf[Long], hs(1).asInstanceOf[Long]))
      .toDF("a", "b").select(Text.hammingDistance(col("a"), col("b"), 32)))
      .head.head
    assert(hd === 0L)
  }

  test("langId picks the stopword-heaviest language; CJK -> zh") {
    val df = Seq(
      "the cat sat on the mat and it was good",
      "der hund und die katze sind nicht da",
      "中文文本").toDF("t")
    assert(rows(df.select(Text.langId(col("t")))).flatten === Seq("en", "de", "zh"))
  }

  test("langId: zero stopword signal -> unknown, never a default language") {
    val df = Seq("xyzzy plugh qwerty", "Привет мир", "").toDF("t")
    assert(rows(df.select(Text.langId(col("t")))).flatten ===
      Seq("unknown", "unknown", "unknown"))
  }

  test("redactPii replaces emails, URLs and long digit runs globally") {
    val df = Seq("mail a@b.com and c@d.org, see https://x.y/z?q=1 ref 12345678 ok 123")
      .toDF("t")
    val r = rows(df.select(Text.redactPii(col("t")))).head.head
    assert(r === "mail <EMAIL> and <EMAIL>, see <URL> ref <NUM> ok 123")
    assert(rows(df.select(Text.emailCount(col("t")))).head.head === 2)
  }

  test("repetitionRatio: distinct docs score 0, looping docs score high") {
    val df = Seq("a b c d e f g h", "spam spam spam spam spam spam spam").toDF("t")
    val r = rows(df.select(Text.repetitionRatio(col("t"), 3))).flatten
      .map(_.asInstanceOf[Double])
    assert(r(0) === 0.0)
    assert(r(1) > 0.7) // 5 shingles, all "spam spam spam"
  }

  test("qualityScore stays within [0,1]") {
    val df = Seq("", "x", "the quick brown fox jumps over the lazy dog and runs")
      .toDF("t")
    rows(df.select(Text.qualityScore(col("t")))).flatten.foreach { v =>
      val d = v.asInstanceOf[Double]
      assert(d >= 0.0 && d <= 1.0)
    }
  }

  test("topToken: run-length fold picks count-desc, token-asc winner") {
    val df = Seq(
      "b b a a c",   // tie a=2, b=2 -> asc tie-break picks a
      "z z z y",     // clear winner regardless of sort position
      "solo")
      .toDF("t").select(Text.topToken(Text.tokens(col("t"))).as("tt"))
      .select(col("tt.token"), col("tt.n"))
    assert(rows(df) === Seq(Seq("a", 2L), Seq("z", 3L), Seq("solo", 1L)))
  }

  test("topToken of an empty token array is (null, 0)") {
    val df = Seq("   ").toDF("t")
      .select(Text.topToken(Text.tokens(col("t"))).as("tt"))
      .select(col("tt.token"), col("tt.n"))
    assert(rows(df) === Seq(Seq(null, 0L)))
  }

  test("tokenEntropy: 0 for uniform-single, log2(k) for k distinct, exact thirds") {
    val df = Seq("a a a a", "a b c d", "a a b b c c", "").toDF("t")
      .select(Text.tokenEntropy(Text.tokens(col("t"))).as("h"))
    val hs = rows(df).flatten.map(_.asInstanceOf[Double])
    assert(hs(0) === 0.0)              // one symbol -> zero entropy
    assert(math.abs(hs(1) - 2.0) < 1e-12)  // 4 equiprobable -> log2(4)
    assert(math.abs(hs(2) - math.log(3) / math.log(2)) < 1e-12)
    assert(hs(3) === 0.0)              // empty -> 0 by convention
  }
}

class UrlCanonicalSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalize collapses scheme/case/www/query/slash variants") {
    val variants = Seq(
      "HTTPS://WWW.Example.de/Dir/Page",
      "http://example.de/dir/page",
      "https://example.de/dir/page/",
      "https://www.example.de/dir/page?utm_source=x#frag")
    val out = rows(variants.toDF("u")
      .select(Urls.canonicalize(col("u")))).flatten.distinct
    assert(out === Seq("example.de/dir/page"))
  }

  test("canonicalize is idempotent") {
    val df = Seq("https://www.example.de/a/b/?q=1", "example.de/a/b").toDF("u")
    val once = rows(df.select(Urls.canonicalize(col("u"))))
    val twice = rows(df.select(Urls.canonicalize(Urls.canonicalize(col("u")))))
    assert(once === twice)
  }

  test("canonicalize preserves interior www and query-less paths") {
    assert(rows(Seq("https://host.de/www.inner/x").toDF("u")
      .select(Urls.canonicalize(col("u")))).head.head === "host.de/www.inner/x")
  }
}
