package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bpe, UnigramLm}

/** Unit coverage for unigram-LM tokenizer training (q175). */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi prefers frequent multi-char pieces over singles") {
    // "abab" dominates: piece "ab" outweighs its characters, so the
    // segmentation of every word should use "ab", not 'a'+'b'
    val hist = Seq(("abab", 50L), ("ab", 30L), ("cd", 5L))
      .toDF("word", "cnt")
    val out = rows(UnigramLm.trainUnigram(hist, vocabWords = 10,
      maxWordLen = 12, maxPieceLen = 2, topPieces = 4))
    val usage = out.map(r => r(0) -> r(1).asInstanceOf[Long]).toMap
    // "ab" used twice in abab (cnt 50) and once in ab (cnt 30) = 130
    assert(usage("ab") == 2 * 50 + 30)
    // 'a'/'b' singles never chosen once "ab" exists
    assert(!usage.contains("a") && !usage.contains("b"))
    // cd still covered by singles (cd itself may or may not make the
    // top-4 cut; either way the word is covered)
    assert(usage.getOrElse("cd", 0L) +
      (usage.getOrElse("c", 0L) min usage.getOrElse("d", 0L)) >= 5L)
  }

  test("probabilities renormalize over used pieces") {
    val hist = Seq(("aa", 10L), ("bb", 10L)).toDF("word", "cnt")
    val out = rows(UnigramLm.trainUnigram(hist, vocabWords = 10,
      maxWordLen = 12, maxPieceLen = 2, topPieces = 8))
    val probs = out.map(_(2).asInstanceOf[Double])
    assert(math.abs(probs.sum - 1.0) < 1e-4)
  }

  test("ties break toward the lexicographically smallest segmentation") {
    // "ab" and the singles 'a',''b' all get equal frequency mass when
    // only "ab" (cnt n) exists: freq(ab)=n, freq(a)=n, freq(b)=n, so
    // lp(ab) vs lp(a)+lp(b): single-piece path always wins on lp.
    // Force a true tie instead: two words "xy" and "yx" — segmenting
    // either as singles gives identical lp; the piece pair is the
    // same, so determinism shows in stable output ordering
    val hist = Seq(("xy", 7L), ("yx", 7L)).toDF("word", "cnt")
    val a = rows(UnigramLm.trainUnigram(hist, vocabWords = 10,
      maxWordLen = 12, maxPieceLen = 2, topPieces = 2))
    val b = rows(UnigramLm.trainUnigram(hist.repartition(5), vocabWords = 10,
      maxWordLen = 12, maxPieceLen = 2, topPieces = 2))
    assert(a == b)
  }

  test("encodeDocs segments tokens and falls back to <unk>") {
    val hist = Seq(("abab", 50L), ("ab", 30L)).toDF("word", "cnt")
    val plog = UnigramLm.trainedPieceLogProbs(hist, vocabWords = 10,
      maxWordLen = 12, maxPieceLen = 2, topPieces = 4)
    val docs = Seq((1L, "ab abab"), (2L, "ab zzz")).toDF("doc_id", "text")
    val out = rows(UnigramLm.encodeDocs(docs, "text", "doc_id", plog,
      maxWordLen = 12, maxPieceLen = 2).orderBy("doc_id"))
    // doc 1: "ab" + "ab ab" -> 3 pieces; doc 2: "ab" + <unk> (z is
    // not in the training charset) -> 2 pieces
    assert(out == Seq(Seq(1L, 3L, "ab ab ab"), Seq(2L, 2L, "ab <unk>")))
  }

  test("trains from a real word histogram end to end") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull)
    val out = UnigramLm.trainUnigram(Bpe.wordHistogram(docs, "text"),
      vocabWords = 200, maxWordLen = 12, maxPieceLen = 4,
      topPieces = 48)
    val rs = rows(out)
    assert(rs.nonEmpty)
    // usage mass equals the head words' total count mass only if every
    // piece count is tallied — weaker sanity: probs in (0,1], sum ~1
    val probs = rs.map(_(2).asInstanceOf[Double])
    assert(probs.forall(p => p > 0.0 && p <= 1.0))
    assert(math.abs(probs.sum - 1.0) < 1e-3)
    // multi-char pieces exist (the corpus is english-ish text)
    assert(rs.exists(_(0).asInstanceOf[String].length > 1))
  }
}
