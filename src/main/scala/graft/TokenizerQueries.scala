package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Bpe, UnigramLm}

/** Tokenizer-training queries: in-engine BPE merge learning (q165) and
  * encoding under the learned merges (q166). Registered through
  * SparkEntry; the DuckDB oracles replay the full training loop — word
  * histogram, per-iteration weighted pair counts, argmax adoption and
  * the packed-string merge pass — as an unrolled MATERIALIZED-CTE
  * chain, then (q166) re-encode every document with the same rules.
  */
object TokenizerQueries {

  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.t(s, dir, name)

  /** Merge count for the oracle-checked queries: enough to exercise
    * multi-char merge chaining (later merges consume earlier merged
    * symbols), small enough that the unrolled SQL stays readable. */
  private val NumMerges = 6

  /** q175 unigram-LM training bounds: head-of-histogram vocabulary,
    * word-truncation length, max piece length, top-piece count. The
    * word length bound also caps the oracle's path enumeration
    * (compositions of 12 into parts ≤ 4 = 1705 paths/word). */
  private val UniWords = 500
  private val UniWordLen = 12
  private val UniPieceLen = 4
  private val UniPieces = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Learn the BPE merge table from the documents corpus: the
    // training side of subword tokenization (q159 is inference).
    // Trains on the word histogram — corpus touched once.
    "q165_bpe_train" -> ((s, dir) => {
      import s.implicits._
      val docs = rd(s, dir, "documents").where(col("text").isNotNull)
      Bpe.trainBpe(docs, "text", NumMerges)
        .toDF()
        .select(col("merge_idx"), col("left").as("lhs"),
          col("right").as("rhs"), col("merged"), col("pair_count"))
        .orderBy("merge_idx")
    }),

    // Encode every document with the learned merges (BPE inference:
    // merges apply in adoption order) — real piece counts plus the
    // full segmentation string, both oracle-compared.
    "q166_bpe_encode" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").where(col("text").isNotNull)
      val rules = Bpe.trainBpe(docs, "text", NumMerges)
      // rank-map expression path; BpeSpec separately asserts it is
      // piece-identical to the replace-chain Bpe.encode
      docs
        .withColumn("__p", Bpe.encodeFast(col("text"), rules))
        .select(col("doc_id"),
          size(col("__p")).cast("long").as("n_pieces"),
          array_join(col("__p"), " ").as("segmented"))
        .orderBy("doc_id")
    }),

    // Unigram-LM (SentencePiece-style) tokenizer training, hard-EM:
    // frequency-scored candidate pieces, Viterbi segmentation of the
    // head word histogram, usage-renormalized probabilities. Closes
    // the tokenizer family (BPE train/encode, WordPiece inference,
    // unigram train). Oracle enumerates every segmentation of every
    // head word via a recursive CTE and argmaxes with the same
    // (logp desc, path asc) total order the DP fold uses.
    "q175_unigram_lm" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").where(col("text").isNotNull)
      UnigramLm.trainUnigram(Bpe.wordHistogram(docs, "text"),
        vocabWords = UniWords, maxWordLen = UniWordLen,
        maxPieceLen = UniPieceLen, topPieces = UniPieces)
    }),

    // Unigram-LM encoding (inference half of q175, as q166 is to
    // q165): every document token Viterbi-segmented under the trained
    // piece probabilities, uncoverable words -> <unk>. The DP runs per
    // DISTINCT word, then broadcast-joins back to the token stream.
    "q176_unigram_encode" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").where(col("text").isNotNull)
      val plog = UnigramLm.trainedPieceLogProbs(
        Bpe.wordHistogram(docs, "text"), UniWords, UniWordLen,
        UniPieceLen, UniPieces)
      UnigramLm.encodeDocs(docs, "text", "doc_id", plog,
          maxWordLen = UniWordLen, maxPieceLen = UniPieceLen)
        .orderBy("doc_id")
    })
  )

  // ----------------------------------------------------------- oracle SQL

  /** Tokens SQL mirroring Text.tokens (same shape as the other query
    * families' generators). */
  private def toksSql(e: String): String =
    raw"""list_filter(string_split_regex(lower(trim($e)), '\s+'), x -> x <> '')"""

  /** Shared training CTE chain: word histogram `h`, packed initial
    * states `v0`, then per merge k: weighted pair counts `p_k` over
    * `v_(k-1)`, argmax `m_k`, merged states `v_k`. The packed form
    * ("##a##b##c##") makes one merge pass a plain `replace` of
    * '#a##b#' with '#ab#' — identical left-to-right non-overlapping
    * semantics in DuckDB and Spark, no regex. */
  private def trainSql: String = {
    val steps = (1 to NumMerges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT a, b, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT h.cnt, h.syms[i] AS a, h.syms[i + 1] AS b
         |    FROM (SELECT cnt,
         |            list_filter(string_split(st, '##'), x -> x <> '') AS syms
         |          FROM v${k - 1}) h,
         |         UNNEST(range(1, len(h.syms))) AS u(i))
         |  GROUP BY a, b),
         |m$k AS MATERIALIZED (
         |  SELECT a, b, c FROM p$k ORDER BY c DESC, a, b LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT word, cnt,
         |    replace(st,
         |      '#' || (SELECT a FROM m$k) || '##' || (SELECT b FROM m$k) || '#',
         |      '#' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || '#') AS st
         |  FROM v${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH h AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(${toksSql("text")}) AS word
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |  GROUP BY word),
       |v0 AS MATERIALIZED (
       |  SELECT word, cnt,
       |    '##' || regexp_replace(word, '(.)', '\\1##', 'g') AS st
       |  FROM h),
       |$steps""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q165_bpe_train" -> {
      val rows = (1 to NumMerges).map { k =>
        s"SELECT $k AS merge_idx, a AS lhs, b AS rhs, a || b AS merged, c AS pair_count FROM m$k"
      }.mkString("\n  UNION ALL ")
      s"""$trainSql
         |SELECT * FROM (
         |  $rows)
         |ORDER BY merge_idx""".stripMargin
    },

    "q166_bpe_encode" -> {
      // the merge rules cross-join in as plain columns (one row each)
      // so the per-token lambda can reference them; ENC folds the
      // packed state through the merges in adoption order, and the
      // piece string of a packed state is trim-#s + '##'->' '
      val ruleCols = (1 to NumMerges).map { k =>
        s"r$k AS (SELECT a AS a$k, b AS b$k FROM m$k)"
      }.mkString(",\n")
      val enc = (1 to NumMerges).foldLeft(
        raw"'##' || regexp_replace(tok, '(.)', '\1##', 'g')") { (e, k) =>
        s"replace($e, '#' || a$k || '##' || b$k || '#', '#' || a$k || b$k || '#')"
      }
      s"""$trainSql,
         |$ruleCols
         |SELECT doc_id,
         |  CAST(len(list_filter(string_split(segmented, ' '), x -> x <> ''))
         |    AS BIGINT) AS n_pieces,
         |  segmented
         |FROM (
         |  SELECT doc_id,
         |    array_to_string(list_transform(${toksSql("text")}, tok ->
         |      CASE WHEN regexp_matches(tok, '^[a-z0-9]+$$')
         |        THEN replace(trim($enc, '#'), '##', ' ')
         |        ELSE tok END), ' ') AS segmented
         |  FROM documents
         |    CROSS JOIN ${(1 to NumMerges).map(k => s"r$k").mkString(" CROSS JOIN ")}
         |  WHERE text IS NOT NULL)
         |ORDER BY doc_id""".stripMargin
    },

    "q175_unigram_lm" ->
      s"""WITH RECURSIVE $uniTrainSql,
         |${uniViterbiSql("tw")},
         |best AS (
         |  SELECT wb.word, tw.cnt, wb.path FROM wbest wb
         |  JOIN tw ON tw.word = wb.word),
         |usage AS (
         |  SELECT u.piece, CAST(sum(b.cnt) AS BIGINT) AS usage
         |  FROM best b, UNNEST(string_split(b.path, ' ')) AS u(piece)
         |  GROUP BY u.piece),
         |tu AS (SELECT CAST(sum(usage) AS DOUBLE) AS tu FROM usage)
         |SELECT piece, usage, round(usage / tu, 6) AS prob
         |FROM usage, tu ORDER BY usage DESC, piece""".stripMargin,

    "q176_unigram_encode" ->
      s"""WITH RECURSIVE $uniTrainSql,
         |dtok AS (
         |  SELECT d.doc_id, ui.i,
         |         substr(d.t[ui.i], 1, $UniWordLen) AS word
         |  FROM (SELECT doc_id, ${toksSql("text")} AS t
         |        FROM documents WHERE text IS NOT NULL) d,
         |       UNNEST(generate_series(1, len(d.t))) AS ui(i)),
         |dw AS (SELECT DISTINCT word FROM dtok),
         |${uniViterbiSql("dw")},
         |wseg AS (
         |  SELECT dw.word, coalesce(wb.path, '<unk>') AS path
         |  FROM dw LEFT JOIN wbest wb ON wb.word = dw.word)
         |SELECT doc_id,
         |  CAST(sum(len(string_split(path, ' '))) AS BIGINT) AS n_pieces,
         |  string_agg(path, ' ' ORDER BY i) AS segmented
         |FROM dtok JOIN wseg USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )

  /** Shared q175/q176 training CTEs: word histogram `h`, truncated
    * head `tw`, candidate pieces `ps`, log-probs `plog`. */
  private def uniTrainSql: String =
    s"""h AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(${toksSql("text")}) AS word
       |    FROM documents WHERE text IS NOT NULL)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |  GROUP BY word),
       |tw AS (
       |  SELECT word, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
       |    SELECT substr(word, 1, $UniWordLen) AS word, cnt FROM (
       |      SELECT word, cnt FROM h
       |      ORDER BY cnt DESC, word LIMIT $UniWords))
       |  GROUP BY word),
       |occ AS (
       |  SELECT t.cnt, substr(t.word, ue.e - ul.l + 1, ul.l) AS piece
       |  FROM tw t,
       |       UNNEST(range(1, len(t.word) + 1)) AS ue(e),
       |       UNNEST(range(1, least($UniPieceLen, ue.e) + 1)) AS ul(l)),
       |freq AS (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq
       |         FROM occ GROUP BY piece),
       |ps AS (SELECT DISTINCT piece, freq FROM (
       |  SELECT piece, freq FROM
       |    (SELECT piece, freq FROM freq
       |     ORDER BY freq DESC, piece LIMIT $UniPieces)
       |  UNION ALL
       |  SELECT piece, freq FROM freq WHERE len(piece) = 1)),
       |tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS totf FROM ps),
       |plog AS (SELECT piece, ln(freq / totf) AS lp FROM ps, tot)"""
      .stripMargin

  /** Viterbi-by-enumeration over the words of CTE `src` (one `word`
    * column): recursive path expansion against `plog`, argmax per word
    * with the (lp desc, path asc) total order the Spark DP uses →
    * `wbest(word, path)`. Words the piece set cannot cover simply
    * produce no full path (callers LEFT JOIN for the unk fallback). */
  private def uniViterbiSql(src: String): String =
    s"""cand AS (
       |  SELECT c.word, c.e, c.l, c.piece, p.lp FROM (
       |    SELECT t.word, ue.e AS e, ul.l AS l,
       |           substr(t.word, ue.e - ul.l + 1, ul.l) AS piece
       |    FROM $src t,
       |         UNNEST(range(1, len(t.word) + 1)) AS ue(e),
       |         UNNEST(range(1, least($UniPieceLen, ue.e) + 1)) AS ul(l)) c
       |  JOIN plog p ON p.piece = c.piece),
       |paths AS (
       |  SELECT word, 0 AS pos, CAST(0.0 AS DOUBLE) AS lp, '' AS path
       |  FROM $src
       |  UNION ALL
       |  SELECT p.word, c.e AS pos, p.lp + c.lp AS lp,
       |    CASE WHEN p.path = '' THEN c.piece
       |         ELSE p.path || ' ' || c.piece END AS path
       |  FROM paths p
       |  JOIN cand c ON c.word = p.word AND c.e - c.l = p.pos),
       |wbest AS (
       |  SELECT word, path FROM (
       |    SELECT word, path, row_number() OVER (PARTITION BY word
       |      ORDER BY lp DESC, path) AS rk
       |    FROM paths WHERE pos = len(word))
       |  WHERE rk = 1)""".stripMargin
}
