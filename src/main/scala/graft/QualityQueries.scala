package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Scale, Similarity, Text, Warehouse}

/** Quality-filter and maintenance queries (q117+): Gopher/MassiveText-
  * style document quality stats, line-level duplication signals,
  * character-script / mojibake profiling, int8 embedding quantization
  * QA, skew-safe distinct counting and incremental aggregate
  * maintenance. Registered through SparkEntry; every entry has a DuckDB
  * oracle.
  *
  * The fixture corpus is single-line ASCII, so the line-shaped queries
  * synthesize deterministic structure in-query (token-chunked pseudo-
  * lines, injected markup/noise) — the same injected-corruption pattern
  * q101 uses. The operators themselves are corpus-agnostic.
  */
object QualityQueries {

  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.t(s, dir, name)

  private val LineW = 6 // tokens per synthesized line (q117)
  private val DupW = 2  // tokens per line for duplication stats (q118)

  /** Pseudo-lines of `width` tokens with deterministic markup: every
    * 5th line (1-based, i%5==1) gets a bullet prefix, every 6th an
    * ellipsis suffix — so the bullet/ellipsis line fractions exercised
    * by q117 are non-degenerate on the markup-free fixture corpus. */
  private def decoratedLines(toks: Column, width: Int): Column =
    transform(Text.tokenLines(toks, width), (l, i) => concat(
      when((i + 1) % 5 === 1, lit("- ")).otherwise(lit("")), l,
      when((i + 1) % 6 === 0, lit("...")).otherwise(lit(""))))

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Gopher-style quality rule pack: word/line shape statistics plus
    // the combined pass verdict, all row-local.
    "q117_gopher_quality" -> ((s, dir) => {
      // tokens and lines are projected ONCE as named columns: the stat
      // struct references each array many times, and lambda-bearing
      // expressions don't CSE — inline they'd re-split the text per
      // reference (measured ~2× the whole query)
      val g = Curation.gopherStatsOfTokens(col("text"), col("__toks"),
        col("__lines"))
      rd(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          Text.tokens(col("text")).as("__toks"))
        .withColumn("__lines", decoratedLines(col("__toks"), LineW))
        .select(col("doc_id"), g.as("g"))
        .select(col("doc_id"),
          col("g.n_words").as("n_words"),
          round(col("g.mean_word_len"), 6).as("mean_word_len"),
          round(col("g.symbol_word_ratio"), 6).as("symbol_word_ratio"),
          round(col("g.bullet_line_frac"), 6).as("bullet_line_frac"),
          round(col("g.ellipsis_line_frac"), 6).as("ellipsis_line_frac"),
          round(col("g.alpha_word_frac"), 6).as("alpha_word_frac"),
          col("g.stop_hits").as("stop_hits"),
          col("g.pass").as("pass"))
        .orderBy("doc_id")
    }),

    // Line-duplication profile (duplicate-line and duplicate-character
    // fractions) over 2-token pseudo-lines — the Gopher repetition
    // signals at line granularity (q54 covers n-gram granularity).
    "q118_line_dedup" -> ((s, dir) => {
      // same projection discipline as q117: the line array feeds five
      // references inside the stat struct
      val st = Text.lineDupStats(col("__lines"))
      rd(s, dir, "documents")
        .select(col("doc_id"),
          Text.tokenLines(Text.tokens(col("text")), DupW).as("__lines"))
        .select(col("doc_id"), st.as("st"))
        .select(col("doc_id"),
          col("st.n_lines").as("n_lines"),
          round(col("st.dup_line_frac"), 6).as("dup_line_frac"),
          round(col("st.dup_char_frac"), 6).as("dup_char_frac"))
        .orderBy("doc_id")
    }),

    // Character-script / encoding-damage profile, with deterministic
    // noise (digits, markup, non-ASCII, U+FFFD) injected into every 7th
    // document so each class is exercised.
    "q119_script_profile" -> ((s, dir) => {
      val noisy = when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" 123 #tag … �")))
        .otherwise(col("text"))
      val p = Text.scriptProfile(noisy)
      rd(s, dir, "documents")
        .select(col("doc_id"), p.as("p"))
        .select(col("doc_id"),
          col("p.n_chars").as("n_chars"),
          round(col("p.latin_frac"), 6).as("latin_frac"),
          round(col("p.digit_frac"), 6).as("digit_frac"),
          round(col("p.space_frac"), 6).as("space_frac"),
          round(col("p.punct_frac"), 6).as("punct_frac"),
          round(col("p.non_ascii_frac"), 6).as("non_ascii_frac"),
          col("p.n_replacement").as("n_replacement"))
        .orderBy("doc_id")
    }),

    // int8 scalar-quantization QA: per-vector scale, cosine between the
    // original and the dequantized reconstruction, and the max absolute
    // element error — the compression-loss audit before serving
    // quantized ANN. Entirely row-local.
    "q120_quantize_int8" -> ((s, dir) => {
      rd(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("__xd"),
          Similarity.quantizeInt8(col("embedding")).as("__qz"))
        .select(col("vec_id"), col("__xd"),
          col("__qz").getField("scale").as("__scale"),
          Similarity.dequantizeInt8(col("__qz")).as("__recon"))
        .select(col("vec_id"),
          round(col("__scale"), 6).as("scale"),
          round(Similarity.cosine(col("__xd"), col("__recon")), 6)
            .as("cos_recon"),
          round(aggregate(zip_with(col("__xd"), col("__recon"),
              (a, b) => abs(a - b)), lit(0.0), (m, e) => greatest(m, e)), 6)
            .as("max_abs_err"))
        .orderBy("vec_id")
    }),

    // Skew-safe exact distinct count: two bounded-memory stages instead
    // of per-key value sets (the hot-key-with-a-billion-values case).
    "q121_skew_distinct" -> ((s, dir) => {
      Scale.twoPhaseDistinctCount(rd(s, dir, "lineitem"),
          Seq("l_returnflag"), "l_suppkey", "n_supp")
        .orderBy("l_returnflag")
    }),

    // Incremental aggregate maintenance: standing per-customer rollup
    // (orders before 1997) merged with a delta batch (1997 on) — must
    // equal the full recompute the oracle runs.
    "q122_agg_maintenance" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      val aggOf = (df: DataFrame) => df.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")).as("sum_total"))
      val cut = to_date(lit("1997-01-01"))
      val merged = Warehouse.mergeAggDelta(
        aggOf(o.filter(col("o_orderdate") < cut)),
        aggOf(o.filter(col("o_orderdate") >= cut)),
        Seq("o_custkey"), Seq("n_orders", "sum_total"))
      merged.select(col("o_custkey"), col("n_orders"),
          round(col("sum_total"), 2).as("sum_total"))
        .orderBy("o_custkey")
    }))

  // ------------------------------------------------------------- oracle SQL

  private val ToksSql =
    raw"""list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"""

  /** DuckDB mirror of [[decoratedLines]] / Text.tokenLines over `toks`. */
  private def linesSql(width: Int, decorated: Boolean): String = {
    val core = s"array_to_string(toks[(i-1)*$width+1:(i-1)*$width+$width], ' ')"
    val body =
      if (decorated)
        s"""(CASE WHEN i % 5 = 1 THEN '- ' ELSE '' END || $core ||
           | CASE WHEN i % 6 = 0 THEN '...' ELSE '' END)""".stripMargin
      else core
    s"""list_transform(generate_series(1,
       |    CAST(ceil(len(toks) / $width.0) AS INT)), i -> $body)""".stripMargin
  }

  private def stopsSql(e: String): String =
    s"coalesce(len(regexp_extract_all(lower($e), '${Text.wordAltRe(Text.EnStopwords)}')), 0)"

  def oracleSql: Map[String, String] = Map(

    "q117_gopher_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents),
         |l AS (SELECT doc_id, text, toks, ${linesSql(LineW, decorated = true)}
         |        AS lines FROM t),
         |m AS (SELECT doc_id,
         |  len(toks) AS nw,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
         |      / len(toks) ELSE 0.0 END AS mwl,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(len(text) - len(replace(text, '#', '')) +
         |         coalesce(len(regexp_extract_all(text, '(\\.\\.\\.|…)')), 0)
         |      AS DOUBLE) / len(toks) ELSE 0.0 END AS symr,
         |  CASE WHEN len(lines) > 0 THEN
         |    CAST(len(list_filter(lines, x -> regexp_matches(x, '^[-*•]')))
         |      AS DOUBLE) / len(lines) ELSE 0.0 END AS bullet,
         |  CASE WHEN len(lines) > 0 THEN
         |    CAST(len(list_filter(lines, x -> regexp_matches(x, '(\\.\\.\\.|…)$$')))
         |      AS DOUBLE) / len(lines) ELSE 0.0 END AS ell,
         |  CASE WHEN len(toks) > 0 THEN
         |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
         |      AS DOUBLE) / len(toks) ELSE 0.0 END AS alpha,
         |  ${stopsSql("text")} AS stops
         |  FROM l)
         |SELECT doc_id, CAST(nw AS BIGINT) AS n_words,
         |  round(mwl, 6) AS mean_word_len,
         |  round(symr, 6) AS symbol_word_ratio,
         |  round(bullet, 6) AS bullet_line_frac,
         |  round(ell, 6) AS ellipsis_line_frac,
         |  round(alpha, 6) AS alpha_word_frac,
         |  CAST(stops AS BIGINT) AS stop_hits,
         |  (nw BETWEEN 30 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
         |   AND symr <= 0.1 AND bullet <= 0.3 AND ell <= 0.2
         |   AND alpha >= 0.8 AND stops >= 2) AS pass
         |FROM m ORDER BY doc_id""".stripMargin,

    "q118_line_dedup" ->
      s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
         |l AS (SELECT doc_id, ${linesSql(DupW, decorated = false)}
         |        AS lines FROM t),
         |d AS (SELECT doc_id, lines, list_distinct(lines) AS dl,
         |  coalesce(list_sum(list_transform(lines, x -> len(x))), 0) AS tc,
         |  coalesce(list_sum(list_transform(list_distinct(lines),
         |    x -> len(x))), 0) AS dc
         |  FROM l)
         |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         |  round(CASE WHEN len(lines) > 0 THEN
         |    CAST(len(lines) - len(dl) AS DOUBLE) / len(lines)
         |    ELSE 0.0 END, 6) AS dup_line_frac,
         |  round(CASE WHEN tc > 0 THEN CAST(tc - dc AS DOUBLE) / tc
         |    ELSE 0.0 END, 6) AS dup_char_frac
         |FROM d ORDER BY doc_id""".stripMargin,

    "q119_script_profile" ->
      """WITH n AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 0
        |       THEN text || ' 123 #tag ' || chr(8230) || ' ' || chr(65533)
        |       ELSE text END AS t
        |  FROM documents),
        |c AS (SELECT doc_id, len(t) AS n,
        |  len(t) - len(regexp_replace(t, '[A-Za-z]', '', 'g')) AS latin,
        |  len(t) - len(regexp_replace(t, '[0-9]', '', 'g')) AS digit,
        |  len(t) - len(regexp_replace(t, '\s', '', 'g')) AS space,
        |  len(t) - len(regexp_replace(t, '[^\x00-\x7f]', '', 'g')) AS nasc,
        |  len(t) - len(replace(t, chr(65533), '')) AS nrep
        |  FROM n)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |  round(CAST(latin AS DOUBLE) / n, 6) AS latin_frac,
        |  round(CAST(digit AS DOUBLE) / n, 6) AS digit_frac,
        |  round(CAST(space AS DOUBLE) / n, 6) AS space_frac,
        |  round(CAST(n - latin - digit - space - nasc AS DOUBLE) / n, 6)
        |    AS punct_frac,
        |  round(CAST(nasc AS DOUBLE) / n, 6) AS non_ascii_frac,
        |  CAST(nrep AS BIGINT) AS n_replacement
        |FROM c ORDER BY doc_id""".stripMargin,

    "q120_quantize_int8" ->
      s"""WITH b AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
         |  FROM embeddings),
         |s AS (SELECT vec_id, xd,
         |  list_max(list_transform(xd, x -> abs(x))) / 127.0 AS sc FROM b),
         |r AS (SELECT vec_id, sc, xd,
         |  list_transform(xd, x -> greatest(-127.0, least(127.0,
         |    floor(x / nullif(sc, 0.0) + 0.5))) * sc) AS recon FROM s)
         |SELECT vec_id, round(sc, 6) AS scale,
         |  round(${NorthStar.cosineSql("xd", "recon", 64)}, 6) AS cos_recon,
         |  round(list_max(list_transform(generate_series(1, 64),
         |    i -> abs(xd[i] - recon[i]))), 6) AS max_abs_err
         |FROM r ORDER BY vec_id""".stripMargin,

    "q121_skew_distinct" ->
      """SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT)
        |  AS n_supp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q122_agg_maintenance" ->
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        |  round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS sum_total
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
}
