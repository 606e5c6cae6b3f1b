package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Graph, Profiling, Urls}

/** Corpus/table analytics queries (q123+): URL shape features, Zipf
  * rank-frequency fit (regression aggregates), event-transition Markov
  * matrix, link-graph degree profile, per-column table profiling,
  * constraint validation and winsorization. Registered through
  * SparkEntry; every entry has a DuckDB oracle.
  */
object AnalyticsQueries {

  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.t(s, dir, name)

  /** Deterministic messy URL per document (the fixture has no URL
    * column — same synthesis idea as q77, with a digit-bearing
    * subdomain and query-string variants so every feature is
    * exercised). */
  private def messyUrl = concat(
    lit("https://"),
    when(col("doc_id") % 2 === 0,
      concat(lit("cdn"), (col("doc_id") % 10).cast("string"), lit(".")))
      .otherwise(lit("")),
    lit("example.de/dir"), (col("doc_id") % 7).cast("string"),
    lit("/page"), (col("doc_id") % 13).cast("string"),
    when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 5 === 0, lit("?utm_source=x")).otherwise(lit("")))

  /** Event-order link edges, as in q106 (props.k chains per user). */
  private def eventEdges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    rd(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .select(col("k").as("dst"), lag(col("k"), 1).over(w).as("src"))
      .where(col("src").isNotNull)
      .select("src", "dst")
  }

  private val EdgesSql =
    """lagk AS (
      |  SELECT CAST(props->>'$.k' AS BIGINT) AS dst,
      |    lag(CAST(props->>'$.k' AS BIGINT)) OVER
      |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS src
      |  FROM events),
      |edges AS (SELECT DISTINCT src, dst FROM lagk WHERE src IS NOT NULL)""".stripMargin

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // URL shape features for spam scoring — row-local string/regex
    // arithmetic inside the scan stage.
    "q123_url_features" -> ((s, dir) => {
      val f = Urls.features(messyUrl)
      rd(s, dir, "documents")
        .select(col("doc_id"), f.as("f"))
        .select(col("doc_id"),
          col("f.host").as("host"), col("f.tld").as("tld"),
          col("f.subdomain_dots").as("subdomain_dots"),
          col("f.path_depth").as("path_depth"),
          round(col("f.host_digit_ratio"), 6).as("host_digit_ratio"),
          col("f.has_query").as("has_query"))
        .orderBy("doc_id")
    }),

    // Zipf rank-frequency fit over the corpus vocabulary: ln(freq) ~
    // ln(rank) slope/intercept/R² via SQL regression aggregates. The
    // global window ranks the top-100 TOKEN table (vocabulary-sized,
    // bounded by the preceding limit), never the corpus.
    "q124_zipf_fit" -> ((s, dir) => {
      val toks = rd(s, dir, "documents")
        .select(explode(graft.ops.Text.tokens(col("text"))).as("tok"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc).limit(100)
      val ranked = top.withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("tok").asc)))
      ranked.agg(
        round(regr_slope(log(col("n")), log(col("rank"))), 6)
          .as("zipf_slope"),
        round(regr_intercept(log(col("n")), log(col("rank"))), 6)
          .as("zipf_intercept"),
        round(regr_r2(log(col("n")), log(col("rank"))), 6).as("zipf_r2"),
        count(lit(1)).as("n_ranks"))
    }),

    // First-order Markov transition matrix between event types per
    // user timeline — the "what follows what" profile of an event
    // stream (one lag window + one keyed count).
    "q125_markov_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val tr = rd(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("next_type"))
        .withColumn("prev_type", lag(col("next_type"), 1).over(w))
        .where(col("prev_type").isNotNull)
        .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      tr.withColumn("prob", round(col("n").cast("double") /
          sum("n").over(Window.partitionBy("prev_type")), 6))
        .orderBy("prev_type", "next_type")
    }),

    // Link-graph degree profile over the q106 edge set — in/out degree
    // per node, zero-filled.
    "q126_degree_profile" -> ((s, dir) => {
      Graph.degrees(eventEdges(s, dir)).orderBy("node")
    }),

    // Per-column table profile (rows / nulls / distincts) in one
    // aggregation pass, exploded to long form.
    "q127_table_profile" -> ((s, dir) => {
      Profiling.profile(rd(s, dir, "orders"),
          Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
        .orderBy("col_name")
    }),

    // Constraint gate over a deterministically-corrupted orders table
    // (every 1000th order re-appended with a negated custkey): PK
    // uniqueness, FK integrity, value range — (check, violations).
    "q128_constraint_gate" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      val corrupted = o.unionByName(
        o.filter(col("o_orderkey") % 1000 === 0)
          .withColumn("o_custkey", -col("o_custkey")))
      Profiling.violationCounts(Seq(
        "orders_custkey_fk" -> Profiling.fkOrphans(corrupted,
          rd(s, dir, "customer"), "o_custkey", "c_custkey"),
        "orders_pk_dup" -> Profiling.dupKeys(corrupted, Seq("o_orderkey")),
        "orders_total_positive" -> corrupted.filter(col("o_totalprice") <= 0)))
        .orderBy("check_name")
    }),

    // Winsorized document length per language: clamp n_chars to the
    // language's [p05, p95] band (cutoffs broadcast back; corpus
    // unshuffled).
    "q129_winsorize" -> ((s, dir) => {
      Curation.winsorize(rd(s, dir, "documents"), "lang", "n_chars",
          0.05, 0.95)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("lo_cut"), 4).as("lo_cut"),
          round(col("hi_cut"), 4).as("hi_cut"),
          round(col("n_chars_w"), 4).as("n_chars_w"))
        .orderBy("doc_id")
    }))

  // ------------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(

    "q123_url_features" ->
      raw"""WITH u AS (
        |  SELECT doc_id, 'https://' ||
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'cdn' || CAST(doc_id % 10 AS VARCHAR) || '.'
        |         ELSE '' END ||
        |    'example.de/dir' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '/page' || CAST(doc_id % 13 AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN '?utm_source=x' ELSE '' END AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, url,
        |    coalesce(nullif(string_split(url, '/')[3], ''), '') AS host,
        |    regexp_replace(url, '[?#].*$$', '') AS base
        |  FROM u)
        |SELECT doc_id, host,
        |  regexp_extract(host, '([^.]*)$$', 1) AS tld,
        |  CAST(len(host) - len(replace(host, '.', '')) AS BIGINT)
        |    AS subdomain_dots,
        |  CAST(len(list_filter(string_split(base, '/')[4:],
        |    x -> x <> '')) AS BIGINT) AS path_depth,
        |  round(CASE WHEN len(host) > 0 THEN
        |    CAST(len(host) - len(regexp_replace(host, '[0-9]', '', 'g'))
        |      AS DOUBLE) / len(host) ELSE 0.0 END, 6) AS host_digit_ratio,
        |  contains(url, '?') AS has_query
        |FROM p ORDER BY doc_id""".stripMargin,

    "q124_zipf_fit" ->
      raw"""WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)),
        |    '\s+'), x -> x <> '')) AS tok FROM documents),
        |freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |         ORDER BY n DESC, tok ASC LIMIT 100),
        |ranked AS (SELECT n,
        |  row_number() OVER (ORDER BY n DESC, tok ASC) AS rank FROM freq)
        |SELECT round(regr_slope(ln(n), ln(rank)), 6) AS zipf_slope,
        |  round(regr_intercept(ln(n), ln(rank)), 6) AS zipf_intercept,
        |  round(regr_r2(ln(n), ln(rank)), 6) AS zipf_r2,
        |  CAST(count(*) AS BIGINT) AS n_ranks
        |FROM ranked""".stripMargin,

    "q125_markov_transitions" ->
      """WITH tr AS (
        |  SELECT lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |      AS prev_type,
        |    event_type AS next_type
        |  FROM events),
        |c AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        |      FROM tr WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  round(CAST(n AS DOUBLE) /
        |    sum(n) OVER (PARTITION BY prev_type), 6) AS prob
        |FROM c ORDER BY prev_type, next_type""".stripMargin,

    "q126_degree_profile" ->
      s"""WITH $EdgesSql,
        |nodes AS (SELECT src AS node FROM edges
        |          UNION SELECT dst FROM edges),
        |od AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS od
        |       FROM edges GROUP BY 1),
        |ind AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS ind
        |        FROM edges GROUP BY 1)
        |SELECT n.node,
        |  CAST(coalesce(od.od, 0) AS BIGINT) AS out_deg,
        |  CAST(coalesce(ind.ind, 0) AS BIGINT) AS in_deg
        |FROM nodes n LEFT JOIN od USING (node) LEFT JOIN ind USING (node)
        |ORDER BY node""".stripMargin,

    "q127_table_profile" ->
      """SELECT 'o_custkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        |FROM orders
        |UNION ALL SELECT 'o_orderstatus', count(*),
        |  count(*) - count(o_orderstatus), count(DISTINCT o_orderstatus)
        |FROM orders
        |UNION ALL SELECT 'o_totalprice', count(*),
        |  count(*) - count(o_totalprice), count(DISTINCT o_totalprice)
        |FROM orders
        |UNION ALL SELECT 'o_orderdate', count(*),
        |  count(*) - count(o_orderdate), count(DISTINCT o_orderdate)
        |FROM orders
        |ORDER BY col_name""".stripMargin,

    "q128_constraint_gate" ->
      """WITH extra AS (
        |  SELECT * REPLACE (-o_custkey AS o_custkey) FROM orders
        |  WHERE o_orderkey % 1000 = 0),
        |c AS (SELECT * FROM orders UNION ALL SELECT * FROM extra)
        |SELECT 'orders_custkey_fk' AS check_name,
        |  CAST((SELECT count(*) FROM c WHERE NOT EXISTS (
        |    SELECT 1 FROM customer WHERE c_custkey = c.o_custkey))
        |    AS BIGINT) AS n_violations
        |UNION ALL SELECT 'orders_pk_dup',
        |  CAST((SELECT count(*) FROM (SELECT o_orderkey FROM c
        |    GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
        |UNION ALL SELECT 'orders_total_positive',
        |  CAST((SELECT count(*) FROM c WHERE o_totalprice <= 0) AS BIGINT)
        |ORDER BY check_name""".stripMargin,

    "q129_winsorize" ->
      """WITH cuts AS (
        |  SELECT lang,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.05) AS lo_cut,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.95) AS hi_cut
        |  FROM documents GROUP BY lang)
        |SELECT doc_id, d.lang, n_chars,
        |  round(lo_cut, 4) AS lo_cut, round(hi_cut, 4) AS hi_cut,
        |  round(CASE WHEN CAST(n_chars AS DOUBLE) < lo_cut THEN lo_cut
        |             WHEN CAST(n_chars AS DOUBLE) > hi_cut THEN hi_cut
        |             ELSE CAST(n_chars AS DOUBLE) END, 4) AS n_chars_w
        |FROM documents d JOIN cuts USING (lang)
        |ORDER BY doc_id""".stripMargin)
}
