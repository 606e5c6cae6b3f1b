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

    // Distribution-drift gate between two corpus snapshots: PSI of
    // document length, English vs non-English docs standing in for
    // base vs refreshed corpus. Two bucket-grain aggregations, a
    // 10-row join, one sum — the corpus is scanned once per side.
    "q167_psi" -> ((s, dir) => {
      val d = rd(s, dir, "documents")
      Profiling.psi(d.where(col("lang") === "en"),
          d.where(col("lang") =!= "en"), col("n_chars"),
          lo = 0.0, hi = 600.0, nBuckets = 10)
        .select(round(col("psi"), 6).as("psi"))
    }),

    // k-anonymity release gate: rows re-identifiable by the
    // (lang, source, split) quasi-identifier combination — derived
    // corpus slices must not be publishable down to an individual
    // document's row. The md5 split reuses q55's machinery so the
    // oracle replays it exactly.
    "q202_k_anonymity" -> ((s, dir) => {
      Profiling.kAnonymity(
        rd(s, dir, "documents")
          .withColumn("split", graft.ops.Sampling.splitLabel(col("doc_id"))),
        Seq("lang", "source", "split"), k = 5)
    }),

    // Per-source datasheet — the "datasheets for datasets" rollup a
    // mixture decision reads: volume, length profile, exact-dup rate
    // and language diversity per source, one corpus pass + one
    // digest-grain aggregation.
    "q203_source_datasheet" -> ((s, dir) => {
      import graft.functions.GraftFunctions.fastMd5
      val d = rd(s, dir, "documents")
      val dups = d.select(col("source"), fastMd5(col("text")).as("__h"))
        .groupBy("source", "__h").agg(count(lit(1)).as("__n"))
        .groupBy("source")
        .agg(sum(col("__n") - 1).as("n_exact_dup_rows"))
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("n_chars"), 6).as("mean_chars"),
          percentile(col("n_chars"), lit(0.5)).as("p50_chars"),
          countDistinct("lang").as("n_langs"))
        .join(dups, Seq("source"))
        .withColumn("dup_frac", round(
          col("n_exact_dup_rows").cast("double") / col("n_docs"), 6))
        .orderBy("source")
    }),

    // The location-sensitive companion of q167: Kolmogorov-Smirnov
    // max-CDF-gap over the SAME fixed bins (PSI can stay quiet under a
    // slow monotone shift that KS flags immediately; both gates read
    // one accumulated drift-store state in the streaming form).
    "q201_ks_drift" -> ((s, dir) => {
      val d = rd(s, dir, "documents")
      Profiling.ks(d.where(col("lang") === "en"),
        d.where(col("lang") =!= "en"), col("n_chars"),
        lo = 0.0, hi = 600.0, nBuckets = 10)
    }),

    // Per-source token-distribution divergence vs the corpus:
    // Laplace-smoothed KL over the global top-200 vocabulary — the
    // domain-shift score a mixture-rebalance run ranks sources by
    // (DSIR's sibling: distribution distance instead of importance
    // weights). Vocabulary-scale joins only; the corpus is tokenized
    // once.
    "q184_source_kl" -> ((s, dir) => {
      // the token stream feeds the global top-k AND the per-source
      // counts; the 200-row top table feeds three consumers and perSrc
      // two — pin each so its upstream chain runs once
      val toks = rd(s, dir, "documents")
        .select(col("source"), explode(graft.ops.Text.tokens(col("text"))).as("tok"))
        .cache()
      val top = toks.groupBy("tok").agg(count(lit(1)).as("cg"))
        .orderBy(col("cg").desc, col("tok")).limit(200).cache()
      val ng = top.agg(sum("cg").as("ng"))
      val perSrc = toks.join(broadcast(top.select("tok")), "tok")
        .groupBy("source", "tok").agg(count(lit(1)).as("cs")).cache()
      val ns = perSrc.groupBy("source").agg(sum("cs").as("ns"))
      // every (source, top-token) cell, absent counts as 0
      val grid = ns.crossJoin(broadcast(top))
        .join(perSrc, Seq("source", "tok"), "left")
        .withColumn("cs", coalesce(col("cs"), lit(0L)))
        .crossJoin(broadcast(ng))
      grid
        .withColumn("ps", (col("cs") + lit(1.0)) / (col("ns") + lit(200.0)))
        .withColumn("q", (col("cg") + lit(1.0)) / (col("ng") + lit(200.0)))
        .groupBy("source")
        .agg(round(sum(col("ps") * log(col("ps") / col("q"))), 6)
          .as("kl"), max("ns").as("n_tokens"))
        .select(col("source"), col("n_tokens"), col("kl"))
        .orderBy("source")
    }),

    // Deterministic Poisson-bootstrap CI for the per-source mean
    // document length — "is the length gap between sources real or
    // sampling noise?" answered with md5-derived Poisson(1) replicate
    // weights (Chamandy et al. 2012), fully replayable in SQL: the
    // oracle bakes in the identical inverse-CDF double literals.
    "q189_bootstrap_ci" -> ((s, dir) => {
      Profiling.bootstrapMeanCI(rd(s, dir, "documents"),
          "source", "n_chars", col("doc_id"), reps = 64)
        .orderBy("source")
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
    }),

    // Out-of-vocabulary rate per document against the corpus top-1000
    // vocabulary — the tokenizer-coverage signal (vocab is a 1000-row
    // broadcast; the token stream aggregates once, keyed by doc).
    "q141_oov_rate" -> ((s, dir) => {
      // the token stream feeds the vocabulary AND the scoring join —
      // pin it so the corpus is tokenized once
      val toks = rd(s, dir, "documents")
        .select(col("doc_id"), explode(graft.ops.Text.tokens(col("text")))
          .as("tok"))
        .cache()
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc).limit(1000)
        .select(col("tok"), lit(true).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate", round(col("n_oov").cast("double") /
          col("n_toks").cast("double"), 6))
        .orderBy("doc_id")
    }),

    // Heaps'-law fit: ln(distinct tokens) ~ ln(total tokens) across
    // documents — vocabulary-growth exponent β (~0.4-0.6 for natural
    // text; flat β flags templated corpora).
    "q142_heaps_fit" -> ((s, dir) => {
      val per = rd(s, dir, "documents")
        .select(col("doc_id"), explode(graft.ops.Text.tokens(col("text")))
          .as("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_total"), countDistinct("tok").as("n_distinct"))
      per.agg(
        round(regr_slope(log(col("n_distinct")), log(col("n_total"))), 6)
          .as("heaps_beta"),
        round(regr_intercept(log(col("n_distinct")), log(col("n_total"))), 6)
          .as("heaps_lnk"),
        round(regr_r2(log(col("n_distinct")), log(col("n_total"))), 6)
          .as("heaps_r2"),
        count(lit(1)).as("n_docs"))
    }),

    // Source-distribution balance: Shannon entropy, effective class
    // count exp(H) and Gini impurity — the "is the mix degenerate"
    // gate before sampling (source-cardinality arithmetic only).
    "q143_class_balance" -> ((s, dir) => {
      val n = rd(s, dir, "documents").groupBy("source")
        .agg(count(lit(1)).as("n"))
      val tot = n.agg(sum("n").cast("double").as("t"))
      val p = n.crossJoin(broadcast(tot))
        .select((col("n").cast("double") / col("t")).as("p"))
      p.agg(count(lit(1)).as("n_classes"),
        round(-sum(col("p") * log(col("p"))), 6).as("entropy"),
        round(exp(-sum(col("p") * log(col("p")))), 6).as("eff_classes"),
        round(lit(1.0) - sum(col("p") * col("p")), 6).as("gini"))
    }),

    // Event-type co-occurrence within a ±30-minute window per user,
    // with lift vs independence. The self-join is blocked on (user,
    // 30-min time bucket) with one side replicated to its 3 neighbor
    // buckets — comparisons are bounded per bucket, never per user
    // history (the 100 TB shape); the band filter then exacts the
    // window.
    "q144_cooccurrence" -> ((s, dir) => {
      val bandUs = 1800L * 1000000L
      val ev = rd(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("t"))
      val left = ev.select(col("user_id"), col("event_id").as("id_a"),
        col("event_type").as("type_a"), col("t").as("ta"),
        floor(col("t") / bandUs).as("bk"))
      val right = ev.select(col("user_id"), col("event_id").as("id_b"),
          col("event_type").as("type_b"), col("t").as("tb"),
          explode(array(floor(col("t") / bandUs) - 1, floor(col("t") / bandUs),
            floor(col("t") / bandUs) + 1)).as("bk"))
      val pairs = left.join(right, Seq("user_id", "bk"))
        .where(col("type_a") < col("type_b") &&
          abs(col("ta") - col("tb")) <= bandUs)
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_pairs"))
      val totals = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val all = ev.agg(count(lit(1)).as("n_events"))
      pairs
        .join(broadcast(totals.select(col("event_type").as("type_a"),
          col("n").as("n_a"))), "type_a")
        .join(broadcast(totals.select(col("event_type").as("type_b"),
          col("n").as("n_b"))), "type_b")
        .crossJoin(broadcast(all))
        .select(col("type_a"), col("type_b"), col("n_pairs"),
          round((col("n_pairs").cast("double") * col("n_events").cast("double"))
            / (col("n_a").cast("double") * col("n_b").cast("double")), 6)
            .as("lift"))
        .orderBy("type_a", "type_b")
    }),

    // First-touch / last-touch purchase attribution: each purchase is
    // credited to the user's first-ever and most-recent preceding
    // click/view/signup (IGNORE NULLS window frames — one keyed
    // shuffle, no self-join).
    "q145_attribution" -> ((s, dir) => {
      val touch = when(col("event_type").isin("click", "view", "signup"),
        col("event_type"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      rd(s, dir, "events")
        .withColumn("first_touch",
          first(touch, ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("last_touch",
          last(touch, ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .where(col("event_type") === "purchase")
        .groupBy(
          coalesce(col("first_touch"), lit("none")).as("first_touch"),
          coalesce(col("last_touch"), lit("none")).as("last_touch"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum("value"), 4).as("revenue"))
        .orderBy("first_touch", "last_touch")
    }),

    // Fixed-width document-length histogram (500-char bins) per
    // language — one map-side-combined count; the grouping key is
    // arithmetic, so the histogram never materializes per-row state.
    "q146_length_histogram" -> ((s, dir) => {
      rd(s, dir, "documents")
        .groupBy(col("lang"), floor(col("n_chars") / 500L).as("bin"))
        .agg(count(lit(1)).as("n"))
        .select(col("lang"), (col("bin") * 500).cast("long").as("bin_lo"),
          ((col("bin") + 1) * 500).cast("long").as("bin_hi"), col("n"))
        .orderBy("lang", "bin_lo")
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
        |ORDER BY doc_id""".stripMargin,

    "q141_oov_rate" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(
        |    lower(trim(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |                   ORDER BY n DESC, tok ASC LIMIT 1000))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 0 ELSE 1
        |    END) AS BIGINT) AS n_oov,
        |  round(CAST(sum(CASE WHEN tok IN (SELECT tok FROM vocab) THEN 0
        |    ELSE 1 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS oov_rate
        |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q142_heaps_fit" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(
        |    lower(trim(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_total,
        |               CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
        |        FROM toks GROUP BY doc_id)
        |SELECT round(regr_slope(ln(n_distinct), ln(n_total)), 6)
        |    AS heaps_beta,
        |  round(regr_intercept(ln(n_distinct), ln(n_total)), 6) AS heaps_lnk,
        |  round(regr_r2(ln(n_distinct), ln(n_total)), 6) AS heaps_r2,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM per""".stripMargin,

    "q143_class_balance" ->
      """WITH n AS (SELECT source, count(*) AS n FROM documents
        |           GROUP BY source),
        |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM n),
        |p AS (SELECT CAST(n AS DOUBLE) / t AS p FROM n, tot)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  round(-sum(p * ln(p)), 6) AS entropy,
        |  round(exp(-sum(p * ln(p))), 6) AS eff_classes,
        |  round(1.0 - sum(p * p), 6) AS gini
        |FROM p""".stripMargin,

    "q144_cooccurrence" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t
        |  FROM events),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM ev a JOIN ev b ON a.user_id = b.user_id
        |    AND a.event_type < b.event_type
        |    AND abs(a.t - b.t) <= 1800000000
        |  GROUP BY 1, 2),
        |totals AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |           FROM ev GROUP BY 1),
        |alln AS (SELECT CAST(count(*) AS BIGINT) AS n_events FROM ev)
        |SELECT type_a, type_b, n_pairs,
        |  round((CAST(n_pairs AS DOUBLE) * CAST(n_events AS DOUBLE)) /
        |    (CAST(ta.n AS DOUBLE) * CAST(tb.n AS DOUBLE)), 6) AS lift
        |FROM pairs
        |JOIN totals ta ON ta.event_type = type_a
        |JOIN totals tb ON tb.event_type = type_b
        |CROSS JOIN alln
        |ORDER BY type_a, type_b""".stripMargin,

    "q145_attribution" ->
      """WITH t AS (
        |  SELECT event_type, value,
        |    first_value(CASE WHEN event_type IN ('click','view','signup')
        |        THEN event_type END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS first_touch,
        |    last_value(CASE WHEN event_type IN ('click','view','signup')
        |        THEN event_type END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM events)
        |SELECT coalesce(first_touch, 'none') AS first_touch,
        |  coalesce(last_touch, 'none') AS last_touch,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  round(sum(value), 4) AS revenue
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY first_touch, last_touch""".stripMargin,

    "q146_length_histogram" ->
      """SELECT lang,
        |  CAST((n_chars // 500) * 500 AS BIGINT) AS bin_lo,
        |  CAST((n_chars // 500 + 1) * 500 AS BIGINT) AS bin_hi,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM documents
        |GROUP BY 1, 2, 3 ORDER BY lang, bin_lo""".stripMargin,

    "q189_bootstrap_ci" -> {
      // weight CASE generated from the SAME PoissonCdf doubles the
      // Spark expression folds over (shortest-round-trip literals →
      // identical doubles in both engines)
      val wCase = graft.ops.Profiling.PoissonCdf.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 7 END")
      raw"""WITH reps AS (SELECT unnest(generate_series(0, 63)) AS b),
        |e AS (
        |  SELECT source, CAST(n_chars AS DOUBLE) AS x, b,
        |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' ||
        |      CAST(b AS VARCHAR)), 1, 6) AS BIGINT) / 16777216.0 AS u
        |  FROM documents CROSS JOIN reps),
        |m AS (
        |  SELECT source, b,
        |    sum(($wCase) * x) / nullif(sum($wCase), 0) AS m
        |  FROM e GROUP BY source, b),
        |base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    avg(CAST(n_chars AS DOUBLE)) AS mean
        |  FROM documents GROUP BY source)
        |SELECT base.source, n, round(mean, 6) AS mean,
        |  round(quantile_cont(m, 0.025), 6) AS ci_lo,
        |  round(quantile_cont(m, 0.975), 6) AS ci_hi
        |FROM base JOIN m ON base.source = m.source
        |GROUP BY base.source, n, mean
        |ORDER BY base.source""".stripMargin
    },

    "q184_source_kl" ->
      raw"""WITH toks AS (
        |  SELECT source, unnest(list_filter(string_split_regex(
        |    lower(trim(text)), '\s+'), x -> x <> '')) AS tok
        |  FROM documents),
        |top AS (SELECT tok, CAST(count(*) AS BIGINT) AS cg FROM toks
        |        GROUP BY tok ORDER BY cg DESC, tok LIMIT 200),
        |ng AS (SELECT CAST(sum(cg) AS BIGINT) AS ng FROM top),
        |per AS (SELECT t.source, t.tok, CAST(count(*) AS BIGINT) AS cs
        |        FROM toks t JOIN top USING (tok)
        |        GROUP BY t.source, t.tok),
        |ns AS (SELECT source, CAST(sum(cs) AS BIGINT) AS ns
        |       FROM per GROUP BY source),
        |grid AS (
        |  SELECT ns.source, ns.ns, top.tok, top.cg,
        |    coalesce(per.cs, 0) AS cs
        |  FROM ns CROSS JOIN top
        |  LEFT JOIN per ON per.source = ns.source AND per.tok = top.tok)
        |SELECT g.source, CAST(max(g.ns) AS BIGINT) AS n_tokens,
        |  round(sum(((g.cs + 1.0) / (g.ns + 200.0)) *
        |    ln(((g.cs + 1.0) / (g.ns + 200.0)) /
        |       ((g.cg + 1.0) / (ng.ng + 200.0)))), 6) AS kl
        |FROM grid g, ng GROUP BY g.source ORDER BY g.source""".stripMargin,

    "q202_k_anonymity" ->
      """WITH b AS (
        |  SELECT lang, source,
        |    ((strpos('0123456789abcdef',
        |        md5(CAST(doc_id AS VARCHAR))[1:1]) - 1) * 16
        |      + (strpos('0123456789abcdef',
        |        md5(CAST(doc_id AS VARCHAR))[2:2]) - 1)) AS bk
        |  FROM documents),
        |s AS (
        |  SELECT lang, source,
        |    CASE WHEN bk < 204 THEN 'train'
        |         WHEN bk < 230 THEN 'val' ELSE 'test' END AS split
        |  FROM b),
        |g AS (SELECT lang, source, split, count(*) AS n
        |      FROM s GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_classes,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_violating_rows,
        |  CAST(min(n) AS BIGINT) AS min_class_size
        |FROM g""".stripMargin,

    "q203_source_datasheet" ->
      """WITH dups AS (
        |  SELECT source, CAST(sum(n - 1) AS BIGINT) AS n_exact_dup_rows
        |  FROM (SELECT source, md5(text) AS h, count(*) AS n
        |        FROM documents GROUP BY 1, 2) z
        |  GROUP BY source),
        |base AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    round(avg(CAST(n_chars AS DOUBLE)), 6) AS mean_chars,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS p50_chars,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |  FROM documents GROUP BY source)
        |SELECT base.*, dups.n_exact_dup_rows,
        |  round(CAST(n_exact_dup_rows AS DOUBLE) / n_docs, 6) AS dup_frac
        |FROM base JOIN dups USING (source)
        |ORDER BY source""".stripMargin,

    "q201_ks_drift" ->
      """WITH bb AS (
        |  SELECT least(greatest(CAST(floor(CAST(n_chars AS DOUBLE) / 60.0)
        |      AS INT), 0), 9) AS bucket, count(*) AS n_base
        |  FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |cb AS (
        |  SELECT least(greatest(CAST(floor(CAST(n_chars AS DOUBLE) / 60.0)
        |      AS INT), 0), 9) AS bucket, count(*) AS n_cur
        |  FROM documents WHERE lang <> 'en' AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT coalesce(bb.bucket, cb.bucket) AS bucket,
        |         coalesce(bb.n_base, 0) AS nb,
        |         coalesce(cb.n_cur, 0) AS nc
        |  FROM bb FULL OUTER JOIN cb ON bb.bucket = cb.bucket),
        |t AS (SELECT CAST(sum(nb) AS BIGINT) AS tb,
        |             CAST(sum(nc) AS BIGINT) AS tc FROM j),
        |c AS (
        |  SELECT abs(sum(nb) OVER w / CAST(tb AS DOUBLE)
        |           - sum(nc) OVER w / CAST(tc AS DOUBLE)) AS gap
        |  FROM j, t
        |  WINDOW w AS (ORDER BY bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT round(max(gap), 6) AS ks,
        |  (SELECT tb FROM t) AS n_base, (SELECT tc FROM t) AS n_cur
        |FROM c""".stripMargin,

    "q167_psi" ->
      """WITH bb AS (
        |  SELECT least(greatest(CAST(floor(CAST(n_chars AS DOUBLE) / 60.0)
        |      AS INT), 0), 9) AS bucket, count(*) AS n_base
        |  FROM documents WHERE lang = 'en' AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |cb AS (
        |  SELECT least(greatest(CAST(floor(CAST(n_chars AS DOUBLE) / 60.0)
        |      AS INT), 0), 9) AS bucket, count(*) AS n_cur
        |  FROM documents WHERE lang <> 'en' AND n_chars IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT coalesce(bb.n_base, 0) AS n_base,
        |         coalesce(cb.n_cur, 0) AS n_cur
        |  FROM bb FULL OUTER JOIN cb ON bb.bucket = cb.bucket),
        |t AS (SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM j)
        |SELECT round(sum((pc - pb) * ln(pc / pb)), 6) AS psi
        |FROM (SELECT greatest(n_base / tb, 1e-6) AS pb,
        |             greatest(n_cur / tc, 1e-6) AS pc FROM j, t) z""".stripMargin)
}
