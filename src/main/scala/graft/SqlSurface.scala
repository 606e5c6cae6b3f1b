package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._

/** Tier-B SQL surface (SURVEY §2.5-2.8, §3 "Tier-B lifecycle"): the
  * warehouse-side analytics the reference delegates to BigQuery —
  * multi-way joins, cube/grouping-sets, set ops, pivot, window frames,
  * as-of and range joins, percentiles, plus the raw `spark.sql` path over
  * registered views.
  */
object SqlSurface {

  import SparkEntry.t

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.6 cube (dashboard-distribution shape)
    "q31_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // §2.6 GROUPING SETS via the raw spark.sql path over a temp view
    "q32_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST,
          |         o_orderpriority ASC NULLS FIRST, n""".stripMargin)
    }),

    // §2.8 EXCEPT (distinct set difference)
    "q33_except" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
        .except(o.filter(year(col("o_orderdate")) === 1998).select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // §2.8 INTERSECT
    "q34_intersect" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.filter(year(col("o_orderdate")) === 1997).select("o_custkey")
        .intersect(o.filter(year(col("o_orderdate")) === 1998).select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // §2.6 pivot (wide dashboard table)
    "q35_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .orderBy("o_orderpriority")
    }),

    // §2.7 running window frame (rowsBetween unbounded..current)
    "q36_running_revenue" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_total", round(sum("o_totalprice").over(w), 2))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // §2.7 remaining window family: ntile / percent_rank / dense_rank /
    // first_value over partition frames
    "q59_window_family" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("dense_rk", dense_rank().over(w).cast("long"))
        .withColumn("top_order_in_status",
          first("o_orderkey").over(w))
        .select("o_orderkey", "o_orderstatus", "quartile", "pct_rank",
          "dense_rk", "top_order_in_status")
        .orderBy("o_orderkey")
    }),

    // §2.5 as-of join (window-over-union, no range explosion)
    "q37_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts", "value", "event_id")
      Joins.asOf(clicks, errors, Seq("user_id"), "ts", "ts",
          valueCol = "value", tieBreak = "event_id", asCol = "last_error_value")
        .select("event_id", "user_id", "last_error_value")
        .orderBy("event_id")
    }),

    // §2.5 range join against a broadcast band dimension
    "q38_band_join" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        ("low", 0.0, 150000.0), ("mid", 150000.0, 300000.0),
        ("high", 300000.0, 450000.0), ("vip", 450000.0, 1.0e9))
        .toDF("band", "lo", "hi")
      Joins.bandJoin(t(s, dir, "orders"), bands, "o_totalprice", "lo", "hi")
        .groupBy("band")
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(28,6)")).cast("double"), 2)
            .as("total"))
        .orderBy("band")
    }),

    // Big-big interval join via grid blocking: every event inside a 2h
    // window anchored at ~1% of events — both sides corpus-scale, so
    // the broadcast NL of q38 is the wrong plan; bucketedRangeJoin
    // turns it into a shuffled hash join keyed on 1h grid cells.
    "q193_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val pts = ev.select(col("event_id"), unix_micros(col("ts")).as("tsu"))
      val win = ev.where(col("event_id") % 101 === 0)
        .select(col("event_id").as("win_id"),
          unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + lit(2L * 3600000000L)).as("w_end"))
      Joins.bucketedRangeJoin(pts, win, "tsu", "w_start", "w_end",
          cellWidth = 3600000000L, maxCells = 4)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_events"), min("event_id").as("first_event"))
        .orderBy("win_id")
    }),

    // §2.5 levenshtein-bounded fuzzy join (bookings ⋈ pages shape):
    // nation names with one substituted character fuzzy-matched back to
    // the dimension; "IRAX" legitimately hits both IRAN and IRAQ
    "q61_fuzzy_join" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val typo = nation.select(col("n_nationkey").as("t_key"),
        concat(substring(col("n_name"), 1, 3), lit("X"),
          substring(col("n_name"), 5, 1000)).as("t_name"))
      Joins.fuzzy(typo, nation.select("n_nationkey", "n_name"),
          "t_name", "n_name", maxDist = 1)
        .select(col("t_key"), col("t_name"), col("n_nationkey"), col("n_name"),
          // same case-folding as the join predicate, so dist is always
          // consistent with why the pair matched
          levenshtein(lower(col("t_name")), lower(col("n_name")))
            .cast("long").as("dist"))
        .orderBy("t_key", "n_nationkey")
    }),

    // §2.6 unpivot/melt — the inverse of q35's pivot: wide numeric
    // columns to (metric, value) rows, the classic metrics-table reshape
    "q62_unpivot" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "value")
        // value joins the sort key: the fixture's (orderkey, linenumber)
        // is not guaranteed unique, and the compare is row-order-strict
        .orderBy("l_orderkey", "l_linenumber", "metric", "value")
    }),

    // §2.9 generator family: posexplode with an ordinal position —
    // leading tokens per document (lateral view shape)
    "q63_posexplode" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(Text.tokens(col("text"))).as(Seq("pos", "token")))
        .where(col("pos") < 3)
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"))
        .orderBy("doc_id", "pos")
    }),

    // §2.11 batch form of the tumbling window operator (window() outside
    // streaming — the daily-trend dashboard shape, epoch-aligned buckets)
    "q64_tumbling_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // Calendar gap-fill: a generated date spine left-joined to daily
    // counts so zero-activity days surface as rows (sequence + explode +
    // broadcast-able 1-row bounds — the classic trend-report fix)
    "q65_date_spine" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val bounds = orders.agg(
        min(col("o_orderdate").cast("date")).as("d0"),
        max(col("o_orderdate").cast("date")).as("d1"))
      val spine = bounds.select(
        explode(sequence(col("d0"), col("d1"))).as("day"))
      val daily = orders
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n_orders"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy("day")
    }),

    // §2.6 approximate percentiles (GK sketch). Sketch values are
    // engine-specific, so the checkable contract mirrors q49: the exact
    // percentile plus a boolean asserting the sketch landed within 1%
    // relative error (the oracle computes the exact value and expects
    // `true`). At accuracy=10000 the sketch is exact below 10k rows per
    // group (sf0.001/sf0.01); at sf0.1 (~50k rows/group) the sketch has
    // real error and the GK guarantee (~1/accuracy rank error) keeps it
    // far inside the 1% value bound on this distribution.
    "q66_approx_percentile" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("approx_p50"),
          expr("percentile(o_totalprice, 0.5)").as("exact_p50"))
        .select(col("o_orderstatus"),
          round(col("exact_p50"), 2).as("p50"),
          (abs(col("approx_p50") - col("exact_p50"))
            / col("exact_p50") < 0.01).as("approx_ok"))
        .orderBy("o_orderstatus")
    }),

    // §2.6 boolean aggregate family: every/any/count_if per group.
    // Thresholds chosen so the boolean cells are MIXED true/false at
    // sf0.001 (per-group min/max straddle them) — constant-true cells
    // could not catch a swapped or inverted aggregate.
    "q67_bool_aggs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("every(o_totalprice > 2000)").as("all_over_2k"),
          expr("any(o_totalprice > 499500)").as("some_over_499500"),
          expr("count_if(o_totalprice > 200000)").as("n_over_200k"))
        .orderBy("o_orderstatus")
    }),

    // §2.9 string-function pack: split_part / instr / pads / repeat /
    // reverse / translate — the cleanup toolkit a text ETL leans on
    "q68_string_funcs" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          split_part(col("c_name"), lit("#"), lit(2)).as("name_num"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          lpad(col("c_mktsegment"), 12, ".").as("seg_lpad"),
          rpad(col("c_mktsegment"), 12, ".").as("seg_rpad"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          repeat(lit("ab"), 3).as("abab"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"))
        .orderBy("c_custkey")
    }),

    // §2.6 array_agg family: collect_set per group, flattened to a
    // sorted joined string so the compare is cell-scalar (array cells
    // are not comparable across the parquet/pandas/DuckDB boundary)
    "q69_array_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
            .as("priorities"),
          countDistinct("o_orderpriority").as("n_priorities"))
        .orderBy("o_orderstatus")
    }),

    // §2.9/§2.6 term-frequency mode: most frequent token per document,
    // ROW-LOCAL (sorted-array run-length fold — zero shuffle, where the
    // naive explode → count → row_number shape shuffles the whole token
    // stream twice). Ties are deterministic: count desc, token asc —
    // what native mode() can't promise. Oracle keeps the relational
    // formulation, proving the fold equals the group-count definition.
    "q70_top_token" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
        .where(size(col("toks")) > 0)
        .select(col("doc_id"), Text.topToken(col("toks")).as("tt"))
        .select(col("doc_id"), col("tt.token").as("token"),
          col("tt.n").as("n"))
        .orderBy("doc_id")
    }),

    // Token-distribution Shannon entropy per document — a repetition /
    // diversity quality signal, ROW-LOCAL like q70 (one sort + one fold
    // per document, inside the scan stage). The oracle is DuckDB's
    // native entropy() aggregate over the exploded token stream.
    "q71_token_entropy" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("toks", Text.tokens(col("text")))
        .where(size(col("toks")) > 0)
        .select(col("doc_id"),
          round(Text.tokenEntropy(col("toks")), 6).as("entropy"),
          size(col("toks")).cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),

    // §2.6 bitwise aggregate family over group keys
    "q72_bit_aggs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          expr("bit_and(o_orderkey)").as("k_and"),
          expr("bit_or(o_orderkey)").as("k_or"),
          expr("bit_xor(o_orderkey)").as("k_xor"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // §2.9 math scalar pack: abs/sign/sqrt/ln/log10/exp/mod/ceil/floor.
    // Integral results are cast to long on BOTH sides (Spark ceil(double)
    // is LONG, DuckDB's is DOUBLE; DuckDB sign() is TINYINT).
    "q73_math_funcs" -> ((s, dir) => {
      val bal = col("c_acctbal")
      t(s, dir, "customer")
        .select(col("c_custkey"),
          round(abs(bal), 2).as("abs_bal"),
          signum(bal).cast("long").as("sign_bal"),
          round(sqrt(abs(bal)), 6).as("sqrt_bal"),
          round(log(abs(bal) + 1), 6).as("ln_bal"),
          round(log10(abs(bal) + 1), 6).as("log10_bal"),
          round(exp(bal / 10000), 6).as("exp_scaled"),
          (col("c_custkey") % 7).as("mod7"),
          ceil(bal).as("ceil_bal"),
          floor(bal).as("floor_bal"))
        .orderBy("c_custkey")
    }),

    // §2.9 conditional scalar pack: greatest/least/nullif/coalesce/CASE
    "q74_conditional_funcs" -> ((s, dir) => {
      val bal = col("c_acctbal")
      t(s, dir, "customer")
        .select(col("c_custkey"),
          round(greatest(bal, lit(0.0)), 2).as("bal_clamped_lo"),
          round(least(bal, lit(5000.0)), 2).as("bal_clamped_hi"),
          nullif(col("c_mktsegment"), lit("AUTOMOBILE")).as("seg_or_null"),
          coalesce(nullif(col("c_mktsegment"), lit("AUTOMOBILE")),
            lit("OTHER")).as("seg_filled"),
          when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high")
            .as("tier"))
        .orderBy("c_custkey")
    }),

    // C4-C8 extension: second date pack — add_months (end-of-month
    // clamped in both engines), last_day, quarter, dayofyear, month
    // truncation (Spark trunc() keeps DATE; DuckDB date_trunc is cast)
    "q75_date_funcs2" -> ((s, dir) => {
      val d = col("o_orderdate").cast("date")
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          add_months(d, 3).as("plus3m"),
          last_day(d).as("month_end"),
          quarter(d).cast("long").as("qtr"),
          dayofyear(d).cast("long").as("doy"),
          trunc(d, "month").as("month_start"))
        .orderBy("o_orderkey")
    }),

    // §2.5/§3 correlated scalar subquery via the raw SQL path (Catalyst
    // decorrelates it to an aggregate + outer join; DuckDB runs the
    // same text) — max is order-insensitive so no rounding is needed
    "q76_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer_sq")
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT c_custkey,
          |  coalesce((SELECT max(o_totalprice) FROM orders_sq o
          |            WHERE o.o_custkey = c.c_custkey), 0.0) AS max_price
          |FROM customer_sq c ORDER BY c_custkey""".stripMargin)
    }),

    // URL canonicalization dedup: scheme/case/www/tracking-param/slash
    // variants of one page collapse to one canonical key (doc_id mod
    // lcm(7,13)=91 aliases paths, so groups genuinely merge). The messy
    // URL is synthesized from doc_id so the oracle can rebuild it.
    "q77_url_canonical" -> ((s, dir) => {
      val messy = concat(
        when(col("doc_id") % 4 === 0, lit("HTTPS://WWW.Example.de/"))
          .when(col("doc_id") % 4 === 1, lit("https://example.de/"))
          .when(col("doc_id") % 4 === 2, lit("http://www.example.de/"))
          .otherwise(lit("https://EXAMPLE.de/")),
        lit("Dir"), (col("doc_id") % 7).cast("string"),
        lit("/page"), (col("doc_id") % 13).cast("string"),
        when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit("?utm_source=x#frag"))
          .otherwise(lit("")))
      t(s, dir, "documents")
        .withColumn("canonical", Urls.canonicalize(messy))
        .groupBy("canonical")
        .agg(count(lit(1)).as("n_variants"), min("doc_id").as("first_doc"))
        .orderBy("canonical")
    }),

    // §2.6 DataSketches HLL (hll_sketch_agg/hll_sketch_estimate) —
    // mergeable sketches are THE 100 TB cardinality path (partial sketches
    // union across executors; re-aggregatable across days unlike exact
    // countDistinct). Sketch estimates are engine-specific, so the
    // checkable contract is q49/q66's: exact value + a boolean asserting
    // the estimate landed within 5% (lgK=12 standard error is ~1.6%).
    "q78_hll_sketch" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"),
          countDistinct("o_custkey").as("exact_custs"))
        .select(col("o_orderstatus"), col("exact_custs"),
          (abs(col("est") - col("exact_custs")) / col("exact_custs") < 0.05)
            .as("approx_ok"))
        .orderBy("o_orderstatus")
    }),

    // §2.7 forward fill (gap-fill the last known reading): last(...,
    // ignoreNulls) over an unbounded-preceding frame — the standard
    // sensor/metrics repair. One key shuffle, state is one value per row.
    "q79_forward_fill" -> ((s, dir) => {
      val masked = when(col("event_id") % 3 =!= 0, lit(null))
        .otherwise(round(col("value"), 2))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("v_masked", masked)
        .withColumn("filled", last("v_masked", ignoreNulls = true).over(w))
        .select("event_id", "user_id", "filled")
        .orderBy("event_id")
    }),

    // §2.9 map-typed columns: per-status priority→count map built with
    // map_from_entries over sorted entries, probed with element_at /
    // map_keys / a map_values fold. The ORACLE computes the same scalars
    // relationally (conditional aggregation) — the map machinery is
    // Spark-side, the contract stays cell-scalar.
    "q80_map_ops" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .groupBy("o_orderstatus")
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("o_orderpriority"), col("n")))))
          .as("prio_map"))
        .select(col("o_orderstatus"),
          coalesce(element_at(col("prio_map"), "1-URGENT"), lit(0L))
            .as("urgent_n"),
          size(col("prio_map")).cast("long").as("n_keys"),
          array_join(map_keys(col("prio_map")), ",").as("keys"),
          aggregate(map_values(col("prio_map")), lit(0L), _ + _).as("total"))
        .orderBy("o_orderstatus")
    }),

    // §2.9 regexp_extract_all: pull every long word per document (term
    // mining / vocabulary extraction), row-local
    "q81_regexp_extract_all" -> ((s, dir) => {
      val words =
        regexp_extract_all(lower(col("text")), lit("[a-z]{8,}"), lit(0))
      t(s, dir, "documents")
        .select(col("doc_id"),
          array_join(words, " ").as("long_words"),
          size(words).cast("long").as("n_long"))
        .orderBy("doc_id")
    }),

    // §3 Tier-B: TPC-H-Q5-shaped multi-join via raw spark.sql
    "q39_sql_revenue_region" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n + "_v"))
      s.sql(
        """SELECT n_name,
          |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
          |    AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue,
          |  count(*) AS n_items
          |FROM customer_v, orders_v, lineitem_v, supplier_v, nation_v, region_v
          |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          |  AND r_name = 'ASIA'
          |  AND o_orderdate >= DATE '1996-01-01'
          |  AND o_orderdate < DATE '1997-01-01'
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    }),

    // §2.6 statistical aggregates: stddev / variance / correlation
    "q57_stats_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("days_old",
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))
            .cast("double"))
        .groupBy("o_orderstatus")
        .agg(
          round(stddev_samp("o_totalprice"), 2).as("price_stddev"),
          round(var_samp("o_totalprice"), 0).as("price_var"),
          round(corr(col("o_totalprice"), col("days_old")), 6).as("price_age_corr"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // §2.6 exact percentiles (linear interpolation in both engines)
    "q40_percentiles" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // §2.3 P2/P3/P5: schema-normalization pipeline ops (metadata-only)
    "q41_schema_normalize" -> ((s, dir) => {
      val messy = t(s, dir, "customer").select(
        col("c_custkey").as("C CustKey"), col("c_name").as("C-Name"),
        col("c_acctbal").as("C Acct-Bal"), col("c_mktsegment").as("Tmp Segment"))
      val normalized = Names.normalizeAll(messy) // -> c_custkey, c_name, ...
      Names.dropMatching(Names.keepMatching(normalized, "^(c_|tmp_).*"), "^tmp_.*")
        .orderBy("c_custkey")
    }),

    // §2.9 typed JSON extraction (from_json with schema, vs q10's path op)
    "q48_json_struct" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("p", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .groupBy("event_type")
        .agg(min(col("p.k")).as("min_k"), max(col("p.k")).as("max_k"),
          count(col("p.k")).as("n_with_k"))
        .orderBy("event_type")
    }),

    // §2.6 approx_count_distinct (HLL). Sketch values are engine-specific,
    // so the checkable contract is the exact count plus a boolean asserting
    // the sketch landed within 5% relative error — the oracle computes the
    // exact count and expects `true`.
    "q49_approx_distinct" -> ((s, dir) => {
      // the 15% bound is 3 stddev at the default rsd (0.05), so a correct
      // sketch stays inside it with ~99.7% probability per group at large
      // cardinality (and is near-exact in HLL's sparse regime, as here);
      // a tighter-rsd sketch would cost ~4x the aggregation time for
      // headroom the contract doesn't need
      t(s, dir, "events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct("user_id").as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          when(col("exact_users") === 0, col("approx_users") === 0)
            .otherwise(abs(col("approx_users") - col("exact_users"))
              / col("exact_users") < 0.15).as("approx_ok"))
        .orderBy("event_type")
    }),

    // North-star multimodal: binary payload + stub-decoded typed metadata
    // + aspect-preserving resize, all in the scan stage (payloads never
    // shuffle — only derived metadata reaches the aggregation)
    "q43_multimodal_meta" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("payload", col("text").cast("binary"))
        .withColumn("kind", Multimodal.kindOf(col("doc_id")))
      val m = d.withColumn("meta",
          Multimodal.stubDecodeMeta(col("payload"), col("kind")))
        .withColumn("resized", Multimodal.resizedDims(col("meta"), 320, 240))
      m.groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          sum(col("meta.width")).as("sum_width"),
          sum(col("meta.height")).as("sum_height"),
          sum(col("resized.out_width")).as("sum_out_width"),
          sum(col("resized.out_height")).as("sum_out_height"),
          sum(col("meta.sample_rate")).as("sum_sample_rate"),
          max(col("meta.duration_ms")).as("max_duration_ms"))
        .orderBy("kind")
    }),

    // North-star multimodal: frame sampling over video clips
    "q44_frame_sample" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 2) // video rows
        .withColumn("duration_ms", col("n_chars") * 10)
        .withColumn("offsets",
          Multimodal.frameOffsets(col("duration_ms"), 500))
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_clips"),
          sum(size(col("offsets"))).as("n_frames"),
          sum(aggregate(col("offsets"), lit(0L), (a, v) => a + v))
            .as("sum_offset_ms"))
        .orderBy("lang")
    }),

    // North-star text: Flesch readability re-derivation per language
    "q45_readability" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"),
          Text.fleschReadingEase(col("text")).as("flesch"))
        .groupBy("lang")
        .agg(round(avg("flesch"), 4).as("avg_flesch"),
          round(min("flesch"), 4).as("min_flesch"),
          round(max("flesch"), 4).as("max_flesch"),
          count(lit(1)).as("n"))
        .orderBy("lang")
    }),

    // §2.7 batch sessionization: gap > 30 min starts a new session
    "q46_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      val newSession = when(
        (unix_millis(col("ts")) -
          unix_millis(lag("ts", 1).over(byUser))) > 30L * 60 * 1000, 1)
        .otherwise(when(lag("ts", 1).over(byUser).isNull, 1).otherwise(0))
      t(s, dir, "events")
        .withColumn("new_session", newSession)
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // §2.7/§2.11 native session_window operator (gap-based sessions) —
    // the built-in behind streaming sessionization, exercised in batch;
    // epoch-ms output keeps ns-vs-us parquet precision out of the compare
    "q56_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"))
        .select(col("user_id"),
          unix_millis(col("w.start")).as("start_ms"),
          unix_millis(col("w.end")).as("end_ms"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "start_ms")
    }),

    // §2.9 C6 timestamp -> day string, daily-trend rollup shape
    "q42_daily_counts" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("day")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q49_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q31_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q32_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, n""".stripMargin,

    "q33_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |ORDER BY o_custkey""".stripMargin,

    "q34_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
        |ORDER BY o_custkey""".stripMargin,

    "q35_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q36_running_revenue" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q59_window_family" ->
      """SELECT o_orderkey, o_orderstatus,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  dense_rank() OVER w AS dense_rk,
        |  first_value(o_orderkey) OVER w AS top_order_in_status
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q66_approx_percentile" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
        |  true AS approx_ok
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q69_array_agg" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
        |    AS priorities,
        |  count(DISTINCT o_orderpriority) AS n_priorities
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q70_top_token" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, unnest(coalesce(list_filter(string_split_regex(
        |    lower(trim(text)), '\s+'), x -> x <> ''), [])) AS token
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, token, count(*) AS n FROM toks GROUP BY doc_id, token)
        |SELECT doc_id, token, n FROM c
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |  ORDER BY n DESC, token) = 1
        |ORDER BY doc_id""".stripMargin,

    "q71_token_entropy" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, unnest(coalesce(list_filter(string_split_regex(
        |    lower(trim(text)), '\s+'), x -> x <> ''), [])) AS token
        |  FROM documents)
        |SELECT doc_id, round(entropy(token), 6) AS entropy,
        |  count(*) AS n_tokens
        |FROM toks GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q72_bit_aggs" ->
      """SELECT o_orderstatus,
        |  bit_and(o_orderkey) AS k_and,
        |  bit_or(o_orderkey) AS k_or,
        |  bit_xor(o_orderkey) AS k_xor,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q73_math_funcs" ->
      """SELECT c_custkey,
        |  round(abs(c_acctbal), 2) AS abs_bal,
        |  CAST(sign(c_acctbal) AS BIGINT) AS sign_bal,
        |  round(sqrt(abs(c_acctbal)), 6) AS sqrt_bal,
        |  round(ln(abs(c_acctbal) + 1), 6) AS ln_bal,
        |  round(log10(abs(c_acctbal) + 1), 6) AS log10_bal,
        |  round(exp(c_acctbal / 10000), 6) AS exp_scaled,
        |  c_custkey % 7 AS mod7,
        |  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
        |  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q74_conditional_funcs" ->
      """SELECT c_custkey,
        |  round(greatest(c_acctbal, 0.0), 2) AS bal_clamped_lo,
        |  round(least(c_acctbal, 5000.0), 2) AS bal_clamped_hi,
        |  nullif(c_mktsegment, 'AUTOMOBILE') AS seg_or_null,
        |  coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS seg_filled,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS tier
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q75_date_funcs2" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q76_scalar_subquery" ->
      """SELECT c_custkey,
        |  coalesce((SELECT max(o_totalprice) FROM orders o
        |            WHERE o.o_custkey = c.c_custkey), 0.0) AS max_price
        |FROM customer c ORDER BY c_custkey""".stripMargin,

    "q77_url_canonical" ->
      raw"""WITH u AS (
        |  SELECT doc_id, concat(
        |    CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://WWW.Example.de/'
        |         WHEN doc_id % 4 = 1 THEN 'https://example.de/'
        |         WHEN doc_id % 4 = 2 THEN 'http://www.example.de/'
        |         ELSE 'https://EXAMPLE.de/' END,
        |    'Dir', doc_id % 7, '/page', doc_id % 13,
        |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END,
        |    CASE WHEN doc_id % 5 = 0 THEN '?utm_source=x#frag'
        |         ELSE '' END) AS url
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(lower(trim(url)),
        |    '[?#].*$$', ''), '^https?://', ''), '^www\.', ''), '/$$', '')
        |    AS canonical
        |  FROM u)
        |SELECT canonical, count(*) AS n_variants, min(doc_id) AS first_doc
        |FROM c GROUP BY canonical ORDER BY canonical""".stripMargin,

    "q78_hll_sketch" ->
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS exact_custs,
        |  true AS approx_ok
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q79_forward_fill" ->
      """WITH m AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN event_id % 3 <> 0 THEN NULL
        |         ELSE round(value, 2) END AS v_masked
        |  FROM events)
        |SELECT event_id, user_id,
        |  last_value(v_masked IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM m ORDER BY event_id""".stripMargin,

    "q80_map_ops" ->
      """SELECT o_orderstatus,
        |  CAST(coalesce(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN 1 END), 0) AS BIGINT) AS urgent_n,
        |  count(DISTINCT o_orderpriority) AS n_keys,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
        |    AS keys,
        |  count(*) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q81_regexp_extract_all" ->
      """SELECT doc_id,
        |  coalesce(array_to_string(
        |    regexp_extract_all(lower(text), '[a-z]{8,}'), ' '), '')
        |    AS long_words,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z]{8,}')) AS BIGINT)
        |    AS n_long
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q67_bool_aggs" ->
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 2000) AS all_over_2k,
        |  bool_or(o_totalprice > 499500) AS some_over_499500,
        |  CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
        |    AS n_over_200k
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q68_string_funcs" ->
      """SELECT c_custkey,
        |  split_part(c_name, '#', 2) AS name_num,
        |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        |  lpad(c_mktsegment, 12, '.') AS seg_lpad,
        |  rpad(c_mktsegment, 12, '.') AS seg_rpad,
        |  reverse(c_mktsegment) AS seg_rev,
        |  repeat('ab', 3) AS abab,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q64_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q65_date_spine" ->
      """WITH b AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |         CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
        |spine AS (
        |  SELECT CAST(u.d AS DATE) AS day
        |  FROM b, unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS u(d)),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT s.day, coalesce(d.n_orders, 0) AS n_orders
        |FROM spine s LEFT JOIN daily d USING (day)
        |ORDER BY s.day""".stripMargin,

    "q62_unpivot" ->
      """SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber,
        |    'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber,
        |    'l_discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, metric, value""".stripMargin,

    "q63_posexplode" ->
      raw"""WITH toks AS (
        |  SELECT doc_id, coalesce(list_filter(string_split_regex(
        |    lower(trim(text)), '\s+'), x -> x <> ''), []) AS tk
        |  FROM documents)
        |SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS pos, tk[u.i] AS token
        |FROM toks, unnest(generate_series(1, least(3, len(tk)))) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin,

    "q61_fuzzy_join" ->
      """WITH typo AS (
        |  SELECT n_nationkey AS t_key,
        |    concat(substring(n_name, 1, 3), 'X', substring(n_name, 5))
        |      AS t_name
        |  FROM nation)
        |SELECT t.t_key, t.t_name, n.n_nationkey, n.n_name,
        |  CAST(levenshtein(lower(t.t_name), lower(n.n_name)) AS BIGINT)
        |    AS dist
        |FROM typo t JOIN nation n
        |  ON levenshtein(lower(t.t_name), lower(n.n_name)) <= 1
        |ORDER BY t_key, n_nationkey""".stripMargin,

    "q37_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |errs AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'error')
        |SELECT c.event_id, c.user_id, e.value AS last_error_value
        |FROM clicks c ASOF LEFT JOIN errs e
        |  ON c.user_id = e.user_id AND e.ts <= c.ts
        |ORDER BY event_id""".stripMargin,

    "q38_band_join" ->
      """SELECT band, count(*) AS n,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2)
        |    AS total
        |FROM orders JOIN (VALUES
        |    ('low', 0.0, 150000.0), ('mid', 150000.0, 300000.0),
        |    ('high', 300000.0, 450000.0), ('vip', 450000.0, 1.0e9))
        |  AS b(band, lo, hi)
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q193_range_join" ->
      """WITH p AS (SELECT event_id, epoch_us(ts) AS tsu FROM events),
        |w AS (SELECT event_id AS win_id, epoch_us(ts) AS s,
        |        epoch_us(ts) + 7200000000 AS e
        |      FROM events WHERE event_id % 101 = 0)
        |SELECT win_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(event_id) AS first_event
        |FROM p JOIN w ON p.tsu >= w.s AND p.tsu <= w.e
        |GROUP BY win_id ORDER BY win_id""".stripMargin,

    "q39_sql_revenue_region" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(28,6))) AS DOUBLE), 2) AS revenue,
        |  count(*) AS n_items
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q57_stats_agg" ->
      """WITH d AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      DATE '2002-01-01') AS DOUBLE) AS days_old
        |  FROM orders)
        |SELECT o_orderstatus,
        |  round(stddev_samp(o_totalprice), 2) AS price_stddev,
        |  round(var_samp(o_totalprice), 0) AS price_var,
        |  round(corr(o_totalprice, days_old), 6) AS price_age_corr,
        |  count(*) AS n
        |FROM d GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q40_percentiles" ->
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q41_schema_normalize" ->
      """SELECT c_custkey, c_name, c_acctbal AS c_acct_bal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q56_session_window" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM g)
        |SELECT user_id, epoch_ms(min(ts)) AS start_ms,
        |  epoch_ms(max(ts) + INTERVAL 30 MINUTE) AS end_ms,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, start_ms""".stripMargin,

    "q42_daily_counts" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "q45_readability" ->
      raw"""WITH f AS (
           |  SELECT lang,
           |    CASE WHEN coalesce(len(list_filter(string_split_regex(
           |           lower(trim(text)), '\s+'), x -> x <> '')), 0) = 0 THEN 0.0
           |    ELSE 206.835
           |      - 1.015 * (CAST(len(list_filter(string_split_regex(
           |            lower(trim(text)), '\s+'), x -> x <> '')) AS DOUBLE)
           |        / CAST(CASE WHEN trim(text) = '' THEN 0
           |            ELSE greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
           |            END AS DOUBLE))
           |      - 84.6 * (CAST(len(regexp_extract_all(lower(text),
           |            '[aeiouy]+')) AS DOUBLE)
           |        / CAST(len(list_filter(string_split_regex(
           |            lower(trim(text)), '\s+'), x -> x <> '')) AS DOUBLE))
           |    END AS flesch
           |  FROM documents)
           |SELECT lang, round(avg(flesch), 4) AS avg_flesch,
           |  round(min(flesch), 4) AS min_flesch,
           |  round(max(flesch), 4) AS max_flesch, count(*) AS n
           |FROM f GROUP BY lang ORDER BY lang""".stripMargin,

    "q46_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
        |         WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1
        |         ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q48_json_struct" ->
      """SELECT event_type,
        |  min(CAST(props->>'$.k' AS INT)) AS min_k,
        |  max(CAST(props->>'$.k' AS INT)) AS max_k,
        |  count(CAST(props->>'$.k' AS INT)) AS n_with_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q43_multimodal_meta" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'image'
        |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |    octet_length(encode(text)) AS nb
        |  FROM documents),
        |d AS (
        |  SELECT kind,
        |    (nb * 7) % 512 + 128 AS width,
        |    (nb * 13) % 384 + 96 AS height,
        |    CASE WHEN kind = 'audio' THEN (nb % 3) * 16000 + 16000 END
        |      AS sample_rate,
        |    nb * 10 AS duration_ms
        |  FROM m),
        |r AS (
        |  SELECT *, least(floor(320 * 1000 / width),
        |                  floor(240 * 1000 / height), 1000) AS scale_mil
        |  FROM d)
        |SELECT kind, count(*) AS n,
        |  CAST(sum(width) AS BIGINT) AS sum_width,
        |  CAST(sum(height) AS BIGINT) AS sum_height,
        |  CAST(sum(floor(width * scale_mil / 1000)) AS BIGINT) AS sum_out_width,
        |  CAST(sum(floor(height * scale_mil / 1000)) AS BIGINT) AS sum_out_height,
        |  CAST(sum(sample_rate) AS BIGINT) AS sum_sample_rate,
        |  max(duration_ms) AS max_duration_ms
        |FROM r GROUP BY kind ORDER BY kind""".stripMargin,

    "q44_frame_sample" ->
      """WITH v AS (
        |  SELECT lang, n_chars * 10 AS duration_ms,
        |    generate_series(0, n_chars * 10, 500) AS offsets
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT lang, count(*) AS n_clips,
        |  CAST(sum(len(offsets)) AS BIGINT) AS n_frames,
        |  CAST(sum(list_sum(offsets)) AS BIGINT) AS sum_offset_ms
        |FROM v GROUP BY lang ORDER BY lang""".stripMargin
  )
}
