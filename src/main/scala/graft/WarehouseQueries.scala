package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Warehouse-maintenance query pack (q102+): SCD Type-2 history build,
  * CDC latest-wins upsert with delete tombstones, hopping (sliding)
  * window aggregation and deterministic weighted sampling. Every query
  * has an exact DuckDB oracle.
  *
  * These cover the table-maintenance half of a warehouse the reference
  * handles by full rewrite (replace-latest, SURVEY §2.2 K2): keyed
  * incremental history and snapshot application, expressed as
  * shuffle-once window plans that scale to a bucketed 100 TB base.
  */
object WarehouseQueries {

  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.t(s, dir, name)

  /** DuckDB replica of Sampling.splitBucket (shared with CurationQueries'
    * generated SQL): first md5 hex byte of the stringified id. */
  private def bucketSql(id: String): String =
    s"""((strpos('0123456789abcdef',
       |    md5(CAST($id AS VARCHAR))[1:1]) - 1) * 16
       |  + (strpos('0123456789abcdef',
       |    md5(CAST($id AS VARCHAR))[2:2]) - 1))""".stripMargin

  private val CdcCutoff = "1998-01-01"

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SCD Type-2: each order is a status-change event for its customer;
    // build validity intervals with lead() — one key-shuffle, streaming
    // per-key window, no self-join (the naive interval build).
    "q102_scd2" -> ((s, dir) => {
      Warehouse.scd2(rd(s, dir, "orders"), Seq("o_custkey"),
          Seq(col("o_orderdate").asc, col("o_orderkey").asc), "o_orderdate")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // CDC upsert: orders before the cutoff are the base snapshot, orders
    // after it are the change stream (finalized status 'F' = tombstone);
    // latest change per customer wins, tombstoned customers drop out.
    "q103_cdc_upsert" -> ((s, dir) => {
      val orders = rd(s, dir, "orders")
      val cut = to_timestamp(lit(CdcCutoff))
      Warehouse.applyCdc(
          orders.filter(col("o_orderdate") < cut),
          orders.filter(col("o_orderdate") >= cut),
          Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"),
          col("o_orderstatus") === "F")
        .select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice",
          "o_orderdate")
        .orderBy("o_custkey")
    }),

    // Hopping window: 2-hour windows sliding every hour (each event lands
    // in exactly two windows) — the overlap structure Structured
    // Streaming's window() uses, checked here in batch against an
    // explicit two-arm union oracle.
    "q104_hopping_window" -> ((s, dir) => {
      rd(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),

    // Weighted deterministic sampling: keep-probability proportional to
    // document length (clamped at 1) — md5-keyed importance sampling,
    // no rand(), decision recomputable from the id alone.
    "q105_weighted_sample" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      Curation.weightedSample(docs, col("doc_id"),
          least(lit(1.0), col("n_chars") / lit(400.0)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"),
          min("doc_id").as("first_doc"))
        .orderBy("lang")
    }),

    // Z-order (Morton) clustering value: interleave the bits of two
    // fixed-width bucketed dimensions — the write-time sort key that
    // gives every output file a small (user_id, value) bounding box,
    // so min/max row-group skipping works on BOTH filter columns.
    // LayoutSpec proves the locality property; here the bit math is
    // cell-checked against an integer-SQL replay.
    "q177_zorder" -> ((s, dir) => {
      val zu = Layout.zBucket(col("user_id"), 0.0, 160.0, ZBits)
      val zv = Layout.zBucket(col("value"), 0.0, 500.0, ZBits)
      rd(s, dir, "events")
        .select(col("event_id"), zu.as("zb_user"), zv.as("zb_value"),
          Layout.zValue2(zu, zv, ZBits).as("zval"))
        .orderBy("event_id")
    }),

    // Hilbert-curve layout index over the same two bucketed dimensions
    // as q177 — the better-locality clustering key (consecutive index
    // values are always grid-adjacent cells, so each range-partitioned
    // file covers a tighter bounding box than Morton). The per-level
    // reflect-and-rotate recurrence is replayed in DuckDB as a chain
    // of integer-SQL CTEs generated from the same Scala loop.
    "q188_hilbert" -> ((s, dir) => {
      val zu = Layout.zBucket(col("user_id"), 0.0, 160.0, ZBits)
      val zv = Layout.zBucket(col("value"), 0.0, 500.0, ZBits)
      Layout.hilbertValue2(
          rd(s, dir, "events")
            .select(col("event_id"), zu.as("zb_user"), zv.as("zb_value")),
          col("zb_user"), col("zb_value"), ZBits, "hval")
        .orderBy("event_id")
    })
  )

  /** Bits per dimension for q177's z-interleave. */
  private val ZBits = 8

  // ------------------------------------------------------------- oracleSql

  def oracleSql: Map[String, String] = Map(

    "q102_scd2" ->
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  lead(o_orderdate) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q103_cdc_upsert" ->
      s"""WITH b AS (
         |  SELECT *, FALSE AS del, 0 AS src FROM orders
         |  WHERE o_orderdate < TIMESTAMP '$CdcCutoff'),
         |c AS (
         |  SELECT *, o_orderstatus = 'F' AS del, 1 AS src FROM orders
         |  WHERE o_orderdate >= TIMESTAMP '$CdcCutoff'),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate DESC, o_orderkey DESC, src DESC) AS rn
         |  FROM (SELECT * FROM b UNION ALL SELECT * FROM c))
         |SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice,
         |  o_orderdate
         |FROM r WHERE rn = 1 AND NOT del
         |ORDER BY o_custkey""".stripMargin,

    "q104_hopping_window" ->
      """WITH ev AS (
        |  SELECT time_bucket(INTERVAL 1 HOUR, ts) AS b, event_type, value
        |  FROM events),
        |arms AS (
        |  SELECT b AS ws, event_type, value FROM ev
        |  UNION ALL
        |  SELECT b - INTERVAL 1 HOUR AS ws, event_type, value FROM ev)
        |SELECT ws AS window_start, event_type, count(*) AS n,
        |  round(sum(value), 2) AS sum_value
        |FROM arms GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q105_weighted_sample" -> {
      val b = bucketSql("doc_id")
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
         |  CAST(sum(n_chars) AS BIGINT) AS chars_kept,
         |  min(doc_id) AS first_doc
         |FROM documents
         |WHERE $b < least(1.0, n_chars / 400.0) * 256.0
         |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q177_zorder" -> {
      val n = 1L << 8
      def zb(c: String, hi: Double) =
        s"""least(greatest(CAST(floor(CAST($c AS DOUBLE)
           |  / ${hi / n}) AS BIGINT), 0), ${n - 1})""".stripMargin
      val interleave = (0 until 8).map { i =>
        s"(((zb_user >> $i) & 1) << ${2 * i + 1}) | " +
          s"(((zb_value >> $i) & 1) << ${2 * i})"
      }.mkString(" | ")
      s"""SELECT event_id, zb_user, zb_value,
         |  CAST($interleave AS BIGINT) AS zval
         |FROM (SELECT event_id,
         |        ${zb("user_id", 160.0)} AS zb_user,
         |        ${zb("value", 500.0)} AS zb_value
         |      FROM events)
         |ORDER BY event_id""".stripMargin
    },

    "q188_hilbert" -> {
      val n = 1L << 8
      def zb(c: String, hi: Double) =
        s"""least(greatest(CAST(floor(CAST($c AS DOUBLE)
           |  / ${hi / n}) AS BIGINT), 0), ${n - 1})""".stripMargin
      // one CTE per bit level, replaying Layout.hilbertValue2's
      // reflect-and-rotate recurrence: hx/hy/hd all read the previous
      // level's columns, exactly like the Spark chained projection
      val levels = ((8 - 1) to 0 by -1).zipWithIndex.map {
        case (i, step) =>
          val s = 1L << i
          val prev = if (step == 0) "h0" else s"h$step"
          val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
          val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
          s"""h${step + 1} AS (
             |  SELECT event_id, zb_user, zb_value,
             |    CASE WHEN $ry = 0 THEN
             |      (CASE WHEN $rx = 1 THEN ${s - 1} - hy ELSE hy END)
             |    ELSE hx END AS hx,
             |    CASE WHEN $ry = 0 THEN
             |      (CASE WHEN $rx = 1 THEN ${s - 1} - hx ELSE hx END)
             |    ELSE hy END AS hy,
             |    hd + ${s * s} * xor(3 * $rx, $ry) AS hd
             |  FROM $prev)""".stripMargin
      }.mkString(",\n")
      s"""WITH h0 AS (
         |  SELECT event_id,
         |    ${zb("user_id", 160.0)} AS zb_user,
         |    ${zb("value", 500.0)} AS zb_value,
         |    ${zb("user_id", 160.0)} AS hx,
         |    ${zb("value", 500.0)} AS hy,
         |    CAST(0 AS BIGINT) AS hd
         |  FROM events),
         |$levels
         |SELECT event_id, zb_user, zb_value, hd AS hval
         |FROM h8
         |ORDER BY event_id""".stripMargin
    }
  )
}
