package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Clustering, Dedup}

/** Embedding-mining and rolling-feature queries (q109+): spherical
  * k-means, SemDeDup, sub-document chunk dedup, trailing time-range
  * windows, value histograms. Registered through SparkEntry alongside
  * the other query families; every entry has a DuckDB oracle.
  */
object MiningQueries {

  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.t(s, dir, name)

  private val Dim = 64
  private val K = 8
  private val Iters = 2
  private val Tau = 0.3
  private val SevenDaysUs = 7L * 24 * 3600 * 1000000

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic spherical k-means over the embedding corpus — the
    // clustering pass SemDeDup/semantic-mixing pipelines run first.
    // Seeds = 8 lowest vec_ids, 2 assignment passes.
    "q109_kmeans" -> ((s, dir) => {
      Clustering.kmeansAssign(rd(s, dir, "embeddings"),
          "embedding", "vec_id", k = K, iters = Iters)
        .select(col("vec_id"), col("cluster_id"),
          round(col("cosine_sim"), 6).as("cosine_sim"))
        .orderBy("vec_id")
    }),

    // SemDeDup: cluster (as q109), then inside each cluster mark every
    // vector with a lower-id cluster-mate above cosine tau as a
    // near-duplicate. kept=false rows are what a curation run drops.
    "q110_semdedup" -> ((s, dir) => {
      Clustering.semDedup(rd(s, dir, "embeddings"),
          "embedding", "vec_id", k = K, iters = Iters, tau = Tau)
        .orderBy("vec_id")
    }),

    // Sub-document exact dedup over non-overlapping 16-token chunks:
    // corpus-wide first occurrence wins, documents rebuilt from their
    // surviving chunks (CCNet-style paragraph dedup).
    "q111_chunk_dedup" -> ((s, dir) => {
      Dedup.chunkDedup(rd(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 16)
        .orderBy("doc_id")
    }),

    // Trailing 7-day per-user activity features at every event — the
    // point-in-time rolling aggregate a feature-store backfill computes.
    // RANGE frame over epoch-micros so ties (equal timestamps) are peers
    // in both engines.
    "q112_trailing_window" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("__t"))
        .rangeBetween(-SevenDaysUs, 0)
      rd(s, dir, "events")
        .withColumn("__t", unix_micros(col("ts")))
        .withColumn("n_7d", count(lit(1)).over(w))
        .withColumn("sum_7d", round(sum(col("value")).over(w), 4))
        .select(col("event_id"), col("n_7d"), col("sum_7d"))
        .orderBy("event_id")
    }),

    // Fixed-width value histogram per event type (floor bucketing) —
    // the profiling pass run before choosing quality-filter thresholds.
    "q113_histogram" -> ((s, dir) => {
      rd(s, dir, "events")
        .groupBy(col("event_type"),
          floor(col("value") / 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("value")), 4).as("lo"),
          round(max(col("value")), 4).as("hi"))
        .orderBy("event_type", "bucket")
    })
  )

  // ----------------------------------------------------------- oracle SQL

  /** Two assignment passes of Clustering.kmeansAssign unrolled as CTEs:
    * produces a2(id, cid, cos) plus base(id, v). Shared by q109/q110. */
  private def kmeansSql: String = {
    def cos(a: String, b: String) = NorthStar.cosineSql(a, b, Dim)
    s"""base AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
       |c0 AS (SELECT id AS cid, v AS cvec FROM base ORDER BY id LIMIT $K),
       |a1p AS (SELECT b.id, c.cid, ${cos("b.v", "c.cvec")} AS cos
       |        FROM base b CROSS JOIN c0 c),
       |a1 AS (SELECT id, cid, cos FROM (
       |         SELECT *, row_number() OVER
       |           (PARTITION BY id ORDER BY cos DESC, cid) AS rk FROM a1p)
       |       WHERE rk = 1),
       |m1 AS (SELECT a.cid, g.i, avg(CAST(b.v[g.i] AS DOUBLE)) AS m
       |       FROM a1 a JOIN base b USING (id),
       |            unnest(generate_series(1, $Dim)) AS g(i)
       |       GROUP BY a.cid, g.i),
       |c1 AS (SELECT cid, list(m ORDER BY i) AS cvec FROM m1 GROUP BY cid),
       |a2p AS (SELECT b.id, c.cid, ${cos("b.v", "c.cvec")} AS cos
       |        FROM base b CROSS JOIN c1 c),
       |a2 AS (SELECT id, cid, cos FROM (
       |         SELECT *, row_number() OVER
       |           (PARTITION BY id ORDER BY cos DESC, cid) AS rk FROM a2p)
       |       WHERE rk = 1)""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q109_kmeans" ->
      s"""WITH $kmeansSql
         |SELECT id AS vec_id, cid AS cluster_id,
         |  round(cos, 6) AS cosine_sim
         |FROM a2 ORDER BY vec_id""".stripMargin,

    "q110_semdedup" -> {
      val cosAb = NorthStar.cosineSql("ba.v", "bb.v", Dim)
      s"""WITH $kmeansSql,
         |dr AS (SELECT DISTINCT a.id FROM a2 a
         |       JOIN a2 b ON a.cid = b.cid AND b.id < a.id
         |       JOIN base ba ON ba.id = a.id
         |       JOIN base bb ON bb.id = b.id
         |       WHERE $cosAb > $Tau)
         |SELECT a.id AS vec_id, a.cid AS cluster_id,
         |  (dr.id IS NULL) AS kept
         |FROM a2 a LEFT JOIN dr ON dr.id = a.id
         |ORDER BY vec_id""".stripMargin
    },

    "q111_chunk_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${NorthStar.toksSql("text")} AS t FROM documents),
         |nz AS (SELECT * FROM toks WHERE len(t) > 0),
         |st AS (SELECT doc_id, t,
         |         unnest(generate_series(0, len(t) - 1, 16)) AS s
         |       FROM nz),
         |ch AS (SELECT doc_id, CAST(s // 16 AS BIGINT) AS ci,
         |         array_to_string(t[s + 1 : s + 16], ' ') AS txt
         |       FROM st),
         |rk AS (SELECT *, row_number() OVER
         |         (PARTITION BY md5(txt) ORDER BY doc_id, ci) AS rn
         |       FROM ch)
         |SELECT doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(length(coalesce(
         |    string_agg(CASE WHEN rn = 1 THEN txt END, ' ' ORDER BY ci),
         |    '')) AS BIGINT) AS rebuilt_len,
         |  md5(coalesce(
         |    string_agg(CASE WHEN rn = 1 THEN txt END, ' ' ORDER BY ci),
         |    '')) AS rebuilt_md5
         |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q112_trailing_window" ->
      s"""SELECT event_id, count(*) OVER w AS n_7d,
         |  round(sum(value) OVER w, 4) AS sum_7d
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         |  RANGE BETWEEN $SevenDaysUs PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "q113_histogram" ->
      """SELECT event_type,
        |  CAST(floor(value / 10) AS BIGINT) AS bucket, count(*) AS n,
        |  round(min(value), 4) AS lo, round(max(value), 4) AS hi
        |FROM events GROUP BY event_type, bucket
        |ORDER BY event_type, bucket""".stripMargin
  )
}
