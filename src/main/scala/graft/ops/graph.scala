package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for corpus curation. PageRank-style authority
  * scoring is the standard "is this domain worth crawling/keeping"
  * signal a web-scale training-data pipeline computes over its link
  * graph (cf. Common Crawl's harmonic-centrality ranks).
  */
object Graph {

  /** Fixed-iteration PageRank over an edge list (`src`, `dst` columns;
    * duplicate edges are collapsed). Returns (node, rank).
    *
    * Formulation: r₀ = 1/N; rₜ₊₁(v) = (1−d)/N + d · Σ_{u→v} rₜ(u)/outdeg(u).
    * Dangling mass is not redistributed (ranks are relative authority
    * scores, not a normalized distribution) — this keeps the recurrence
    * a pure join+agg, reproducible in any SQL engine.
    *
    * Scale: each iteration is one equi-join of the edge list with the
    * (much smaller) rank table plus a sum per dst — the edge list never
    * materializes per-iteration state beyond the N-row rank table, and
    * AQE broadcasts the rank side when N is small. Iterations are fixed
    * (no convergence action), so the whole computation is one lazy plan;
    * callers should cache `edges` if it is derived from an expensive
    * upstream (the plan references it 2·iterations + 2 times).
    */
  def pageRank(edges0: DataFrame, iterations: Int,
               damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 10,
      s"iterations must be in [1,10] (fixed-depth lazy plan), got $iterations")
    val edges = edges0.select("src", "dst").distinct()
    // nodes and deg are referenced by every iteration of the unrolled
    // plan (nodes ~2x per iteration via the left join and the N scalar);
    // both are node-cardinality tables — orders of magnitude smaller than
    // the edge list — so pin them rather than re-shuffling edges each time
    val nodes = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node"))).distinct().cache()
    val nn = nodes.agg(count(lit(1)).cast("double").as("__n"))
    val deg = edges.groupBy("src")
      .agg(count(lit(1)).cast("double").as("__outdeg")).cache()
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = edges.join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__outdeg")).as("__c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nn))
        .select(col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__c"), lit(0.0))).as("rank"))
    }
    ranks
  }

  /** Per-node in/out degree over an edge list (`src`, `dst`; duplicate
    * edges collapsed) — the first profile run over any link graph
    * (degree distributions spot crawler traps and spam farms before
    * PageRank spends iterations on them). Two keyed counts over the
    * edge list, outer-merged on the node id; nodes missing a side get
    * degree 0. */
  def degrees(edges0: DataFrame): DataFrame = {
    val edges = edges0.select("src", "dst").distinct()
    val out = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
