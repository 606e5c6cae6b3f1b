package graft

import org.apache.spark.sql.functions._
import graft.ops._

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // Two tight groups on orthogonal axes plus a lone outlier: vectors
  // 0,1,2 point along +x (with small y jitter), 10,11 along +y, 20
  // along -x. Seeds with k=2 are ids 0 and 1 (both +x) — the second
  // assignment pass, after the centroid update, must still separate the
  // +y group from the +x group via the updated means.
  private def vecs = Seq(
    (0L, Array(1f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f)),
    (2L, Array(0.95f, 0.05f, 0f)),
    (10L, Array(0f, 1f, 0f)),
    (11L, Array(0.1f, 0.9f, 0f)),
    (20L, Array(-1f, 0.2f, 0f))
  ).toDF("vec_id", "embedding")

  test("kmeans assigns each vector to its max-cosine centroid") {
    val r = Clustering.kmeansAssign(vecs, "embedding", "vec_id",
        k = 2, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // seeds are ids 0 and 1; the +x group must share one cluster and the
    // +y group the other (centroid 1 drifts toward +y after the update
    // because 10/11 are closer to 0.9,0.1 than to 1,0)
    assert(r(0L) === r(2L))
    assert(r(10L) === r(11L))
    assert(r(0L) !== r(10L))
    // every input vector is assigned exactly once
    assert(r.size === 6)
  }

  test("kmeans tie-breaks toward the lower cluster id") {
    // two identical seeds: every vector has equal cosine to both, so
    // everything must land on the LOWER seed id deterministically
    val dup = Seq(
      (5L, Array(1f, 0f)), (6L, Array(1f, 0f)), (7L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val r = Clustering.kmeansAssign(dup, "embedding", "vec_id",
        k = 2, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.values.toSet === Set(5L))
  }

  test("semDedup keeps the lowest id of each high-cosine group") {
    val r = Clustering.semDedup(vecs, "embedding", "vec_id",
        k = 2, iters = 2, tau = 0.95)
      .collect().map(x => (x.getLong(0), x.getBoolean(2))).toMap
    // +x trio are mutual near-dups above 0.95: only id 0 survives
    assert(r(0L));
    assert(!r(1L) && !r(2L))
    // +y pair: cosine(10,11) = 0.9/(1*sqrt(0.82)) ~ 0.9938 -> 11 dropped
    assert(r(10L) && !r(11L))
    // the outlier has no high-cosine mate
    assert(r(20L))
  }

  test("semDedup mega-cluster: capped expansion = uncapped kept set") {
    // k=1 collapses the whole corpus into one cluster — the degenerate
    // boilerplate shape. A maxCluster far below the membership must
    // route the pairwise pass through the join fallback and still
    // produce exactly the uncapped kept/dropped assignment.
    val many = (0 until 40).map { i =>
      val ang = (i % 4) * (math.Pi / 2) + (i / 4) * 0.001
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat))
    }.toDF("vec_id", "embedding")
    def run(cap: Int) = Clustering.semDedup(many, "embedding", "vec_id",
        k = 1, iters = 1, tau = 0.99, maxCluster = cap)
      .collect().map(x => (x.getLong(0), x.getBoolean(2))).toMap
    val uncapped = run(100000)
    assert(uncapped.values.count(identity) < 40)   // something was dropped
    assert(run(4) === uncapped)
  }

  test("chunkDedup removes repeated chunks corpus-wide, keeps first") {
    val docs = Seq(
      (1L, "a b c d"),   // chunks (k=2): "a b", "c d"
      (2L, "a b x y"),   // "a b" repeats doc 1 -> dropped; "x y" kept
      (3L, "c d"),       // fully duplicate of doc 1's second chunk
      (4L, "")           // tokenless -> dropped entirely
    ).toDF("doc_id", "text")
    val r = Dedup.chunkDedup(docs, "doc_id", "text", chunkTokens = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L) === ((2L, 2L, 7L)))         // "a b c d" intact
    assert(r(2L) === ((2L, 1L, 3L)))         // rebuilt to just "x y"
    assert(r(3L) === ((1L, 0L, 0L)))         // nothing survives
    assert(!r.contains(4L))                  // no tokens, no row
  }

  test("kmeans assignment plan has no per-vector fan-out shuffle") {
    // the argmax must reduce map-side (max_by agg), so the physical plan
    // must NOT contain a window over the (corpus x centroids) cross join
    val plan = Clustering.kmeansAssign(vecs, "embedding", "vec_id",
      k = 2, iters = 1).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }
}
