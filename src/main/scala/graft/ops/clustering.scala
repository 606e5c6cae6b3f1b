package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation: deterministic
  * fixed-iteration spherical k-means and SemDeDup-style cluster-then-
  * near-dedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
  * web-scale through semantic deduplication" — cluster embeddings, then
  * drop all-but-one of each high-cosine group within a cluster).
  */
object Clustering {

  /** Deterministic spherical k-means: seeds are the `k` lowest-id
    * vectors (cluster_id = seed id), assignment is argmax cosine
    * (ties -> lower cluster id), update is the element-wise mean of the
    * assigned vectors (un-normalized — cosine re-normalizes). `iters`
    * counts ASSIGNMENT passes: centroids are refreshed between passes,
    * so iters=2 means assign, update, assign. Returns one row per input
    * vector: (idCol, cluster_id, cosine_sim to its final centroid).
    * Rows whose cosine is null against every centroid (zero vectors)
    * are dropped rather than assigned arbitrarily.
    *
    * Scale: each assignment broadcasts the k-row centroid table and
    * reduces map-side via max_by — the shuffle carries ONE row per
    * vector (its best centroid), never the k-way comparison fan-out a
    * window-over-crossjoin would. The update explodes to (k x dim)
    * partial means — fixed width, independent of corpus size. The
    * projected (id, vector) frame is cached because the lazy unrolled
    * plan re-reads it once per pass; at very large scale swap the cache
    * for a checkpoint of the same projection.
    */
  def kmeansAssign(emb: DataFrame, embCol: String, idCol: String,
                   k: Int, iters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1 && iters <= 10,
      s"iters must be in [1,10] (fixed-depth lazy plan), got $iters")
    val base = emb.select(col(idCol).cast("long").as("__id"),
      col(embCol).as("__v")).cache()
    var cents = base.orderBy("__id").limit(k)
      .select(col("__id").as("__cid"), col("__v").as("__cvec"))

    def assignTo(c: DataFrame): DataFrame =
      base.crossJoin(broadcast(c))
        .select(col("__id"), col("__v"), col("__cid"),
          Similarity.cosine(col("__v"), col("__cvec")).as("__cos"))
        .where(col("__cos").isNotNull)
        .groupBy("__id")
        .agg(
          max_by(struct(col("__cid"), col("__cos")),
            struct(col("__cos"), -col("__cid"))).as("__b"),
          first(col("__v")).as("__v"))
        .select(col("__id"), col("__v"),
          col("__b.__cid").as("__cid"), col("__b.__cos").as("__cos"))

    def update(assigned: DataFrame): DataFrame =
      assigned
        .select(col("__cid"), posexplode(col("__v")).as(Seq("__i", "__x")))
        .groupBy("__cid", "__i")
        .agg(avg(col("__x")).as("__m"))
        .groupBy("__cid")
        .agg(array_sort(collect_list(struct(col("__i"), col("__m"))))
          .as("__p"))
        .select(col("__cid"),
          expr("transform(__p, p -> p.__m)").as("__cvec"))

    var assigned = assignTo(cents)
    for (_ <- 2 to iters) {
      cents = update(assigned)
      assigned = assignTo(cents)
    }
    assigned.select(col("__id").as(idCol),
      col("__cid").as("cluster_id"), col("__cos").as("cosine_sim"))
  }

  /** SemDeDup: k-means-cluster the embeddings, then within each cluster
    * mark every vector that has a LOWER-id cluster-mate with cosine
    * above `tau` as a near-duplicate (kept = false) — the keep-first
    * policy of Dedup.keepCanonical applied in embedding space. Returns
    * (idCol, cluster_id, kept).
    *
    * Scale: the pairwise pass is quadratic only WITHIN a cluster, which
    * is the SemDeDup design point — k scales with corpus size to keep
    * clusters bounded. The expansion goes through
    * [[Dedup.boundedBucketPairs]] keyed on cluster_id: clusters up to
    * `maxCluster` members expand via one sorted collect_list row;
    * clusters LARGER than that (k chosen too small, or a boilerplate
    * corpus collapsing into one cluster) switch to a cluster-equi
    * self-join — identical pair set, bounded row width, no single
    * aggregation buffer ever holds a mega-cluster's (id, vector) array.
    */
  def semDedup(emb: DataFrame, embCol: String, idCol: String,
               k: Int, iters: Int, tau: Double,
               maxCluster: Int = 1024): DataFrame = {
    // the assignment feeds BOTH the pair expansion and the final
    // kept-flag join — cache the NARROW (id, cluster_id, cos) frame so
    // the whole k-means chain (iters broadcast-assign passes) runs
    // once, not once per consumer; vectors are re-attached only where
    // the pairwise pass needs them (fixed-width cached rows, corpus-
    // linear, spill-safe — the same discipline as resolveClusters)
    val asg = kmeansAssign(emb, embCol, idCol, k, iters).cache()
    // entry struct leads with the id so the pair expansion's ordering
    // (and the id_a < id_b orientation) is by id, matching keep-first
    val entries = asg
      .join(emb.select(col(idCol).cast("long").as(idCol),
        col(embCol).as("__v")), Seq(idCol))
      .select(col("cluster_id").as("__bucket"),
        struct(col(idCol).as("id"), col("__v").as("v")).as("__e"))
    val drops = Dedup.boundedBucketPairs(entries, "__bucket", "__e",
        maxCluster, (x, y) => struct(
          x.getField("id").as("id_a"), y.getField("id").as("id_b"),
          Similarity.cosine(x.getField("v"), y.getField("v")).as("cos")))
      .where(col("p.cos") > tau)
      .select(col("p.id_b").as(idCol)).distinct()
      .withColumn("__dup", lit(true))
    asg.join(drops, Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        coalesce(col("__dup"), lit(false)).unary_!.as("kept"))
  }
}
