package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Scale}
import graft.pipelines.Pipelines

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches plain join on a skewed key distribution") {
    // 90% of fact rows share one key — the classic hot-key shape
    val fact = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v")
    val dim = Seq((1L, "hot"), (950L, "cold")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).agg(count(lit(1)), sum("v")).head()
    val salted = Scale.saltedJoin(fact, dim, Seq("k"), saltBuckets = 8)
      .agg(count(lit(1)), sum("v")).head()
    assert(salted === plain)
    // left join keeps unmatched fact rows exactly once
    val plainLeft = fact.join(dim, Seq("k"), "left").count()
    val saltedLeft = Scale.saltedJoin(fact, dim, Seq("k"), 8, "left").count()
    assert(saltedLeft === plainLeft)
  }

  test("bloomPrefilteredJoin matches the plain join and prunes the big side") {
    val big = (1L to 5000L).map(k => (k, k * 2)).toDF("bk", "x")
    val small = (1L to 5000L).filter(_ % 100 == 0).map(k => (k, s"d$k"))
      .toDF("sk", "name")
    val plain = big.join(small, col("bk") === col("sk"))
      .agg(count(lit(1)), sum("x")).head()
    val pre = Scale.bloomPrefilteredJoin(big, small, "bk", "sk",
      expectedItems = 100, fpp = 0.01)
    assert(pre.agg(count(lit(1)), sum("x")).head() === plain)
    // the probe itself must discard ~99% of the big side pre-shuffle:
    // re-apply just the sketch filter and check the surviving fraction
    val bloom = small.stat.bloomFilter("sk", 100, 0.01)
    val kept = big.where(graft.functions.GraftFunctions
      .bloomMightContain(bloom, col("bk"))).count()
    assert(kept >= 50 && kept < 500, s"bloom kept $kept of 5000")
  }

  test("resolveClusters: min-label propagation finds connected components") {
    // chain 1-2-3, pair 10-11, chain 20-21-22-23 (diameter 3)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L)).toDF("id_a", "id_b")
    val clusters = Dedup.resolveClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L))
  }

  test("ivfTopK assignment is row-local: no corpus shuffle, no window sort") {
    import graft.ops.Similarity
    // corpus already at defaultParallelism so Scale.widen is a no-op and
    // any Exchange left in the plan would be one the operator itself added
    val corpus = (0L until 200L)
      .map(i => (i, Array.tabulate(8)(d => ((i + d) % 7).toFloat)))
      .toDF("vec_id", "embedding")
      .repartition(spark.sparkContext.defaultParallelism)
    val centroids = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val q = array((0 until 8).map(i => lit(i.toDouble)): _*)
    val df = Similarity.ivfTopK(corpus, "embedding", "vec_id", centroids,
      q, nprobe = 2, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    // corpus side: broadcast joins only, zero hash shuffles (the probe
    // side may window-sort, but only over the nlist centroid rows)
    assert(!"Exchange hashpartitioning".r.findFirstIn(plan).isDefined,
      s"corpus got shuffled:\n$plan")
    assert(df.count() === 5)
  }

  test("row-local token analytics (topToken/tokenEntropy) never shuffle") {
    import graft.ops.Text
    val docs = (1L to 300L).map(i => (i, s"alpha beta beta doc$i gamma"))
      .toDF("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    val df = docs
      .withColumn("toks", Text.tokens(col("text")))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"),
        Text.topToken(col("toks")).as("tt"),
        Text.tokenEntropy(col("toks")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the only Exchange is the fixture's own round-robin repartition; the
    // folds themselves must add no hash shuffle (and no window sort)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"per-doc fold got shuffled:\n$plan")
    assert(!plan.contains("Window"), s"per-doc fold used a window:\n$plan")
    val row = df.orderBy("doc_id").select(col("tt.token"), col("h")).head()
    assert(row.getString(0) === "beta") // 2 betas beat the asc-earlier alpha
    assert(row.getDouble(1) > 0.0)
  }

  test("fuzzy join plans as broadcast nested loop — no fact-side shuffle") {
    import graft.ops.Joins
    val fact = (1 to 500).map(i => (i.toLong, s"city-$i")).toDF("bid", "hotelort")
      .repartition(spark.sparkContext.defaultParallelism)
    val dim = Seq(("city-7", 1L), ("ville-9", 2L)).toDF("slug", "page_id")
    val plan = Joins.fuzzy(fact, dim, "hotelort", "slug", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("bucketed tables join without a shuffle on the bucketed key") {
    Seq("bkt_pages", "bkt_links").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val a = (1 to 500).map(i => (i.toLong, s"page-$i")).toDF("key", "title")
    val b = (1 to 500).flatMap(i => Seq((i.toLong, s"in-$i")))
      .toDF("key", "anchor")
    Pipelines.writeBucketed(a, "bkt_pages", "key", 4)
    Pipelines.writeBucketed(b, "bkt_links", "key", 4)
    // force a sort-merge join (tiny test tables would otherwise broadcast)
    // to show the bucketed co-location removes the shuffle entirely
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_pages").join(spark.table("bkt_links"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() === 500)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("writeSortedByRange: disjoint per-file key ranges, sorted within") {
    val dir = java.nio.file.Files.createTempDirectory("graft-range-").toFile
    val out = new java.io.File(dir, "sorted").getAbsolutePath
    try {
      val df = (1 to 2000).map(i => ((i * 7919) % 2003, s"v$i"))
        .toDF("key", "v")
      Scale.writeSortedByRange(df, out, Seq("key"), 4)
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
      assert(files.length > 1, "expected multiple range files")
      // each file internally sorted on key, and file ranges disjoint
      val ranges = files.map { f =>
        val keys = spark.read.parquet(f).select("key")
          .collect().map(_.getInt(0)).toSeq
        assert(keys == keys.sorted, s"file $f not sorted")
        (keys.min, keys.max)
      }
      ranges.sortBy(_._1).toSeq.sliding(2).foreach {
        case Seq((_, hi), (lo, _)) =>
          assert(hi <= lo, s"overlapping file ranges: hi=$hi lo=$lo")
        case _ =>
      }
      // nothing lost in the layout
      assert(spark.read.parquet(out).count() === 2000)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir).deleteRecursively()
    }
  }

  test("join strategy hints steer the planner without changing results") {
    import spark.implicits._
    // the dimension side is large enough that relying on auto-broadcast
    // would be a size-estimate gamble; hints make the choice explicit
    val facts = (1L to 5000L).map(i => (i % 97, i)).toDF("k", "v")
    val dim = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "name")
    val expected = rows(facts.join(dim, "k").groupBy("name")
      .agg(sum("v").as("s")).orderBy("name"))
    Seq("broadcast", "shuffle_hash", "merge").foreach { h =>
      val joined = facts.join(dim.hint(h), "k")
      val plan = joined.queryExecution.executedPlan.toString
      val marker = h match {
        case "broadcast" => "BroadcastHashJoin"
        case "shuffle_hash" => "ShuffledHashJoin"
        case "merge" => "SortMergeJoin"
      }
      assert(plan.contains(marker), s"hint $h did not plan $marker:\n$plan")
      assert(rows(joined.groupBy("name").agg(sum("v").as("s"))
        .orderBy("name")) == expected, s"hint $h changed results")
    }
  }
}
