package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Graph, Profiling, Urls}

/** Unit coverage for the profiling / analytics ops behind q123-q129. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports rows, nulls and distincts per column") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None))
      .toDF("id", "v")
    val out = rows(Profiling.profile(df, Seq("id", "v")).orderBy("col_name"))
    assert(out == Seq(Seq("id", 3L, 0L, 3L), Seq("v", 3L, 1L, 1L)))
  }

  test("profile approx mode stays within HLL tolerance") {
    val df = (1L to 1000L).toDF("id")
    val Seq(Seq(_, _, _, d)) =
      rows(Profiling.profile(df, Seq("id"), exact = false))
    val est = d.asInstanceOf[Long]
    assert(math.abs(est - 1000L) <= 100L) // 2% rsd sketch, 3-sigma-ish
  }

  test("dupKeys and fkOrphans find exactly the violations") {
    val child = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 99L))
      .toDF("id", "parent_id")
    assert(rows(Profiling.dupKeys(child, Seq("id"))) == Seq(Seq(2L, 2L)))
    val parent = Seq(10L, 11L).toDF("pid")
    val orphans = Profiling.fkOrphans(child, parent, "parent_id", "pid")
    assert(rows(orphans.select("id", "parent_id")) == Seq(Seq(3L, 99L)))
  }

  test("psi is ~0 for identical distributions and grows with drift") {
    val base = (1 to 100).map(_.toDouble).toDF("v")
    val same = rows(Profiling.psi(base, base, col("v"), 0.0, 100.0))
      .head.head.asInstanceOf[Double]
    assert(math.abs(same) < 1e-12)
    // shift the whole distribution up by half the range: heavy drift
    val shifted = (1 to 100).map(_ + 50.0).toDF("v")
    val drift = rows(Profiling.psi(base, shifted, col("v"), 0.0, 100.0))
      .head.head.asInstanceOf[Double]
    assert(drift > 0.25, s"expected retrain-grade drift, got $drift")
    // out-of-range values clamp to edge bins rather than vanish:
    // totals still cover every row, so proportions sum to 1 per side
    val wild = Seq(-500.0, 1e6).toDF("v")
    val clamped = rows(Profiling.psi(wild, wild, col("v"), 0.0, 100.0))
      .head.head.asInstanceOf[Double]
    assert(math.abs(clamped) < 1e-12)
    // nulls are excluded, not bucketed
    val withNull = Seq(Some(10.0), None).toDF("v")
    val nn = rows(Profiling.psi(withNull, withNull, col("v"), 0.0, 100.0))
      .head.head.asInstanceOf[Double]
    assert(math.abs(nn) < 1e-12)
  }

  test("violationCounts unions named single-row counts") {
    val a = Seq(1, 2).toDF("x")
    val out = Profiling.violationCounts(Seq(
      "some" -> a.filter($"x" > 1), "none" -> a.filter($"x" > 9)))
    assert(rows(out.orderBy("check_name")) ==
      Seq(Seq("none", 0L), Seq("some", 1L)))
  }

  test("Urls.features extracts host shape and query flag") {
    val df = Seq("https://cdn7.example.de/a/b/c?x=1",
        "http://example.de/", "not a url").toDF("u")
      .select(Urls.features(col("u")).as("f"))
      .select("f.host", "f.tld", "f.subdomain_dots", "f.path_depth",
        "f.host_digit_ratio", "f.has_query")
    val out = rows(df)
    assert(out(0) == Seq("cdn7.example.de", "de", 2L, 3L, 1.0 / 15, true))
    assert(out(1) == Seq("example.de", "de", 1L, 0L, 0.0, false))
    // malformed input degrades to empty host, never throws
    assert(out(2).head == "" && out(2)(5) == false)
  }

  test("Graph.degrees zero-fills nodes missing a side") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 2L)).toDF("src", "dst")
    val out = rows(Graph.degrees(edges).orderBy("node"))
    // dup edge 1->2 collapses; node 3 has no out-edges, node 1 no in
    assert(out == Seq(Seq(1L, 2L, 0L), Seq(2L, 1L, 1L), Seq(3L, 0L, 2L)))
  }

  test("winsorize clamps to per-group quantile cutoffs and keeps all rows") {
    val df = (Seq.tabulate(21)(i => ("g", i.toLong)) :+ (("h", 1000L)))
      .toDF("grp", "v")
    val out = Curation.winsorize(df, "grp", "v", 0.05, 0.95)
    assert(out.count() == 22) // nothing dropped
    val g = out.filter($"grp" === "g")
    // p05 of 0..20 = 1, p95 = 19 -> 0 clamps up, 20 clamps down
    assert(rows(g.filter($"v" === 0L).select("v_w")).head == Seq(1.0))
    assert(rows(g.filter($"v" === 20L).select("v_w")).head == Seq(19.0))
    assert(rows(g.filter($"v" === 10L).select("v_w")).head == Seq(10.0))
    // single-row group: both cutoffs equal the value, identity clamp
    assert(rows(out.filter($"grp" === "h").select("v_w")).head == Seq(1000.0))
  }

  test("kAnonymity counts re-identifiable rows and classes") {
    import spark.implicits._
    // classes: (a,x) size 3, (a,y) size 2, (b,x) size 1
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"),
      ("a", "y"), ("a", "y"), ("b", "x")).toDF("q1", "q2")
    val r3 = Profiling.kAnonymity(df, Seq("q1", "q2"), k = 3).head()
    assert(r3.getLong(0) === 3L)     // classes
    assert(r3.getLong(1) === 2L)     // violating classes (<3)
    assert(r3.getLong(2) === 3L)     // violating rows (2 + 1)
    assert(r3.getLong(3) === 1L)     // min class size
    val r2 = Profiling.kAnonymity(df, Seq("q1", "q2"), k = 2).head()
    assert(r2.getLong(1) === 1L && r2.getLong(2) === 1L)
    // unique-id worst case: every row violates
    val ids = spark.range(10).toDF("id")
    val ru = Profiling.kAnonymity(ids, Seq("id"), k = 2).head()
    assert(ru.getLong(2) === 10L)
    intercept[IllegalArgumentException] {
      Profiling.kAnonymity(df, Seq.empty, k = 2)
    }
  }

  test("ksOfHists: 0 for identical, location-sensitive where PSI is " +
      "quiet, bounded by 1") {
    import spark.implicits._
    def hist(xs: Seq[(Int, Long)]) = xs.toDF("bucket", "n")
    val base = hist(Seq(0 -> 100L, 1 -> 100L, 2 -> 100L, 3 -> 100L))
    assert(Profiling.ksOfHists(base, base).head().getDouble(0) === 0.0)
    // one-bucket monotone shift: every bin's density ratio is mild
    // (PSI small) but the cumulative gap is large at the crossover
    val shifted = hist(Seq(0 -> 40L, 1 -> 160L, 2 -> 100L, 3 -> 100L))
    val ks = Profiling.ksOfHists(base, shifted).head().getDouble(0)
    assert(ks > 0.1 && ks <= 1.0, s"ks=$ks")
    // disjoint supports: KS = 1 (all mass before vs after)
    val lo = hist(Seq(0 -> 10L, 1 -> 10L))
    val hi = hist(Seq(2 -> 10L, 3 -> 10L))
    assert(Profiling.ksOfHists(lo, hi).head().getDouble(0) === 1.0)
    // raw-frame form agrees with hand bucketing
    val a = Seq.tabulate(100)(i => i.toDouble).toDF("v")
    val b = Seq.tabulate(100)(i => i.toDouble + 30).toDF("v")
    val r = Profiling.ks(a, b, $"v", 0.0, 100.0, 10).head()
    assert(r.getDouble(0) > 0.25 && r.getLong(1) === 100L &&
      r.getLong(2) === 100L)
  }

  test("bootstrapMeanCI: band brackets the mean, collapses on constants, " +
      "and is partition-stable") {
    val df = (Seq.tabulate(60)(i => ("mix", i.toLong, (i % 30).toLong * 10))
      ++ Seq.tabulate(40)(i => ("const", 100L + i, 7L)))
      .toDF("grp", "id", "v")
    val out = Profiling.bootstrapMeanCI(df, "grp", "v", $"id", reps = 64)
      .orderBy("grp").collect()
    val mix = out.find(_.getString(0) == "mix").get
    assert(mix.getDouble(3) <= mix.getDouble(2) &&
      mix.getDouble(2) <= mix.getDouble(4),
      s"mean ${mix.getDouble(2)} outside [${mix.getDouble(3)}, " +
        s"${mix.getDouble(4)}]")
    assert(mix.getDouble(4) > mix.getDouble(3), "varied group has zero-width CI")
    // constant values: every replicate mean is the value -> degenerate band
    val c = out.find(_.getString(0) == "const").get
    assert(c.getDouble(2) === 7.0 && c.getDouble(3) === 7.0 &&
      c.getDouble(4) === 7.0)
    // md5-derived weights: identical output under a different layout
    val re = Profiling.bootstrapMeanCI(df.repartition(7), "grp", "v",
      $"id", reps = 64).orderBy("grp").collect()
    assert(out.map(_.toSeq).toSeq === re.map(_.toSeq).toSeq)
  }
}
