package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Unit coverage for Z-order layout clustering (q177). */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue2 interleaves bits (hand-checked examples)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
    val got = rows(df.select(Layout.zValue2(col("a"), col("b"), 4)))
      .map(_.head)
    // a bits at odd positions, b bits at even: (1,0)->2, (0,1)->1,
    // (3,3)->15, (5,2)=(101,010)-> 100110b = 38
    assert(got == Seq(0L, 2L, 1L, 15L, 38L))
  }

  test("zBucket clamps out-of-range to edge buckets and propagates null") {
    val df = Seq(Some(-5.0), Some(0.0), Some(99.9), Some(500.0), None)
      .toDF("v")
    val got = rows(df.select(Layout.zBucket(col("v"), 0.0, 100.0, 4)))
      .map(_.head)
    // null must NOT collapse into bucket 0 — zorderBy gives null rows
    // a dedicated z-range instead (see the property test below)
    assert(got == Seq(0L, 0L, 15L, 15L, null))
  }

  test("null dimension rows never share partitions with low-range rows") {
    // pre-fix behavior mapped null -> bucket 0, z-clustering null rows
    // with the lowest value range so `WHERE value IS NULL` and
    // `WHERE value < ε` each read the other population's row groups.
    // The sentinel z = 2^(2·bits) sorts nulls past every real z value.
    val base = spark.range(1000).select(
      pmod(hash(col("id")), lit(160)).cast("double").as("user_id"),
      pmod(hash(col("id") * 2 + 1), lit(500)).cast("double").as("value"))
    val withNulls = base.union(spark.range(50).select(
      pmod(hash(col("id")), lit(160)).cast("double").as("user_id"),
      lit(null).cast("double").as("value")))
    val zed = Layout.zorderBy(withNulls, col("user_id"), 0.0, 160.0,
        col("value"), 0.0, 500.0, bits = 8, numPartitions = 8)
      .withColumn("p", spark_partition_id())
    val nullParts = zed.where(col("value").isNull)
      .select("p").distinct().collect().map(_.getInt(0)).toSet
    val lowParts = zed.where(col("value") < 50.0)
      .select("p").distinct().collect().map(_.getInt(0)).toSet
    assert(nullParts.nonEmpty, "null rows vanished from the layout")
    assert((nullParts intersect lowParts).isEmpty,
      s"null rows share partitions with low-range rows: " +
        s"$nullParts vs $lowParts")
  }

  test("zValue2 is a bijection on the full 8-bit x 8-bit domain") {
    val df = spark.range(65536).select(
      (col("id") / 256).cast("long").as("a"),
      (col("id") % 256).cast("long").as("b"))
    val z = df.select(Layout.zValue2(col("a"), col("b"), 8).as("z"))
    assert(z.agg(countDistinct("z")).head().getLong(0) === 65536L)
    assert(z.agg(min("z"), max("z")).head().toSeq === Seq(0L, 65535L))
  }

  test("hilbertValue2 is a bijection on the full 8-bit x 8-bit domain") {
    val df = spark.range(65536).select(
      (col("id") / 256).cast("long").as("a"),
      (col("id") % 256).cast("long").as("b"))
    val h = Layout.hilbertValue2(df, col("a"), col("b"), 8, "h")
    assert(h.agg(countDistinct("h")).head().getLong(0) === 65536L)
    assert(h.agg(min("h"), max("h")).head().toSeq === Seq(0L, 65535L))
  }

  test("hilbert adjacency: consecutive indices are grid-adjacent cells") {
    // THE Hilbert property (and the locality edge over Morton, whose
    // bit carries make long diagonal jumps): |d2 - d1| = 1 implies the
    // cells touch (Manhattan distance exactly 1). Checked exhaustively
    // over the full 6-bit grid via a self-join on h+1.
    val bits = 6
    val n = 1L << bits
    val df = spark.range(n * n).select(
      (col("id") / n).cast("long").as("a"),
      (col("id") % n).cast("long").as("b"))
    val h = Layout.hilbertValue2(df, col("a"), col("b"), bits, "h")
    val bad = h.alias("x")
      .join(h.alias("y"), col("x.h") + 1 === col("y.h"))
      .where(abs(col("x.a") - col("y.a")) + abs(col("x.b") - col("y.b"))
        =!= 1)
      .count()
    assert(bad === 0L, s"$bad consecutive-index pairs are not adjacent")
  }

  test("hilbertValue2 propagates null and hilbertOrderBy isolates nulls") {
    val df = Seq((Some(3L), Some(5L)), (None, Some(2L)), (Some(1L), None))
      .toDF("a", "b")
    val got = rows(Layout.hilbertValue2(df, col("a"), col("b"), 4, "h")
      .select("h")).map(_.head)
    assert(got(1) == null && got(2) == null)
    val base = spark.range(1000).select(
      pmod(hash(col("id")), lit(160)).cast("double").as("user_id"),
      pmod(hash(col("id") * 2 + 1), lit(500)).cast("double").as("value"))
    val withNulls = base.union(spark.range(50).select(
      pmod(hash(col("id")), lit(160)).cast("double").as("user_id"),
      lit(null).cast("double").as("value")))
    val hed = Layout.hilbertOrderBy(withNulls, col("user_id"), 0.0, 160.0,
        col("value"), 0.0, 500.0, bits = 8, numPartitions = 8)
      .withColumn("p", spark_partition_id())
    val nullParts = hed.where(col("value").isNull)
      .select("p").distinct().collect().map(_.getInt(0)).toSet
    // the sentinel tail adjoins the curve's ENDPOINT corner
    // (c1 high, c2 = 0 in this orientation) — so the isolation
    // guarantee is against the curve's start/middle, not low-c2 rows
    // as in the Morton layout (whose max z is the high-high corner)
    val startParts = hed
      .where(col("value").isNotNull && col("user_id") < 80.0)
      .select("p").distinct().collect().map(_.getInt(0)).toSet
    assert(nullParts.nonEmpty)
    assert((nullParts intersect startParts).isEmpty,
      s"null rows share partitions with curve-start rows: " +
        s"$nullParts vs $startParts")
  }

  test("hilbert partitions bound both dimensions at least as well as z") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("value"))
    def meanExtent(df: org.apache.spark.sql.DataFrame,
                   c: String, w: Double): Double =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(((max(c) - min(c)) / w).as("ext"))
        .agg(avg("ext")).head().getDouble(0)
    val hed = Layout.hilbertOrderBy(ev, col("user_id"), 0.0, 160.0,
      col("value"), 0.0, 500.0, bits = 8, numPartitions = 16)
    assert(meanExtent(hed, "value", 500.0) < 0.5)
    assert(meanExtent(hed, "user_id", 160.0) < 0.6)
  }

  test("z-ordered partitions bound the extent of BOTH dimensions") {
    // the z-order win over single-column range partitioning is not a
    // smaller bounding AREA (partitioning by user alone collapses the
    // user extent to ~0 when #users <= #partitions) — it is that a
    // filter on the OTHER column can also skip: every partition covers
    // a fraction of the value range too, which user-partitioning never
    // bounds
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("user_id"), col("value"))
    def meanExtent(df: org.apache.spark.sql.DataFrame,
                   c: String, w: Double): Double =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(((max(c) - min(c)) / w).as("ext"))
        .agg(avg("ext")).head().getDouble(0)
    val zed = Layout.zorderBy(ev, col("user_id"), 0.0, 160.0,
      col("value"), 0.0, 500.0, bits = 8, numPartitions = 16)
    val oneDim = ev.repartitionByRange(16, col("user_id"))
    val zValueExt = meanExtent(zed, "value", 500.0)
    val oneValueExt = meanExtent(oneDim, "value", 500.0)
    // user-partitioning leaves ~the full value range in every
    // partition; z-order bounds it
    assert(zValueExt < oneValueExt * 0.5,
      s"z value-extent $zValueExt not < half of 1-dim $oneValueExt")
    // and the user extent stays bounded as well (not the full range)
    assert(meanExtent(zed, "user_id", 160.0) < 0.6)
  }
}
