package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Z-order (Morton) interleaving of bucketed
  * dimensions, the write-time ordering that makes parquet row-group
  * min/max statistics selective on SEVERAL columns at once. A 100 TB
  * table range-partitioned by z-value gives every file a small
  * bounding box in (dim1, dim2) space, so a scan filtered on either
  * dimension (or both) skips most row groups — the effect ORDER BY on
  * a single column only buys for that column.
  *
  * Buckets are fixed-width over caller-pinned [lo, hi) ranges (edge
  * values clamp) and the interleave is statically unrolled integer
  * arithmetic — deterministic and engine-portable, no sampling or
  * rank windows anywhere.
  */
object Layout {

  /** 2^bits fixed-width bucket of a value over [lo, hi); out-of-range
    * clamps to the edge buckets. Null propagates (null in → null
    * bucket): mapping a missing dimension into bucket 0 would z-cluster
    * null rows with the lowest value range, so `WHERE c IS NULL` and
    * `WHERE c < lo+ε` scans would each read the other population's row
    * groups and min/max skipping degrades for both. [[zorderBy]] routes
    * null buckets to a dedicated z-range past the real domain instead. */
  def zBucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val n = 1L << bits
    // greatest/least SKIP nulls (they return the extreme non-null
    // argument), so the null path must be explicit or null collapses
    // into bucket 0 via greatest(null, 0)
    when(c.isNotNull,
      least(greatest(
        floor((c.cast("double") - lit(lo)) / lit((hi - lo) / n))
          .cast("long"), lit(0L)), lit(n - 1)))
  }

  /** Morton interleave of two `bits`-wide bucket columns: bit i of `a`
    * goes to position 2i+1, bit i of `b` to 2i — statically unrolled
    * shifts and masks, one codegen'd expression. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Hilbert-curve index of two `bits`-wide bucket columns — the
    * alternative to [[zValue2]] with strictly better locality:
    * CONSECUTIVE Hilbert indices are always grid-adjacent cells
    * (Manhattan distance 1), so a contiguous index range maps to a
    * more compact spatial region than the Morton curve, whose bit
    * carries make long diagonal jumps. At write time that means each
    * range-partitioned file covers a tighter (c1, c2) bounding box →
    * better row-group min/max skipping for the same file count.
    *
    * Implementation: the classic per-level reflect-and-rotate
    * recurrence (Wikipedia xy2d), laid out as ONE chained projection
    * per bit level — each level's (x, y, d) is a named column computed
    * from the previous level's columns, so the logical plan grows
    * LINEARLY in `bits` (a single nested expression would double per
    * level) and whole-stage codegen fuses all levels into one function
    * anyway. Null in either bucket → null index (callers route nulls
    * to a sentinel, as [[hilbertOrderBy]] does). Adds `out` and leaves
    * every other column untouched. */
  def hilbertValue2(df: DataFrame, a: Column, b: Column, bits: Int,
                    out: String): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    var cur = df
      .withColumn("__ha", a.cast("long"))
      .withColumn("__hb", b.cast("long"))
      .withColumn("__hx", coalesce(a.cast("long"), lit(0L)))
      .withColumn("__hy", coalesce(b.cast("long"), lit(0L)))
      .withColumn(out, lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = when(col("__hx").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      val ry = when(col("__hy").bitwiseAND(lit(s)) > 0, lit(1L))
        .otherwise(lit(0L))
      // one withColumns per level: d-accumulate, then reflect+rotate —
      // all three read the PREVIOUS level's columns simultaneously
      cur = cur.withColumns(Map(
        out -> (col(out) +
          lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)),
        "__hx" -> when(ry === 0,
            when(rx === 1, lit(s - 1) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")),
        "__hy" -> when(ry === 0,
            when(rx === 1, lit(s - 1) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy"))))
    }
    cur.withColumn(out,
        when(col("__ha").isNotNull && col("__hb").isNotNull, col(out)))
      .drop("__ha", "__hb", "__hx", "__hy")
  }

  /** [[zorderBy]] with the Hilbert index as the clustering key: same
    * bucket semantics, same null-sentinel routing (nulls to
    * z = 2^(2·bits), past every real index), tighter per-file bounding
    * boxes (see [[hilbertValue2]]). One geometric difference from the
    * Morton layout: the Hilbert curve ENDS at the (c1 max, c2 = 0)
    * corner, so the sentinel tail partition adjoins that corner's rows
    * (Morton's max z is the high-high corner) — nulls are still
    * isolated from the curve's start and middle, which is what the
    * min/max-skipping argument needs. */
  def hilbertOrderBy(df: DataFrame, c1: Column, lo1: Double, hi1: Double,
                     c2: Column, lo2: Double, hi2: Double,
                     bits: Int, numPartitions: Int): DataFrame =
    hilbertValue2(df, zBucket(c1, lo1, hi1, bits),
        zBucket(c2, lo2, hi2, bits), bits, "__hz")
      .withColumn("__hz", coalesce(col("__hz"), lit(1L << (2 * bits))))
      .repartitionByRange(numPartitions, col("__hz"))
      .sortWithinPartitions("__hz")
      .drop("__hz")

  /** Repartition-by-range on the z-value of two bucketed dimensions —
    * the write-side clustering pass: each output partition (= file at
    * write time) covers a contiguous z-range, i.e. a small rectangle
    * in (c1, c2) space. Rows where EITHER dimension is null get the
    * sentinel z = 2^(2·bits) — strictly above every real interleave
    * value — so they range-partition into a dedicated tail partition
    * and never share row groups with the low-range population
    * (LayoutSpec property). */
  def zorderBy(df: DataFrame, c1: Column, lo1: Double, hi1: Double,
               c2: Column, lo2: Double, hi2: Double,
               bits: Int, numPartitions: Int): DataFrame = {
    // zValue2's bitwise ops propagate a null bucket to a null z;
    // coalesce lifts those rows past the max real z (2^(2·bits) - 1)
    val z = coalesce(
      zValue2(zBucket(c1, lo1, hi1, bits),
        zBucket(c2, lo2, hi2, bits), bits),
      lit(1L << (2 * bits)))
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
