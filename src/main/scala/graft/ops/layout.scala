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
