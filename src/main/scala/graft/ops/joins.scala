package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join operators beyond plain equi-joins (SURVEY §2.5).
  *
  * The reference delegates all joins to its warehouse SQL; the two shapes
  * its snapshot/append-history data model implies but Spark lacks as
  * built-ins are implemented here Spark-first:
  *
  *  - as-of join: window-over-union, NOT a custom physical operator
  *    (SURVEY §2.5 "if added for snapshot alignment, implement as
  *    window-over-union"). One shuffle on the key, no range explosion.
  *  - range join against a small band table: broadcast nested-loop — the
  *    dim side is tiny, so Catalyst's BroadcastNestedLoopJoin is exactly
  *    the right physical plan at any fact-side scale.
  */
object Joins {

  /** As-of join: for every left row, attach `valueCol` from the latest
    * right row with rightTs <= leftTs on the same key.
    *
    * Implementation: tag right rows side=0 and left rows side=1, union on
    * (key, ts, side), then `last(value, ignoreNulls)` over a running window
    * partitioned by key. Right rows at the exact same ts sort before left
    * rows, giving <= semantics; `tieBreak` makes duplicate-ts right rows
    * deterministic (highest tieBreak wins).
    *
    * Scale: one hash shuffle on `keys` (the window), zero joins — at 100 TB
    * this beats a range self-join by orders of magnitude because no
    * candidate pairs ever materialize.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, valueCol: String,
           tieBreak: String, asCol: String = "asof_value"): DataFrame = {
    val keptLeft = left.columns.toSeq
    // The value rides in a one-field struct: the struct wrapper is non-null
    // for every matched right row even when the VALUE itself is null, so
    // last(ignoreNulls) attaches the latest right row faithfully instead of
    // skipping null-valued rows and resurrecting a stale older value.
    val vWrapType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(valueCol).dataType)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(vWrapType))
      .withColumn("__tb", lit(null).cast(right.schema(tieBreak).dataType))
    val r = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__ts"), lit(0).as("__side"),
      struct(col(valueCol).as("v")).as("__v"), col(tieBreak).as("__tb")): _*)
    val unioned = Unions.unionPermissive(l, r)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(asCol, last("__v", ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 1)
      .select(keptLeft.map(col) :+ col(asCol): _*)
  }

  /** Range (theta) join of a fact table against a small band dimension:
    * fact.valueCol in [lo, hi). Broadcasts the band table explicitly. */
  def bandJoin(fact: DataFrame, bands: DataFrame, valueCol: String,
               lo: String, hi: String): DataFrame =
    fact.join(broadcast(bands),
      col(valueCol) >= col(lo) && col(valueCol) < col(hi))

  /** Big-big interval join — the shape [[bandJoin]]'s broadcast
    * nested-loop CANNOT serve: both sides at corpus scale, left rows
    * carrying a point `tsCol`, right rows an interval
    * [`startCol`, `endCol`], matched when start ≤ ts ≤ end. Both sides
    * bucket onto a fixed grid of `cellWidth`: a point lands in exactly
    * ONE cell, an interval replicates to every cell it overlaps, and
    * the match becomes an EQUI-join on the cell id plus the exact range
    * predicate — Spark plans a shuffled hash join keyed on the cell,
    * partition-parallel on both sides, no broadcast, no nested loop,
    * no per-pair candidate explosion beyond genuine cell co-residents.
    * (The grid-blocking standard for temporal/spatial joins; q144's
    * co-occurrence blocking is the self-join special case.) A matching
    * pair meets in exactly one cell (the point's), so no distinct pass
    * is needed.
    *
    * Tuning: replication per interval = len/cellWidth + 1; comparisons
    * per cell ≈ points-in-cell × intervals-overlapping-cell. Set
    * `cellWidth` near the TYPICAL interval length. `maxCells` is a
    * hard guard — an interval spanning more cells fails loudly
    * (raise_error) instead of silently exploding the build side; route
    * genuinely-long intervals through a coarser grid or [[bandJoin]].
    * Columns must be numeric (epoch micros for time). */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
                        tsCol: String, startCol: String, endCol: String,
                        cellWidth: Long, maxCells: Int = 64): DataFrame = {
    require(cellWidth > 0, s"cellWidth must be positive, got $cellWidth")
    require(maxCells >= 1, s"maxCells must be >= 1, got $maxCells")
    val pc = points
      .withColumn("__cell", floor(col(tsCol) / cellWidth).cast("long"))
    // null bounds match NOTHING under the range predicate, exactly as
    // in the theta join this replaces — drop them before the guard so
    // a null span can never reach (and trip) the raise_error branch
    val ic = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull)
      .withColumn("__c0", floor(col(startCol) / cellWidth).cast("long"))
      .withColumn("__c1", floor(col(endCol) / cellWidth).cast("long"))
      .withColumn("__c1", when(col("__c1") - col("__c0") < maxCells,
        col("__c1")).otherwise(raise_error(concat(
          lit(s"bucketedRangeJoin: interval spans >= $maxCells cells of " +
            s"width $cellWidth ("), col(startCol).cast("string"), lit(".."),
          col(endCol).cast("string"),
          lit(") — widen cellWidth or pre-split")))))
      .withColumn("__cell", explode(sequence(col("__c0"), col("__c1"))))
      .drop("__c0", "__c1")
    pc.join(ic, Seq("__cell"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__cell")
  }

  /** Levenshtein-bounded fuzzy join of a fact table against a small
    * dimension (SURVEY §2.5 bookings ⋈ pages on hotelort/land vs page
    * levels, Midoco/product_data.py:73-96): rows match when
    * edit_distance(factKey, dimKey) <= maxDist, case-insensitively.
    *
    * Scale: the dim side broadcasts (BroadcastNestedLoopJoin — correct
    * for a theta join against a small side at any fact-side scale), and
    * a |length difference| > maxDist pre-filter rejects most candidates
    * before the O(|a|·|b|) edit-distance evaluation. For dim sides too
    * big to broadcast, block first (e.g. on soundex/first letter) and
    * equi-join the block key. */
  def fuzzy(fact: DataFrame, dim: DataFrame, factKey: String,
            dimKey: String, maxDist: Int): DataFrame =
    fact.join(broadcast(dim),
      abs(length(col(factKey)) - length(col(dimKey))) <= maxDist &&
      levenshtein(lower(col(factKey)), lower(col(dimKey))) <= maxDist)
}
