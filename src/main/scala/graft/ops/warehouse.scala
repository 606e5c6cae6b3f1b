package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Warehouse maintenance operators: slowly-changing-dimension history
  * (SCD Type 2) and CDC change-stream application (latest-wins upsert
  * with delete tombstones) — the two table-maintenance patterns the
  * reference runs as full-table rewrites (replace-latest, SURVEY §2.2
  * K2) but that a warehouse needs in keyed, incremental form.
  *
  * Scale posture: both are one hash-shuffle on the business key followed
  * by a streaming per-key window — no driver state, no iteration, and
  * the change set (not the base table) dominates the shuffle for
  * applyCdc when the base side is bucketed on the key.
  */
object Warehouse {

  /** Compact a parquet table's small files: rewrite to
    * ceil(totalBytes / targetFileBytes) files (at least 1). The
    * small-files problem is the canonical warehouse-maintenance chore —
    * a streaming or per-batch writer leaves thousands of KB-scale files
    * whose open/footer overhead then dominates every scan. Uses
    * coalesce (no shuffle) since compaction only merges; pass
    * `shuffle = true` to rebalance skewed file sizes at the cost of one
    * exchange. Reads and rewrites via a temp directory so the table is
    * never half-overwritten on failure; the swap is a directory rename.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long, shuffle: Boolean = false): Int = {
    require(targetFileBytes > 0)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1,
      math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(path)
    val compacted = if (shuffle) df.repartition(nFiles) else df.coalesce(nFiles)
    val tmp = new org.apache.hadoop.fs.Path(
      hPath.getParent, s".${hPath.getName}.compact.tmp")
    compacted.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(hPath, true)
    fs.rename(tmp, hPath)
    nFiles
  }

  /** Write a corpus as deterministically-sharded JSON-Lines — the
    * interchange format LLM training stacks ingest. Shard membership is
    * md5-stable ([[Curation.shard]]), so reruns and engine changes
    * produce identical shard contents; `partitionBy` writes each shard
    * as its own directory in one pass. */
  def writeJsonlShards(df: DataFrame, idCol: String, path: String,
                       nShards: Int): Unit = {
    require(nShards > 0 && nShards <= 256, s"nShards in [1,256], got $nShards")
    df.withColumn("shard", Curation.shard(col(idCol), nShards))
      .repartition(col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").json(path)
  }

  /** Build SCD Type-2 validity intervals from a change log: one row per
    * change, `valid_from` = the change's own timestamp, `valid_to` = the
    * NEXT change's timestamp for the same key (null while current), and
    * `is_current` flagging the open interval.
    *
    * `ordering` must be a total order within a key (include a unique
    * tie-break column after the timestamp) or interval boundaries are
    * nondeterministic under ties.
    */
  def scd2(df: DataFrame, keyCols: Seq[String], ordering: Seq[Column],
           validFromCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("valid_from", col(validFromCol))
      .withColumn("valid_to", lead(col(validFromCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Incremental maintenance of a count/sum aggregate table: merge the
    * standing aggregate with a freshly-aggregated delta batch so the
    * result equals a full recompute over base ∪ delta — the
    * materialized-view refresh that lets a 100 TB warehouse update a
    * daily rollup by scanning only the new day. Works for any
    * commutative-monoid measures (counts, sums; avg = merged sum/count
    * downstream). Both inputs are already key-grained, so the merge is
    * a key-shuffle over aggregate rows, never over raw data.
    *
    * `measures` are summed with null treated as the monoid zero via a
    * full outer join on `keys` (a key present in only one side keeps its
    * values).
    */
  def mergeAggDelta(base: DataFrame, delta: DataFrame, keys: Seq[String],
                    measures: Seq[String]): DataFrame = {
    val d = measures.foldLeft(delta) { (df, m) =>
      df.withColumnRenamed(m, s"__d_$m")
    }
    measures.foldLeft(base.join(d, keys, "full_outer")) { (df, m) =>
      df.withColumn(m,
        coalesce(col(m), lit(0)) + coalesce(col(s"__d_$m"), lit(0)))
        .drop(s"__d_$m")
    }
  }

  /** Apply a CDC change stream to a base snapshot: per key, the
    * highest-`seq` change wins; a winning change whose `isDelete`
    * predicate holds removes the key from the result; keys untouched by
    * the stream keep their base row. Base and changes must share a
    * schema (the base is a snapshot of the same record shape).
    *
    * Changes outrank base rows at equal `seq` (the stream is newer
    * information than the snapshot it was captured against).
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
               seqCols: Seq[String], isDelete: Column): DataFrame = {
    val b = base.withColumn("__del", lit(false)).withColumn("__src", lit(0))
    val c = changes.withColumn("__del", isDelete).withColumn("__src", lit(1))
    // latest-wins is sequence-first: a replayed change CAPTURED BEFORE
    // the snapshot (lower seq) must not override the newer base row; the
    // stream outranks the base only at equal seq (__src breaks the tie)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((seqCols.map(col) :+ col("__src")).map(_.desc): _*)
    b.unionByName(c)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && !col("__del"))
      .drop("__rk", "__del", "__src")
  }
}
