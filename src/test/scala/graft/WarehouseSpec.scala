package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Warehouse}

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def changeLog = Seq(
    (1L, ts("2024-01-01 00:00:00"), "bronze"),
    (1L, ts("2024-03-01 00:00:00"), "silver"),
    (1L, ts("2024-06-01 00:00:00"), "gold"),
    (2L, ts("2024-02-01 00:00:00"), "bronze")
  ).toDF("cust", "at", "tier")

  test("scd2 chains intervals per key and flags the open one") {
    val out = rows(Warehouse.scd2(changeLog, Seq("cust"),
        Seq(col("at").asc), "at")
      .select("cust", "tier", "valid_to", "is_current")
      .orderBy("cust", "valid_from"))
    assert(out == Seq(
      Seq(1L, "bronze", ts("2024-03-01 00:00:00"), false),
      Seq(1L, "silver", ts("2024-06-01 00:00:00"), false),
      Seq(1L, "gold", null, true),
      Seq(2L, "bronze", null, true)))
  }

  test("scd2 tie-break ordering makes boundaries deterministic") {
    val tied = Seq((1L, ts("2024-01-01 00:00:00"), 10L, "a"),
      (1L, ts("2024-01-01 00:00:00"), 20L, "b")).toDF("k", "at", "seq", "v")
    val out = rows(Warehouse.scd2(tied, Seq("k"),
        Seq(col("at").asc, col("seq").asc), "at")
      .select("v", "is_current").orderBy("seq"))
    // same timestamp: seq decides which row is the open interval
    assert(out == Seq(Seq("a", false), Seq("b", true)))
  }

  private def base = Seq(
    (1L, 1L, "keep-me", 100.0),
    (2L, 2L, "stale", 50.0),
    (3L, 3L, "to-delete", 75.0)
  ).toDF("k", "seq", "v", "x")

  private def changes = Seq(
    (2L, 5L, "updated", 60.0),   // newer seq -> replaces base row
    (2L, 4L, "older-change", 55.0), // loses to seq=5 within the stream
    (3L, 9L, "DEL", 0.0),        // tombstone -> key 3 drops out
    (4L, 7L, "inserted", 20.0)   // new key -> appears
  ).toDF("k", "seq", "v", "x")

  test("applyCdc: latest change wins, tombstones delete, base survives untouched keys") {
    val out = rows(Warehouse.applyCdc(base, changes, Seq("k"), Seq("seq"),
      col("v") === "DEL").select("k", "v").orderBy("k"))
    assert(out == Seq(Seq(1L, "keep-me"), Seq(2L, "updated"),
      Seq(4L, "inserted")))
  }

  test("applyCdc: a change at the base row's own seq still wins (stream is newer)") {
    val tied = Seq((1L, 1L, "from-stream", 0.0)).toDF("k", "seq", "v", "x")
    val out = rows(Warehouse.applyCdc(base, tied, Seq("k"), Seq("seq"),
      lit(false)).filter($"k" === 1L).select("v"))
    assert(out == Seq(Seq("from-stream")))
  }

  test("applyCdc: a STALE replayed change (lower seq) cannot override") {
    // base k=1 is at seq=1; a replay captured before the snapshot
    // carries seq=0 — latest-wins is sequence-first, so the base row
    // survives (absolute stream precedence would corrupt the table on
    // any at-least-once replay of an old changelog segment)
    val stale = Seq((1L, 0L, "stale-replay", 0.0)).toDF("k", "seq", "v", "x")
    val out = rows(Warehouse.applyCdc(base, stale, Seq("k"), Seq("seq"),
      lit(false)).filter($"k" === 1L).select("v"))
    assert(out == Seq(Seq("keep-me")))
  }

  test("weightedSample keeps everything at weight>=1 and nothing at weight 0") {
    val docs = (1L to 50L).toDF("id")
    assert(Curation.weightedSample(docs, col("id"), lit(1.0)).count() == 50)
    assert(Curation.weightedSample(docs, col("id"), lit(1.5)).count() == 50)
    assert(Curation.weightedSample(docs, col("id"), lit(0.0)).count() == 0)
  }

  test("weightedSample decision is a pure function of the id (partition-stable)") {
    val docs = (1L to 200L).toDF("id")
    val w = col("id") / lit(300.0)
    val a = rows(Curation.weightedSample(docs, col("id"), w).orderBy("id")).flatten
    val b = rows(Curation.weightedSample(docs.repartition(7), col("id"), w)
      .orderBy("id")).flatten
    assert(a == b && a.nonEmpty && a.size < 200)
  }

  test("mergeCdcBucketed equals whole-table applyCdc, rewrites only touched buckets") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mcb").toString
    val path = s"$tmp/t"
    val seed = (1L to 20L).map(k => (k, 1L, s"v$k")).toDF("k", "seq", "v")
    Warehouse.mergeCdcBucketed(spark, path, seed,
      Seq("k"), Seq("seq"), col("v") === "DEL", nBuckets = 8)
    def files = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__kb="))
      .flatMap(d => d.listFiles().map(f =>
        (f.getPath, f.length(), f.lastModified()))).toSet
    val before = files
    val delta = Seq((1L, 2L, "x"), (2L, 2L, "DEL"), (40L, 2L, "new"))
      .toDF("k", "seq", "v")
    val touched = Warehouse.mergeCdcBucketed(spark, path, delta,
      Seq("k"), Seq("seq"), col("v") === "DEL", nBuckets = 8)
    // result == one-shot applyCdc over the full base
    val got = rows(Warehouse.readBucketed(spark, path).orderBy("k"))
    val want = rows(Warehouse.applyCdc(seed, delta, Seq("k"), Seq("seq"),
      col("v") === "DEL").orderBy("k"))
    assert(got == want)
    // buckets outside the touched set were never rewritten
    val untouched = before.filterNot { case (p, _, _) =>
      touched.exists(b => p.contains(s"__kb=$b/")) }
    assert(untouched.nonEmpty && untouched.subsetOf(files))
    // no work dirs left behind
    assert(!new java.io.File(s"$path/.cdc.tmp").exists())
    assert(!new java.io.File(s"$path/.cdc.backup").exists())
  }

  test("deleteKeysBucketed removes keys, touching only their buckets") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-del").toString
    val path = s"$tmp/t"
    val seed = (1L to 20L).map(k => (k, 1L, s"v$k")).toDF("k", "seq", "v")
    Warehouse.mergeCdcBucketed(spark, path, seed,
      Seq("k"), Seq("seq"), col("v") === "DEL", nBuckets = 8)
    def files = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__kb="))
      .flatMap(d => d.listFiles().map(f =>
        (f.getPath, f.length(), f.lastModified()))).toSet
    val before = files
    val touched = Warehouse.deleteKeysBucketed(spark, path,
      Seq(3L, 7L, 999L).toDF("k"), Seq("k"), nBuckets = 8)
    val got = rows(Warehouse.readBucketed(spark, path)
      .select("k").orderBy("k")).map(_.head)
    assert(got == (1L to 20L).filterNot(Set(3L, 7L)).toSeq)
    // buckets outside the touched set were never opened or rewritten
    val untouched = before.filterNot { case (p, _, _) =>
      touched.exists(b => p.contains(s"__kb=$b/")) }
    assert(untouched.nonEmpty && untouched.subsetOf(files))
    // idempotent: a second run touches the same buckets, same result
    val again = Warehouse.deleteKeysBucketed(spark, path,
      Seq(3L, 7L).toDF("k"), Seq("k"), nBuckets = 8)
    assert(again.toSet.subsetOf(touched.toSet))
    assert(rows(Warehouse.readBucketed(spark, path)
      .select("k").orderBy("k")).map(_.head) == got)
    // deleting on a missing table is a no-op
    assert(Warehouse.deleteKeysBucketed(spark, s"$tmp/absent",
      Seq(1L).toDF("k"), Seq("k")) == Nil)
    // delete EVERYTHING (all bucket dirs removed, empty root left),
    // then delete again: schema resolution must not throw — the
    // emptied table merges nothing and reports no touched buckets
    Warehouse.deleteKeysBucketed(spark, path,
      (1L to 20L).toDF("k"), Seq("k"), nBuckets = 8)
    assert(new java.io.File(path).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("__kb=")) == 0)
    assert(Warehouse.deleteKeysBucketed(spark, path,
      Seq(5L).toDF("k"), Seq("k"), nBuckets = 8) == Nil)
  }

  test("snapshotDiff classifies added/removed/changed with column detail") {
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "x")
    val v2 = Seq((1L, "a", 10.0), (2L, "B", 21.0), (4L, "d", 40.0))
      .toDF("k", "s", "x")
    val d = Warehouse.snapshotDiff(v1, v2, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getSeq[String](2).toSet)))
      .toMap
    assert(d(1L) === (("unchanged", Set.empty[String])))
    assert(d(2L) === (("changed", Set("s", "x"))))
    assert(d(3L) === (("removed", Set.empty[String])))
    assert(d(4L) === (("added", Set.empty[String])))
  }

  test("snapshotDiff: null-to-value transitions count as changes") {
    val v1 = Seq((1L, Option.empty[String]), (2L, Some("y")))
      .toDF("k", "s")
    val v2 = Seq((1L, Some("now-set")), (2L, Option.empty[String]))
      .toDF("k", "s")
    val d = Warehouse.snapshotDiff(v1, v2, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(1L -> "changed", 2L -> "changed"))
  }

  test("mergeCdcBucketed migrates a pre-existing FLAT table in place") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mcb3").toString
    val path = s"$tmp/t"
    // a table maintained by the old whole-table merge: plain part files
    val flatBase = Seq((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"))
      .toDF("k", "seq", "v")
    flatBase.write.parquet(path)
    val delta = Seq((2L, 2L, "b2"), (4L, 2L, "d")).toDF("k", "seq", "v")
    Warehouse.mergeCdcBucketed(spark, path, delta,
      Seq("k"), Seq("seq"), col("v") === "DEL", nBuckets = 4)
    // the flat rows took part in the merge (latest-wins held against
    // them) and the root is now purely bucketed
    val out = Warehouse.readBucketed(spark, path)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(out === Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"))
    val rootFiles = new java.io.File(path).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
        !f.getName.startsWith("_"))
    assert(rootFiles.isEmpty)
    assert(!new java.io.File(s"$path/.cdc.migrated").exists())
  }

  test("mergeCdcBucketed heals a crash between the swap renames") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mcb2").toString
    val path = s"$tmp/t"
    val seed = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "seq", "v")
    Warehouse.mergeCdcBucketed(spark, path, seed,
      Seq("k"), Seq("seq"), col("v") === "DEL", nBuckets = 4)
    // simulate a writer dying between rename-aside and rename-in:
    // one bucket sits in .cdc.backup with its target missing
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__kb="))
    assert(dirs.nonEmpty)
    val victim = dirs.head
    val backupRoot = new java.io.File(s"$path/.cdc.backup")
    backupRoot.mkdirs()
    assert(victim.renameTo(new java.io.File(backupRoot, victim.getName)))
    // the checkpoint-replayed batch merges against the HEALED table
    val replay = Seq((1L, 2L, "a2")).toDF("k", "seq", "v")
    Warehouse.mergeCdcBucketed(spark, path, replay,
      Seq("k"), Seq("seq"), col("v") === "DEL", nBuckets = 4)
    val out = Warehouse.readBucketed(spark, path)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(out === Map(1L -> "a2", 2L -> "b"))
    assert(!backupRoot.exists())
  }

  test("compact merges small files to the target count, rows intact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val path = s"$tmp/t"
    (1L to 1000L).toDF("id").repartition(20)
      .write.parquet(path) // 20 small files
    def parquetFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 20)
    val total = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    // target = half the table -> 2 output files
    val n = Warehouse.compact(spark, path, targetFileBytes = total / 2 + 1)
    assert(n == 2 && parquetFiles == 2)
    val back = spark.read.parquet(path)
    assert(back.count() == 1000 &&
      rows(back.agg(sum("id"))).head.head == 500500L)
  }

  test("writeJsonlShards: stable shard membership, jsonl round-trip") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = (1L to 300L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val written =
      Warehouse.writeJsonlShards(docs, "doc_id", s"$tmp/corpus", nShards = 4)
    // the write itself reports the doc count (an Observation on the
    // job — the caller never re-reads its own output to count it)
    assert(written == 300L)
    val back = spark.read.json(s"$tmp/corpus")
    assert(back.count() == 300)
    // the historical one-byte mapping is pinned for n <= 256:
    // md5("1") starts c4 = 196, so doc 1 lands in shard 196 % 4 = 0
    assert(back.where(col("doc_id") === 1).select("shard")
      .head.getInt(0) == 0)
    assert(back.select("shard").distinct().count() == 4)
    // shard dirs exist on disk as partition directories
    val dirs = new java.io.File(s"$tmp/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard="))
    assert(dirs.length == 4)
    // membership is md5-stable: rewriting a shuffled input produces the
    // same doc->shard mapping
    Warehouse.writeJsonlShards(docs.repartition(7), "doc_id",
      s"$tmp/corpus2", nShards = 4)
    val again = spark.read.json(s"$tmp/corpus2")
    assert(rows(back.select("doc_id", "shard").orderBy("doc_id")) ==
      rows(again.select("doc_id", "shard").orderBy("doc_id")))
    // shard counts past the old 256 cap (a 100 TB export needs the
    // count to grow with the data): in range, and just as md5-stable
    Warehouse.writeJsonlShards(docs, "doc_id", s"$tmp/big1",
      nShards = 1000)
    Warehouse.writeJsonlShards(docs.repartition(5), "doc_id",
      s"$tmp/big2", nShards = 1000)
    val b1 = spark.read.json(s"$tmp/big1")
    assert(b1.count() == 300 &&
      b1.agg(max("shard")).head.getInt(0) < 1000 &&
      b1.agg(min("shard")).head.getInt(0) >= 0)
    assert(rows(b1.select("doc_id", "shard").orderBy("doc_id")) ==
      rows(spark.read.json(s"$tmp/big2")
        .select("doc_id", "shard").orderBy("doc_id")))
  }
}
