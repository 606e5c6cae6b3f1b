package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-name normalization (SURVEY §2.3 P5/P6).
  *
  * The reference normalizes every output schema for its warehouse:
  * whitespace / hyphens / quotes -> `_`, lowercased
  * (reference: Audisto/audisto.py:162-164, Screaming Frog/sf_html_data.py:167-171).
  * Pure driver-side string work + one cheap `toDF` — no shuffle, no job.
  */
object Names {
  private val Unsafe = "[\\s\\-\"']+".r

  def normalize(name: String): String =
    Unsafe.replaceAllIn(name.trim, "_").toLowerCase

  /** P5 bulk regex rename — safe for 100 TB: metadata-only plan rewrite. */
  def normalizeAll(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalize): _*)

  /** P6 explicit mapping rename (reference: Midoco/product_data.py:73-96). */
  def renamed(df: DataFrame, mapping: Map[String, String]): DataFrame =
    df.withColumnsRenamed(mapping)

  /** P1 keep-list projection (reference: audisto.py:140-145). */
  def keep(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** P2 regex projection — keep columns whose name matches `re`
    * (reference: sf_html_data.py:131,161). */
  def keepMatching(df: DataFrame, re: String): DataFrame =
    df.select(df.columns.filter(_.matches(re)).map(col): _*)

  /** P3 drop-by-predicate (reference: sf_html_data.py:134-139). */
  def dropMatching(df: DataFrame, re: String): DataFrame =
    df.drop(df.columns.filter(_.matches(re)): _*)
}

/** URL decomposition + classification (SURVEY §2.9 C1-C3).
  *
  * All native Column expressions — codegen'd by Catalyst, zero UDFs, so the
  * whole derivation stays inside WholeStageCodegen and never breaks a
  * parquet-scan pushdown.
  */
object Urls {
  /** C1: i-th path segment of a URL, null when the path is too short.
    * `element_at` returns null out-of-range, which matches the reference's
    * `len(x.split('/')) > i` guard (reference: sf_html_data.py:109-115).
    * Segment 1 = scheme, 2 = "" (after //), 3 = host, 4+ = path parts. */
  def segment(url: Column, i: Int): Column = {
    val parts = split(url, "/")
    // try_element_at: null out-of-range (ANSI-safe, matches the reference's
    // len-guard); trailing-slash URLs produce a final "" segment -> absent.
    nullif(try_element_at(parts, lit(i)), lit(""))
  }

  def host(url: Column): Column = segment(url, 3)

  /** C1 block: root/directory/page_level1..4 derived columns
    * (reference: sf_html_data.py:109-115, audisto.py:150-155). */
  def withUrlLevels(df: DataFrame, srcCol: String): DataFrame = {
    val u = col(srcCol)
    df.withColumns(Map(
      "root"        -> host(u),
      "directory"   -> segment(u, 4),
      "page_level1" -> segment(u, 5),
      "page_level2" -> segment(u, 6),
      "page_level3" -> segment(u, 7),
      "page_level4" -> segment(u, 8)))
  }

  /** C2: Internal / Whitelabel / External regex classification
    * (reference: sf_html_data.py:128-129,152; sf_inlink_bulk_data.py:80-81).
    * Java regex supports the reference's negative lookahead verbatim. */
  def websiteType(url: Column, internalRe: String, whitelabelRe: String): Column =
    when(url.rlike(internalRe), "Internal")
      .when(url.rlike(whitelabelRe), "Whitelabel")
      .otherwise("External")

  /** URL canonicalization for dedup keying: lowercase, strip
    * query/fragment, scheme and a leading "www.", drop a trailing slash.
    * Deduping a crawl on the canonical form collapses scheme/case/
    * tracking-param variants of one page into one key (the reference
    * dedups raw URL strings only; this is the scale-corpus upgrade).
    * Patterns are anchored and alternation-free so they parse
    * identically under Java regex and RE2-style engines. */
  def canonicalize(url: Column): Column = {
    val steps = Seq("[?#].*$" -> "", "^https?://" -> "", "^www\\." -> "",
      "/$" -> "")
    steps.foldLeft(lower(trim(url))) { case (c, (re, rep)) =>
      regexp_replace(c, re, rep)
    }
  }

  /** URL shape features for spam/quality scoring: host, top-level
    * domain, subdomain dot-depth, path depth, digit ratio in the host
    * and a query-string flag — the row-local feature block a crawl
    * curation pass feeds into domain-level filters (deep digit-heavy
    * subdomains and parameterized URLs correlate with spam/dup farms).
    * Runs inside the scan stage; every piece is plain string/regex
    * arithmetic so the oracle can mirror it exactly. */
  def features(url: Column): Column = {
    val h = coalesce(host(url), lit(""))
    val base = regexp_replace(url, "[?#].*$", "")
    val pathSegs = filter(slice(split(base, "/"), 4, 1024), p => p =!= lit(""))
    val hostLen = length(h)
    val digits = hostLen - length(regexp_replace(h, "[0-9]", ""))
    struct(
      h.as("host"),
      regexp_extract(h, "([^.]*)$", 1).as("tld"),
      (hostLen - length(regexp_replace(h, "\\.", ""))).cast("long")
        .as("subdomain_dots"),
      size(pathSegs).cast("long").as("path_depth"),
      when(hostLen > 0, digits.cast("double") / hostLen.cast("double"))
        .otherwise(lit(0.0)).as("host_digit_ratio"),
      url.contains("?").as("has_query"))
  }

  /** C3: doctype classification by file extension
    * (reference: sf_html_data.py:130,148-149). Extensions are
    * \Q..\E-quoted so a caller-supplied "c++" or "a|b" can't corrupt the
    * alternation. */
  def doctype(url: Column, extensions: Seq[String]): Column = {
    val extRe = "(?i).*\\.(" +
      extensions.map(e => "\\Q" + e + "\\E").mkString("|") + ")([?#].*)?$"
    when(url.rlike(extRe), "Picture").otherwise("HTML")
  }
}

/** Date/time scalar ops (SURVEY §2.9 C4-C8). */
object Dates {
  /** C4: ISO-8601 'yyyy-MM-ddTHH:mm:ssZ' -> date (reference: audisto.py:83). */
  def parseIsoDate(c: Column): Column =
    to_date(to_timestamp(c, "yyyy-MM-dd'T'HH:mm:ss'Z'"))

  /** C5: German 'dd.MM.yyyy' -> date (reference: Midoco/product_data.py:60-61). */
  def parseGermanDate(c: Column): Column = to_date(c, "dd.MM.yyyy")

  /** C6: 'yyyy-MM-dd HH:mm:ss' timestamp string -> day string
    * (reference: sf_html_data.py:143-144). */
  def dayString(c: Column): Column =
    date_format(to_timestamp(c, "yyyy-MM-dd HH:mm:ss"), "yyyy-MM-dd")

  /** C8: whole-day difference (reference: product_data.py:66 lead-time). */
  def daysBetween(end: Column, start: Column): Column = datediff(end, start)
}

/** Casting / coercion ops (SURVEY §2.9 C9-C12). */
object Casts {
  /** C9: German locale decimal "1.234,56" -> 1234.56
    * (reference: Midoco/product_data.py:63-64). */
  def localeDecimal(c: Column): Column =
    // translate maps ',' -> '.' and DELETES '.' (no replacement char) —
    // one codegen'd char pass instead of two regex engines
    translate(c, ",.", ".").try_cast("double")

  /** C10: pd.to_numeric(errors='coerce').fillna(0) — junk -> 0
    * (reference: product_data.py:67-71). Spark's cast nulls on junk,
    * matching pandas coerce. */
  def coerceLong(c: Column): Column = coalesce(c.try_cast("long"), lit(0L))

  /** C11: fillna(0) + float cast — the reference's *intended* semantics
    * (its inplace-assignment form is a bug, SURVEY §8 Q1)
    * (reference: sf_html_data.py:153-160). */
  def fillDouble(c: Column): Column = coalesce(c.try_cast("double"), lit(0.0))

  /** C14/A2: skip-null concat with separator (reference: sf_html_data.py:120-124). */
  def concatSkipNull(sep: String, cols: Seq[Column]): Column =
    concat_ws(sep, cols: _*)

  /** A1: horizontal string merge of chunked columns
    * (reference: sf_html_data.py:134-136). */
  def mergeChunkColumns(cols: Seq[Column]): Column =
    concat(cols.map(c => coalesce(c.cast("string"), lit(""))): _*)
}

/** Scale helpers. */
object Scale {
  /** Ensure at least the session's default parallelism for CPU-dense
    * row-local stages (hashing, signatures, cosine). A small extract often
    * lands in one parquet row group -> one scan partition -> the whole
    * stage serializes on a single core no matter how many executors exist.
    * At real scale inputs already exceed defaultParallelism and this is a
    * no-op (no shuffle added). */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Release the executor storage behind a `localCheckpoint`'ed frame.
    * `Dataset.unpersist` only uncaches CacheManager entries, but a
    * local checkpoint's blocks are RDD-level persisted partitions
    * referenced by the `LogicalRDD` leaf — without this, every
    * checkpointed iteration frame (pageRank ranks, resolveClusters
    * edges, trainLinear features) pins executor storage until GC
    * happens to collect it. No-op-safe on non-checkpointed frames. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist()
    }

  /** Bloom-prefiltered equi-join on a long key: build a Bloom sketch of
    * the small side's keys (distributed treeAggregate, KB-scale result),
    * probe it row-locally on the big side INSIDE the scan stage, then
    * exact-join. The join removes the sketch's false positives, so the
    * result is identical to `big.join(small, ...)` — but the big side's
    * shuffle only carries rows whose key might match (~selectivity + fpp
    * fraction), which is the difference between shuffling 100 TB and
    * shuffling the join's actual contribution. Use when the small side is
    * too big to broadcast but far smaller than the big side. Note the
    * sketch build is an eager job at plan-construction time. */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame,
                           bigKey: String, smallKey: String,
                           expectedItems: Long, fpp: Double = 0.03,
                           how: String = "inner"): DataFrame = {
    val bloom = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    big.where(graft.functions.GraftFunctions.bloomMightContain(
        bloom, col(bigKey)))
      .join(small, col(bigKey) === col(smallKey), how)
  }

  /** Skew-safe equi-join: the large (possibly skewed) side gets a salt in
    * [0, saltBuckets); the small side is replicated once per salt value,
    * so one hot key spreads over `saltBuckets` reducers instead of
    * hot-spotting a single task. Use when AQE's skew-join split isn't
    * available (e.g. the hot key is known and pathological). The salt is
    * derived from monotonically_increasing_id — deterministic within a
    * run, irrelevant to the result (any spread is correct). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltBuckets: Int, how: String = "inner"): DataFrame = {
    require(saltBuckets > 0)
    // right/full joins would emit each unmatched small-side row once per
    // salt replica — semantically wrong, so refuse them
    require(Set("inner", "left", "left_outer", "leftouter", "cross")
      .contains(how.toLowerCase),
      s"saltedJoin supports inner/left joins only, got '$how'")
    val salted = large.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltBuckets)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated, keys :+ "__salt", how).drop("__salt")
  }

  /** Skew-safe exact distinct count per key, decomposed into two
    * bounded-reducer stages: (1) distinct over (key, value) — the
    * shuffle spreads a hot key across reducers by value, so no single
    * task owns the hot key's whole value set; (2) count per key over the
    * already-distinct pairs. Result is identical to
    * `groupBy(keys).agg(countDistinct(value))`, but stage 2's per-key
    * state is a counter instead of a hash set — the difference between
    * O(distinct values) and O(1) memory on a key with billions of
    * distinct values. Spark plans countDistinct as a similar expansion,
    * but keyed aggregation buffers still hold per-key sets map-side;
    * this form never materializes a set anywhere. */
  def twoPhaseDistinctCount(df: DataFrame, keys: Seq[String], value: String,
                            as: String = "n_distinct"): DataFrame =
    df.select((keys :+ value).map(col): _*).distinct()
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as(as))

  /** Range-partitioned, internally-sorted parquet layout: every output
    * file covers a disjoint key range and its rows are sorted, so
    * parquet min/max stats prune at both the file and row-group level
    * for key predicates, and downstream key-ordered consumers (as-of
    * joins, windows, merge scans) read pre-clustered data. The range
    * exchange samples the keys to build balanced bounds, so
    * `nPartitions` also bounds the output file count — size it to
    * ~targetBytes/file at the expected row width. */
  def writeSortedByRange(df: DataFrame, path: String, keys: Seq[String],
                         nPartitions: Int): Unit = {
    require(keys.nonEmpty, "need at least one layout key")
    require(nPartitions > 0, s"nPartitions must be positive, got $nPartitions")
    df.repartitionByRange(nPartitions, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}

/** Deterministic dataset splitting (training-data pipelines). */
object Sampling {
  import graft.functions.GraftFunctions.fastMd5

  /** Split bucket in [0, 256) derived from md5 of the id — stable across
    * runs, partitionings and engines (unlike rand() or murmur3 hash()),
    * so a document keeps its split assignment forever even as the corpus
    * grows. */
  def splitBucket(id: Column): Column =
    conv(substring(fastMd5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /** train/val/test label: bucket thresholds out of 256 (e.g. 204/230 ~
    * 80/10/10). */
  def splitLabel(id: Column, trainUpto: Int = 204, valUpto: Int = 230): Column = {
    val b = splitBucket(id)
    when(b < trainUpto, "train").when(b < valUpto, "val").otherwise("test")
  }

  /** Raw 24-bit md5 draw of the stringified key, as a double in
    * [0, 2^24) — the finer-grained sibling of [[splitBucket]] and the
    * ONE place the 6-hex-digit derivation lives (its oracle twin is
    * `CAST('0x' || substring(md5(CAST(k AS VARCHAR)), 1, 6) AS
    * BIGINT)`). Call sites divide by 2^24 and choose their own
    * interval convention where it matters: A-Res sampling adds +0.5
    * before dividing so ln(u) stays finite; the bootstrap
    * inverse-CDF lookup uses the raw half-open value. */
  def uniform24(key: Column): Column =
    conv(substring(fastMd5(key.cast("string")), 1, 6), 16, 10)
      .cast("double")
}

/** Set operations (SURVEY §2.8 U1/U2). */
object Unions {
  /** Permissive row union over heterogeneous schemas — the intended
    * semantics of the reference's pd.concat misuse (SURVEY §8 Q4)
    * (reference: sf_images_data.py:149-150, sf_orphan_data.py:92). */
  def unionPermissive(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)
}
