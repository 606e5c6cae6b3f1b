package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops._
import graft.functions.GraftFunctions.fastMd5

/** Corpus-curation query pack (q84+): the pretraining-mix stages layered
  * on [[graft.ops.Curation]] — per-domain caps, stratified language
  * sampling, quantile quality filtering, normalization, context-window
  * chunking, PMI collocations, robust outlier stats and shard
  * assignment. Every query has an exact DuckDB oracle (same md5 buckets,
  * same fold order, same rounding).
  */
object CurationQueries {

  private def rd(s: SparkSession, dir: String, name: String): DataFrame =
    SparkEntry.t(s, dir, name)

  /** Deterministic per-source mix weights for q205/q207 — the ONE
    * Spark-side home of the formula whose oracle twin lives inside
    * [[tokenBudgetCtes]] (`1.0 + (CAST(substr(source, 4) AS INT)
    * % 7)`); both queries must derive weights from here or the shared
    * oracle CTE silently diverges. */
  private def mixWeights(docs: org.apache.spark.sql.DataFrame) =
    docs.select(col("source")).distinct()
      .withColumn("weight",
        lit(1.0) + (substring(col("source"), 4, 10).cast("int") % 7))

  /** Shared water-filling CTE chain (q205 reports it, q207 samples by
    * it) — ends at `alloc` (source, tokens_avail, weight, allocation,
    * saturated). */
  private def tokenBudgetCtes: String =
    """caps AS (
      |  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS tokens_avail,
      |    1.0 + (CAST(substr(source, 4) AS INT) % 7) AS wr
      |  FROM documents GROUP BY source),
      |norm AS (
      |  SELECT *, wr / sum(wr) OVER () AS w FROM caps WHERE wr > 0),
      |cum AS (
      |  SELECT *,
      |    sum(tokens_avail) OVER (ORDER BY tokens_avail / w, source)
      |      AS cumT,
      |    sum(w) OVER (ORDER BY tokens_avail / w, source) AS cumW
      |  FROM norm),
      |sat AS (
      |  SELECT *, tokens_avail * (1.0 - cumW + w) <=
      |    (100000.0 - cumT + tokens_avail) * w AS saturated
      |  FROM cum),
      |lam AS (
      |  SELECT *,
      |    CASE WHEN sum(CASE WHEN saturated THEN 0.0 ELSE w END)
      |           OVER () = 0.0 THEN NULL
      |      ELSE (100000.0 -
      |          sum(CASE WHEN saturated THEN tokens_avail ELSE 0.0 END)
      |            OVER ()) /
      |        sum(CASE WHEN saturated THEN 0.0 ELSE w END) OVER ()
      |    END AS lambda
      |  FROM sat),
      |alloc AS (
      |  SELECT source, tokens_avail, round(w, 6) AS weight,
      |    round(CASE WHEN saturated THEN tokens_avail
      |      ELSE least(tokens_avail, lambda * w) END, 6) AS allocation,
      |    saturated
      |  FROM lam)""".stripMargin

  /** DuckDB replica of Sampling.splitBucket: first md5 hex byte of the
    * stringified id as an integer in [0, 256). */
  private def bucketSql(id: String): String =
    s"""((strpos('0123456789abcdef',
       |    md5(CAST($id AS VARCHAR))[1:1]) - 1) * 16
       |  + (strpos('0123456789abcdef',
       |    md5(CAST($id AS VARCHAR))[2:2]) - 1))""".stripMargin

  /** Tokens SQL mirroring Text.tokens (shared shape with NorthStar). */
  private def toksSql(e: String): String =
    raw"""list_filter(string_split_regex(lower(trim($e)), '\s+'), x -> x <> '')"""

  /** Per-language sampling thresholds out of 256 for q85 (en is
    * over-represented in the fixture, so it gets the deepest cut). */
  private val SampleThresholds: Seq[(String, Int)] =
    Seq("en" -> 64, "de" -> 128, "fr" -> 192, "es" -> 256)
  private val SampleDefault = 32

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact-n weighted sampling without replacement (A-Res priorities):
    // 50 documents drawn with probability scaling with length — the
    // quality-weighted selection step of a curation mix, with an exact
    // output cardinality the per-row-coin sampler cannot give. Top-n
    // plans as TakeOrderedAndProject.
    "q198_priority_sample" -> ((s, dir) => {
      Curation.prioritySample(rd(s, dir, "documents"),
          col("doc_id"), col("n_chars"), n = 50)
        .select("doc_id", "source", "priority")
    }),

    // Epoch-aware deterministic upsampling: per-source mix weights in
    // [0.4, 2.6] — floor(w) guaranteed epochs per document plus one
    // 24-bit-md5-decided marginal copy (E[copies] = w up to 2^-24
    // quantization) — the weight>1
    // side of source mixing q94's rebalance refuses. Summarized per
    // source; the oracle replays the md5 coin cell-exactly.
    "q191_upsample_mix" -> ((s, dir) => {
      val w = lit(0.4) +
        (substring(col("source"), 4, 10).cast("int") % 5) * lit(0.55)
      Curation.upsampleMix(rd(s, dir, "documents"), col("doc_id"), w)
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_rows"),
          max("rep").cast("long").as("max_rep"))
        .orderBy("source")
    }),

    // Token-budget mixture allocation by water-filling: spend a
    // 100k-token budget across 20 sources in proportion to skewed
    // target weights, capping sources whose capacity is below their
    // water level and re-flowing the unspent share — the closed-form
    // (two cumulative windows over SOURCE-grain rows) planning step a
    // training mix runs before sampling. At sf0.01 high-weight sources
    // saturate and low-weight ones take λ·w.
    "q205_token_budget" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      Curation.tokenBudgetAllocation(docs,
          col("source"), col("n_chars"), mixWeights(docs),
          budget = 100000.0)
        .orderBy("source")
    }),

    // Materialize the q205 plan: per-source 24-bit md5-coin sampling
    // at the planned take_rate (saturated sources keep everything),
    // then the per-source audit a mixture run reports — docs/chars
    // kept vs the planned allocation. Coin is per document, rate on
    // tokens, so kept chars track the allocation in expectation.
    "q207_budgeted_sample" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val alloc = Curation.tokenBudgetAllocation(docs,
        col("source"), col("n_chars"), mixWeights(docs),
        budget = 100000.0)
      Curation.budgetedSample(docs, col("source"), col("doc_id"), alloc)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("chars_kept"))
        .join(alloc.select(col("source"), col("allocation"),
          col("saturated")), Seq("source"))
        .orderBy("source")
    }),

    // Unicode-NFC dedup keying ([[graft.functions.NfcNormalizeExpression]]
    // — native codegen'd normalizer): per source, a visually identical
    // key is synthesized in TWO codepoint encodings (composed é vs
    // e + U+0301); raw md5 keying sees 2 distinct keys per source, the
    // NFC-composed keying collapses them to 1 — the canonicalization
    // exact-dedup needs ahead of hashing. DuckDB replays it with
    // nfc_normalize over the identical literals.
    "q192_nfc_dedup_key" -> ((s, dir) => {
      import graft.functions.GraftFunctions.{fastMd5, nfcNormalize}
      val key = concat(col("source"), lit(" "),
        when(col("doc_id") % 2 === 0, lit(NfcComposed))
          .otherwise(lit(NfcDecomposed)))
      rd(s, dir, "documents")
        .withColumn("__k", key)
        .withColumn("__nk", nfcNormalize(col("__k")))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum((col("__nk") =!= col("__k")).cast("long")).as("n_changed"),
          countDistinct(fastMd5(col("__k"))).as("raw_keys"),
          countDistinct(fastMd5(col("__nk"))).as("nfc_keys"))
        .orderBy("source")
    }),

    // Per-domain cap: keep the 10 longest documents per source (ties by
    // doc_id), then summarize what survived — the anti-boilerplate mix rule.
    "q84_domain_cap" -> ((s, dir) => {
      Curation.capPerKey(rd(s, dir, "documents"), Seq("source"),
          Seq(col("n_chars").desc, col("doc_id").asc), 10)
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum("n_chars").as("chars_kept"),
          min("doc_id").as("first_doc"))
        .orderBy("source")
    }),

    // Deterministic stratified sampling by language: md5-bucket thresholds,
    // single pass (conditional aggregation — the corpus is read once).
    "q85_stratified_sample" -> ((s, dir) => {
      val th = SampleThresholds.foldRight(lit(SampleDefault)) {
        case ((lang, t), acc) => when(col("lang") === lang, lit(t)).otherwise(acc)
      }
      val keep = Sampling.splitBucket(col("doc_id")) < th
      rd(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"),
          sum(when(keep, 1L).otherwise(0L)).as("n_sampled"),
          min(when(keep, col("doc_id"))).as("first_kept"))
        .orderBy("lang")
    }),

    // Quantile-threshold quality filter: drop the shortest quartile within
    // each language; report the cutoff and what survived.
    "q86_quantile_filter" -> ((s, dir) => {
      Curation.quantileFilter(rd(s, dir, "documents"), "lang", "n_chars", 0.25)
        .groupBy("lang")
        .agg(round(min("cutoff"), 2).as("cutoff"),
          count(lit(1)).as("n_kept"),
          min("doc_id").as("first_kept"))
        .orderBy("lang")
    }),

    // Normalization for dedup keying over a deliberately noisy input
    // (mixed case, punctuation, ragged spacing around the fixture text).
    "q87_normalize_text" -> ((s, dir) => {
      val noisy = concat(lit("  ## "), upper(col("lang")), lit("!!  "),
        col("text"), lit("  <END#"), col("doc_id").cast("string"), lit(">  "))
      rd(s, dir, "documents")
        .withColumn("norm", Curation.normalizeText(noisy))
        .select(col("doc_id"),
          substring(col("norm"), 1, 25).as("norm_head"),
          length(col("norm")).cast("long").as("norm_len"),
          fastMd5(col("norm")).as("norm_md5"))
        .orderBy("doc_id")
    }),

    // Context-window chunking: 32-token chunks every 24 tokens (8-token
    // overlap); only chunk digests leave the scan stage.
    "q88_doc_chunks" -> ((s, dir) => {
      Curation.chunkTokens(rd(s, dir, "documents"), "doc_id", "text",
          chunkSize = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx")
    }),

    // Collocation mining: top-25 adjacent-pair PMI over the corpus.
    "q89_pmi_bigrams" -> ((s, dir) => {
      Curation.pmiBigrams(rd(s, dir, "documents"), "text", minCount = 5)
        .select(col("bigram"), col("n_pair"), round(col("pmi"), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(25)
    }),

    // Robust per-language outlier stats: z-score of document length against
    // the language's mean/stddev; count the |z| > 2 tail.
    "q90_zscore_outliers" -> ((s, dir) => {
      val w = Window.partitionBy("lang")
      val z = (col("n_chars") - avg(col("n_chars")).over(w)) /
        stddev_samp(col("n_chars")).over(w)
      rd(s, dir, "documents")
        .withColumn("z", z)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(round(abs(col("z")), 6) > 2, 1L).otherwise(0L))
            .as("n_outliers"),
          round(max(abs(col("z"))), 4).as("max_absz"))
        .orderBy("lang")
    }),

    // Deterministic shard assignment: 8 md5-keyed output shards with
    // per-shard balance stats (the training-corpus writer's layout).
    "q91_shard_assign" -> ((s, dir) => {
      rd(s, dir, "documents")
        .withColumn("shard", Curation.shard(col("doc_id"), 8).cast("long"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"),
          max("doc_id").as("max_doc"))
        .orderBy("shard")
    }),

    // Sequence packing: chunk the corpus (q88's stage), then cut each
    // shard's chunk stream into ~128-token training sequences.
    "q92_sequence_pack" -> ((s, dir) => {
      val chunks = Curation.chunkTokens(rd(s, dir, "documents"),
          "doc_id", "text", chunkSize = 32, stride = 24)
        .withColumn("shard", Curation.shard(col("doc_id"), 4).cast("long"))
      Curation.packSequences(chunks, Seq("shard"),
          Seq(col("doc_id"), col("chunk_idx")), "chunk_tokens", seqLen = 128)
        .groupBy("shard", "pack_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum("chunk_tokens").as("pack_tokens"),
          min("doc_id").as("first_doc"))
        .orderBy("shard", "pack_id")
    }),

    // Embedding-space QA: per-label, per-dimension distribution stats
    // (the drift/collapse check before vectors feed the ANN index).
    "q93_embedding_dims" -> ((s, dir) => {
      rd(s, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .withColumn("dim", (col("pos") + 1).cast("long"))
        .withColumn("dv", col("v").cast("double"))
        .groupBy("label", "dim")
        .agg(round(avg("dv"), 6).as("avg_v"),
          round(min("dv"), 6).as("min_v"),
          round(max("dv"), 6).as("max_v"),
          count(lit(1)).as("n"))
        .orderBy("label", "dim")
    }),

    // Mix rebalancing: downsample over-represented sources toward target
    // weights (src0-4 weighted 4x the rest), md5-deterministic.
    "q94_mix_rebalance" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      val wOf = (c: Column) =>
        when(c.isin("src0", "src1", "src2", "src3", "src4"), 2.0)
          .otherwise(0.5)
      val before = docs.groupBy("source").agg(count(lit(1)).as("n_before"))
      val after = Curation.rebalanceMix(docs, "source", col("doc_id"), wOf)
        .groupBy("source")
        .agg(min("mix_threshold").as("th"), count(lit(1)).as("n_after"))
      before.join(after, Seq("source"), "left")
        .select(col("source"), col("n_before"), col("th"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
        .orderBy("source")
    }),

    // Exactly-100 deterministic corpus sample (md5-ordered top-k — plans
    // as TakeOrderedAndProject, no global sort).
    "q95_fixed_sample" -> ((s, dir) => {
      Curation.fixedSample(rd(s, dir, "documents"), col("doc_id"), 100)
        .select(col("doc_id"), col("lang"),
          fastMd5(col("doc_id").cast("string")).as("sort_key"))
        .orderBy("sort_key", "doc_id")
    }),

    // Time-series resampling: each user's irregular event values
    // projected onto an epoch-aligned 6-hour grid with linear
    // interpolation (window-over-union, no range join).
    "q96_resample_linear" -> ((s, dir) => {
      TimeSeries.resampleLinear(rd(s, dir, "events"),
          "user_id", "ts", "value", stepSeconds = 21600)
        .select(col("user_id"), col("grid_ts"),
          round(col("interp"), 4).as("interp"))
        .orderBy("user_id", "grid_ts")
    }),

    // Estimator QA: MinHash-estimated Jaccard (matching signature
    // fraction) vs exact n-gram Jaccard for every LSH candidate pair —
    // the recall/precision dial a dedup pipeline tunes bands against.
    "q97_minhash_quality" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      // factorExactGroups: the NorthStar q23 hint note (exact-dup-free
      // corpus — the auto-probe's extra text pass always decides false)
      val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
        numHashes = 8, bands = 4, shingleSize = 3,
        factorExactGroups = Some(false))
      // both self-join sides read `sig` — cache it so the shingle +
      // signature expressions evaluate once, not once per side
      val sig = Dedup.withMinhashSignature(docs, "text", 8, 3)
        .select(col("doc_id"),
          array((0 until 8).map(i => col(s"minhash_$i")): _*).as("m"),
          array_distinct(Text.shingles(col("text"), 3)).as("ds"))
        .cache()
      val a = sig.select(col("doc_id").as("id_a"), col("m").as("ma"),
        col("ds").as("dsa"))
      val b = sig.select(col("doc_id").as("id_b"), col("m").as("mb"),
        col("ds").as("dsb"))
      pairs.join(a, "id_a").join(b, "id_b")
        .select(col("id_a"), col("id_b"),
          round(size(filter(zip_with(col("ma"), col("mb"),
              (x, y) => x === y), p => p)).cast("double") / lit(8.0), 6)
            .as("est_jaccard"),
          round(size(array_intersect(col("dsa"), col("dsb"))).cast("double") /
            size(array_union(col("dsa"), col("dsb"))).cast("double"), 6)
            .as("exact_jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // Stratified exact-n sampling: exactly 10 documents per language,
    // md5-ordered — deterministic, and the rank-limit pushes map-side
    // (WindowGroupLimit) so the shuffle carries <= 10 rows per key per task.
    "q98_lang_sample" -> ((s, dir) => {
      Curation.capPerKey(rd(s, dir, "documents"), Seq("lang"),
          Seq(fastMd5(col("doc_id").cast("string")).asc, col("doc_id").asc), 10)
        .select(col("lang"), col("doc_id"))
        .orderBy("lang", "doc_id")
    }),

    // Duplicate-cluster resolution: LSH candidate pairs -> connected
    // components by iterative min-label propagation, oracle-checked
    // against a recursive-CTE transitive closure.
    "q99_dup_clusters" -> ((s, dir) => {
      val pairs = Dedup.minhashCandidatePairs(rd(s, dir, "documents"),
        "text", "doc_id", numHashes = 8, bands = 4, shingleSize = 3,
        factorExactGroups = Some(false)) // NorthStar q23 hint note
      // pairsDistinct: LSH candidate pairs are distinct + id_a < id_b
      Dedup.resolveClusters(pairs, pairsDistinct = true).orderBy("id")
    }),

    // Bad-data quarantine: malformed JSON payloads (injected corruption)
    // parse to null instead of failing the job, and the gate counts them
    // per type — the quarantine-not-crash path of a production extract.
    "q101_json_quarantine" -> ((s, dir) => {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val corrupted = when(col("event_id") % 7 === 0,
        concat(lit("BAD{"), col("props"))).otherwise(col("props"))
      rd(s, dir, "events")
        .withColumn("k", from_json(corrupted,
          StructType(Seq(StructField("k", LongType)))).getField("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_total"),
          count(col("k")).as("n_valid"),
          (count(lit(1)) - count(col("k"))).as("n_quarantined"),
          sum("k").as("sum_k"))
        .orderBy("event_type")
    }),

    // Perplexity-proxy quality scoring: per-document mean negative log
    // likelihood under the corpus unigram LM — the cheap KenLM stand-in
    // every pretraining quality filter starts from. Explode -> count ->
    // join back -> per-doc mean; the unigram table is vocabulary-sized
    // (broadcast at this scale, hash-join at web scale).
    "q100_unigram_nll" -> ((s, dir) => {
      val docs = rd(s, dir, "documents")
      // the token stream feeds the unigram count AND the scoring join —
      // pin it so the corpus is tokenized once
      val toks = docs.select(col("doc_id"),
        explode(Text.tokens(col("text"))).as("w"))
        .cache()
      val uni = toks.groupBy("w").agg(count(lit(1)).as("cw"))
      val tot = uni.agg(sum("cw").cast("double").as("tot"))
      toks.join(broadcast(uni), Seq("w"))
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tok"),
          round(avg(-log(col("cw").cast("double") / col("tot"))), 6)
            .as("mean_nll"))
        .orderBy("doc_id")
    }),

    // Link-graph authority: PageRank (3 fixed iterations) over the
    // user-journey transition graph (consecutive props.k values per
    // user) — the domain-authority signal web-corpus curation weights
    // quality by. Edges cached: the lazy 3-iteration plan references
    // them 2·iters+2 times.
    "q106_pagerank" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val edges = rd(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .select(col("k").as("dst"), lag(col("k"), 1).over(w).as("src"))
        .where(col("src").isNotNull)
        .select("src", "dst").distinct().cache()
      Graph.pageRank(edges, iterations = 3)
        .select(col("node"), round(col("rank"), 6).as("rank"))
        .orderBy("node")
    }),

    // Community detection: deterministic synchronous label propagation
    // (3 rounds) over the same journey graph as q106 — most-frequent
    // neighbor label, ties to the smallest; what connected components
    // can't see (one stray link merges components, LPA needs a
    // majority). The oracle unrolls the rounds as count+argmax CTEs.
    "q195_label_prop" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val edges = rd(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .select(col("k").as("dst"), lag(col("k"), 1).over(w).as("src"))
        .where(col("src").isNotNull)
      Graph.labelPropagation(edges, iterations = 3)
        .orderBy("node")
    }),

    // Domain blocklist: suffix-match anti-join against a broadcast
    // blocklist (one entry covers a domain and its subdomains) — the
    // corpus never shuffles. Domain synthesized as in q11 (testdata has
    // no URL column) so the oracle can rebuild it.
    "q107_domain_blocklist" -> ((s, dir) => {
      import s.implicits._
      val docs = rd(s, dir, "documents")
        .withColumn("domain", concat(col("source"), lit(".example.de")))
      val bl = BlockedSuffixes.toDF("suffix")
      Curation.blocklistFilter(docs, col("domain"), bl, "suffix")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"))
        .orderBy("lang")
    }),

    // Bigram-LM quality score: per-doc mean negative log of the corpus
    // bigram transition probability c(w1,w2)/c(w1·) — the next step up
    // from q100's unigram LM; boilerplate scores low, odd token
    // sequences score high. Bigram extraction is row-local (transform
    // over the token array, no self-join); count tables are small
    // relative to the corpus and AQE broadcasts them.
    "q108_bigram_nll" -> ((s, dir) => {
      val toks = rd(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      // the bigram stream feeds both count tables and the scoring join
      // — pin it so the corpus is tokenized once, not once per consumer
      val big = toks.where(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .cache()
      val cb = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      val cu = big.groupBy("w1").agg(count(lit(1)).as("cu"))
      big.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log(col("cb").cast("double") / col("cu").cast("double"))), 6)
            .as("mean_nll"))
        .orderBy("doc_id")
    }),

    // Interpolated Kneser-Ney bigram NLL — the smoothed upgrade of
    // q108: P(w2|w1) = max(c12-D,0)/c1 + D·fanout(w1)/c1 ·
    // continuation(w2)/|bigram types|, D = 0.75. Every count table
    // derives from the one bigram groupBy; the per-row probability is
    // assembled through broadcast-sized joins (vocabulary-scale, not
    // corpus-scale) and the singleton type count enters as a broadcast
    // 1-row cross join.
    "q172_kn_bigram_nll" -> ((s, dir) => {
      val toks = rd(s, dir, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      // big feeds cu + the scoring join; cb feeds ITS OWN three derived
      // tables (fanout, continuation, type count) plus the join — pin
      // both so the corpus tokenize/explode and the (w1, w2) count run
      // once each, not once per derived table
      val big = toks.where(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t)-1), i -> struct(t[i-1] AS w1, t[i] AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .cache()
      val cb = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb")).cache()
      val cu = big.groupBy("w1").agg(count(lit(1)).as("cu"))
      val fan = cb.groupBy("w1").agg(count(lit(1)).as("fan"))
      val pc = cb.groupBy("w2").agg(count(lit(1)).as("nprec"))
      val types = cb.agg(count(lit(1)).as("ntypes"))
      val d = lit(0.75)
      val p = greatest(col("cb").cast("double") - d, lit(0.0)) /
          col("cu") +
        d * col("fan") / col("cu") *
          (col("nprec").cast("double") / col("ntypes"))
      big.join(cb, Seq("w1", "w2")).join(cu, Seq("w1"))
        .join(fan, Seq("w1")).join(pc, Seq("w2"))
        .crossJoin(broadcast(types))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log(p)), 6).as("mean_kn_nll"))
        .orderBy("doc_id")
    })
  )

  /** Blocklist for q107 — suffix semantics: "3.example.de" blocks src3
    * AND src13 (subdomain-style match), "src1.example.de" blocks only
    * src1 (src11 does not end with it). */
  private val BlockedSuffixes =
    Seq("3.example.de", "7.example.de", "src1.example.de")

  /** q192's key suffix in both codepoint encodings — NFC-equal,
    * byte-different (shared by the Spark literals and the oracle SQL
    * so both engines hash the identical strings). */
  private val NfcComposed = "caf\u00e9"   // e-acute as ONE codepoint
  private val NfcDecomposed = "cafe\u0301" // e + combining acute

  // ----------------------------------------------------------- oracle SQL

  def oracleSql: Map[String, String] = Map(

    "q192_nfc_dedup_key" ->
      s"""WITH k AS (
         |  SELECT source,
         |    source || ' ' || (CASE WHEN doc_id % 2 = 0
         |      THEN '$NfcComposed' ELSE '$NfcDecomposed' END) AS k
         |  FROM documents),
         |n AS (SELECT source, k, nfc_normalize(k) AS nk FROM k)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN nk <> k THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_changed,
         |  CAST(count(DISTINCT md5(k)) AS BIGINT) AS raw_keys,
         |  CAST(count(DISTINCT md5(nk)) AS BIGINT) AS nfc_keys
         |FROM n GROUP BY source ORDER BY source""".stripMargin,

    "q198_priority_sample" ->
      """WITH u AS (
        |  SELECT doc_id, source,
        |    (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |      AS BIGINT) + 0.5) / 16777216.0 AS u,
        |    CAST(n_chars AS DOUBLE) AS w
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, source, round(ln(u) / w, 6) AS priority
        |FROM u ORDER BY ln(u) / w DESC, doc_id LIMIT 50""".stripMargin,

    "q191_upsample_mix" -> {
      // the 24-bit Sampling.uniform24 coin keyed on (id, rep)
      val coin = "CAST('0x' || substring(md5(" +
        "CAST(doc_id AS VARCHAR) || '#' || CAST(rep AS VARCHAR)" +
        "), 1, 6) AS BIGINT)"
      s"""WITH w AS (
         |  SELECT source, doc_id,
         |    0.4 + (CAST(substr(source, 4) AS INT) % 5) * 0.55 AS wt
         |  FROM documents),
         |e AS (
         |  SELECT source, doc_id, wt,
         |    unnest(generate_series(1, CAST(ceil(wt) AS INT))) AS rep
         |  FROM w WHERE wt > 0),
         |k AS (
         |  SELECT * FROM e
         |  WHERE rep <= floor(wt)
         |     OR $coin < (wt - floor(wt)) * 16777216.0)
         |SELECT source,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(max(rep) AS BIGINT) AS max_rep
         |FROM k GROUP BY source ORDER BY source""".stripMargin
    },

    "q205_token_budget" ->
      s"""WITH $tokenBudgetCtes
        |SELECT source, tokens_avail, weight, allocation,
        |  round(allocation / tokens_avail, 6) AS take_rate, saturated
        |FROM alloc ORDER BY source""".stripMargin,

    "q207_budgeted_sample" ->
      s"""WITH $tokenBudgetCtes,
        |rates AS (
        |  SELECT source, allocation, saturated,
        |    round(allocation / tokens_avail, 6) AS take_rate
        |  FROM alloc),
        |kept AS (
        |  SELECT d.source, d.n_chars, r.allocation, r.saturated
        |  FROM documents d JOIN rates r USING (source)
        |  WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)
        |      AS BIGINT) < r.take_rate * 16777216.0)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept,
        |  allocation, saturated
        |FROM kept GROUP BY source, allocation, saturated
        |ORDER BY source""".stripMargin,

    "q84_domain_cap" ->
      """WITH r AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept,
        |  min(doc_id) AS first_doc
        |FROM r WHERE rk <= 10
        |GROUP BY source ORDER BY source""".stripMargin,

    "q85_stratified_sample" -> {
      val caseTh = SampleThresholds
        .map { case (l, t) => s"WHEN lang = '$l' THEN $t" }
        .mkString("CASE ", " ", s" ELSE $SampleDefault END")
      s"""WITH b AS (
         |  SELECT lang, doc_id,
         |    ${bucketSql("doc_id")} < ($caseTh) AS keep
         |  FROM documents)
         |SELECT lang, count(*) AS n_total,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  min(CASE WHEN keep THEN doc_id END) AS first_kept
         |FROM b GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q86_quantile_filter" ->
      """WITH c AS (
        |  SELECT lang, quantile_cont(n_chars, 0.25) AS cutoff
        |  FROM documents GROUP BY lang)
        |SELECT lang, round(min(cutoff), 2) AS cutoff,
        |  count(*) AS n_kept, min(doc_id) AS first_kept
        |FROM documents JOIN c USING (lang)
        |WHERE n_chars >= cutoff
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "q87_normalize_text" ->
      raw"""WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(
        |      lower(concat('  ## ', upper(lang), '!!  ', text, '  <END#',
        |                   CAST(doc_id AS VARCHAR), '>  ')),
        |      '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, substring(norm, 1, 25) AS norm_head,
        |  CAST(length(norm) AS BIGINT) AS norm_len,
        |  md5(norm) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,

    "q88_doc_chunks" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |nz AS (SELECT * FROM toks WHERE len(t) > 0),
         |st AS (
         |  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, 24)) AS i
         |  FROM nz),
         |ch AS (
         |  SELECT doc_id, CAST(i // 24 AS BIGINT) AS chunk_idx,
         |    t[i + 1 : i + 32] AS chunk
         |  FROM st)
         |SELECT doc_id, chunk_idx,
         |  CAST(len(chunk) AS BIGINT) AS chunk_tokens,
         |  md5(array_to_string(chunk, ' ')) AS chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "q89_pmi_bigrams" -> {
      val toks = toksSql("text")
      val shingles2 =
        s"""CASE WHEN len(t) >= 2
           | THEN list_transform(generate_series(1, len(t) - 1),
           |        i -> array_to_string(t[i : i + 1], ' '))
           | ELSE [array_to_string(t, ' ')] END""".stripMargin
      s"""WITH toks AS (SELECT $toks AS t FROM documents),
         |uni AS (SELECT unnest(t) AS w FROM toks),
         |unic AS (SELECT w, count(*) AS cw FROM uni GROUP BY w),
         |big AS (SELECT unnest($shingles2) AS bg FROM toks WHERE len(t) >= 2),
         |bic AS (SELECT bg, count(*) AS n_pair FROM big GROUP BY bg),
         |tw AS (SELECT CAST(sum(cw) AS DOUBLE) AS tw FROM unic),
         |tb AS (SELECT CAST(sum(n_pair) AS DOUBLE) AS tb FROM bic),
         |j AS (
         |  SELECT bg, n_pair,
         |    string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
         |  FROM bic WHERE n_pair >= 5)
         |SELECT bg AS bigram, n_pair,
         |  round(ln((CAST(n_pair AS DOUBLE) / tb) /
         |    ((CAST(c1.cw AS DOUBLE) / tw) * (CAST(c2.cw AS DOUBLE) / tw))), 6)
         |    AS pmi
         |FROM j
         |JOIN unic c1 ON j.w1 = c1.w
         |JOIN unic c2 ON j.w2 = c2.w, tw, tb
         |ORDER BY pmi DESC, bigram LIMIT 25""".stripMargin
    },

    "q90_zscore_outliers" ->
      """WITH z AS (
        |  SELECT lang,
        |    (n_chars - avg(n_chars) OVER (PARTITION BY lang)) /
        |      stddev_samp(n_chars) OVER (PARTITION BY lang) AS z
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN round(abs(z), 6) > 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  round(max(abs(z)), 4) AS max_absz
        |FROM z GROUP BY lang ORDER BY lang""".stripMargin,

    "q91_shard_assign" ->
      s"""WITH b AS (
         |  SELECT doc_id, n_chars,
         |    CAST(${bucketSql("doc_id")} % 8 AS BIGINT) AS shard
         |  FROM documents)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM b GROUP BY shard ORDER BY shard""".stripMargin,

    "q92_sequence_pack" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |nz AS (SELECT * FROM toks WHERE len(t) > 0),
         |st AS (
         |  SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, 24)) AS i
         |  FROM nz),
         |ch AS (
         |  SELECT doc_id, CAST(i // 24 AS BIGINT) AS chunk_idx,
         |    CAST(len(t[i + 1 : i + 32]) AS BIGINT) AS chunk_tokens
         |  FROM st),
         |sh AS (
         |  SELECT doc_id, chunk_idx, chunk_tokens,
         |    CAST(${bucketSql("doc_id")} % 4 AS BIGINT) AS shard
         |  FROM ch),
         |pk AS (
         |  SELECT shard, doc_id, chunk_idx, chunk_tokens,
         |    coalesce(sum(chunk_tokens) OVER (
         |      PARTITION BY shard ORDER BY doc_id, chunk_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS cum_before
         |  FROM sh)
         |SELECT shard, CAST(cum_before // 128 AS BIGINT) AS pack_id,
         |  count(*) AS n_chunks,
         |  CAST(sum(chunk_tokens) AS BIGINT) AS pack_tokens,
         |  min(doc_id) AS first_doc
         |FROM pk GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin,

    "q93_embedding_dims" ->
      """WITH e AS (
        |  SELECT label, u.i AS dim, CAST(embedding[u.i] AS DOUBLE) AS dv
        |  FROM embeddings,
        |    unnest(generate_series(1, len(embedding))) AS u(i))
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  round(avg(dv), 6) AS avg_v,
        |  round(min(dv), 6) AS min_v,
        |  round(max(dv), 6) AS max_v,
        |  count(*) AS n
        |FROM e GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "q94_mix_rebalance" ->
      s"""WITH w AS (
         |  SELECT source,
         |    CASE WHEN source IN ('src0','src1','src2','src3','src4')
         |         THEN 2.0 ELSE 0.5 END AS wt,
         |    count(*) AS n
         |  FROM documents GROUP BY source),
         |t AS (
         |  SELECT CAST(sum(n) AS DOUBLE) AS tot, sum(wt) AS wsum FROM w),
         |th AS (
         |  SELECT source, n,
         |    CAST(least(256.0, floor(256.0 *
         |      ((tot * wt / wsum) / CAST(n AS DOUBLE)))) AS BIGINT) AS th
         |  FROM w, t),
         |a AS (
         |  SELECT source, count(*) AS n_after
         |  FROM documents JOIN th USING (source)
         |  WHERE ${bucketSql("doc_id")} < th
         |  GROUP BY source)
         |SELECT th.source, th.n AS n_before, th.th AS th,
         |  coalesce(a.n_after, 0) AS n_after
         |FROM th LEFT JOIN a USING (source) ORDER BY source""".stripMargin,

    "q95_fixed_sample" ->
      """SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS sort_key
        |FROM documents ORDER BY sort_key, doc_id LIMIT 100""".stripMargin,

    "q96_resample_linear" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts) AS t, CAST(value AS DOUBLE) AS v,
        |    0 AS is_grid
        |  FROM events),
        |sp AS (
        |  SELECT user_id, (min(t) // 21600000000) * 21600000000 AS t0,
        |    max(t) AS t1
        |  FROM ev GROUP BY user_id),
        |gr AS (
        |  SELECT user_id, g.t AS t, CAST(NULL AS DOUBLE) AS v, 1 AS is_grid
        |  FROM sp, unnest(generate_series(t0, t1, 21600000000)) AS g(t)),
        |u AS (SELECT * FROM ev UNION ALL SELECT * FROM gr),
        |w AS (
        |  SELECT user_id, t, is_grid,
        |    last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
        |      OVER bw AS pt,
        |    last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
        |      OVER bw AS pv,
        |    first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
        |      OVER fw AS nt,
        |    first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS)
        |      OVER fw AS nv
        |  FROM u
        |  WINDOW
        |    bw AS (PARTITION BY user_id ORDER BY t, is_grid
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    fw AS (PARTITION BY user_id ORDER BY t, is_grid
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, make_timestamp(t) AS grid_ts,
        |  round(CASE WHEN pt = t THEN pv
        |        ELSE pv + (nv - pv) * (CAST(t - pt AS DOUBLE) /
        |                               CAST(nt - pt AS DOUBLE)) END, 4)
        |    AS interp
        |FROM w WHERE is_grid = 1
        |ORDER BY user_id, grid_ts""".stripMargin,

    "q97_minhash_quality" ->
      s"""${NorthStar.minhashPairsSql(NorthStar.toksSql("text"))},
         |dsh AS (SELECT doc_id, list_distinct(s) AS ds FROM sh),
         |j AS (
         |  SELECT p.id_a, p.id_b, sa.m AS ma, sb.m AS mb,
         |    da.ds AS dsa, db.ds AS dsb
         |  FROM pairs p
         |  JOIN sig sa ON sa.doc_id = p.id_a
         |  JOIN sig sb ON sb.doc_id = p.id_b
         |  JOIN dsh da ON da.doc_id = p.id_a
         |  JOIN dsh db ON db.doc_id = p.id_b)
         |SELECT id_a, id_b,
         |  round(CAST(len(list_filter(generate_series(1, 8),
         |    i -> ma[i] = mb[i])) AS DOUBLE) / 8.0, 6) AS est_jaccard,
         |  round(CAST(len(list_intersect(dsa, dsb)) AS DOUBLE) /
         |        CAST(len(list_distinct(dsa || dsb)) AS DOUBLE), 6)
         |    AS exact_jaccard
         |FROM j ORDER BY id_a, id_b""".stripMargin,

    "q98_lang_sample" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 10 ORDER BY lang, doc_id""".stripMargin,

    "q99_dup_clusters" -> {
      val base = NorthStar.minhashPairsSql(NorthStar.toksSql("text"))
        .replaceFirst("^WITH ", "WITH RECURSIVE ")
      s"""$base,
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, rr.r FROM edges e JOIN reach rr ON e.dst = rr.id)
         |SELECT id, min(r) AS cluster_id FROM reach
         |GROUP BY id ORDER BY id""".stripMargin
    },

    "q101_json_quarantine" ->
      """WITH c AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 7 = 0 THEN concat('BAD{', props)
        |         ELSE props END AS p
        |  FROM events),
        |v AS (
        |  SELECT event_type,
        |    CASE WHEN json_valid(p) THEN CAST(p->>'$.k' AS BIGINT) END AS k
        |  FROM c)
        |SELECT event_type, count(*) AS n_total, count(k) AS n_valid,
        |  count(*) - count(k) AS n_quarantined,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q100_unigram_nll" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(${toksSql("text")}) AS w FROM documents),
         |uni AS (SELECT w, count(*) AS cw FROM toks GROUP BY w),
         |tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS tot FROM uni)
         |SELECT doc_id, count(*) AS n_tok,
         |  round(avg(-ln(CAST(cw AS DOUBLE) / tot)), 6) AS mean_nll
         |FROM toks JOIN uni USING (w), tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Graph.pageRank's fixed-point recurrence unrolled to 3 iterations of
    // join+agg CTEs — same formulation (no dangling-mass redistribution),
    // so the two engines agree to round(…, 6).
    "q106_pagerank" ->
      """WITH lagk AS (
        |  SELECT CAST(props->>'$.k' AS BIGINT) AS dst,
        |    lag(CAST(props->>'$.k' AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS src
        |  FROM events),
        |edges AS (SELECT DISTINCT src, dst FROM lagk WHERE src IS NOT NULL),
        |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg
        |        FROM edges GROUP BY src),
        |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
        |c1 AS (SELECT e.dst AS node, sum(r.rank / d.outdeg) AS c
        |       FROM edges e JOIN deg d ON e.src = d.src
        |       JOIN r0 r ON r.node = e.src GROUP BY e.dst),
        |r1 AS (SELECT n.node, 0.15 / nn.n + 0.85 * coalesce(c1.c, 0.0) AS rank
        |       FROM nodes n LEFT JOIN c1 USING (node), nn),
        |c2 AS (SELECT e.dst AS node, sum(r.rank / d.outdeg) AS c
        |       FROM edges e JOIN deg d ON e.src = d.src
        |       JOIN r1 r ON r.node = e.src GROUP BY e.dst),
        |r2 AS (SELECT n.node, 0.15 / nn.n + 0.85 * coalesce(c2.c, 0.0) AS rank
        |       FROM nodes n LEFT JOIN c2 USING (node), nn),
        |c3 AS (SELECT e.dst AS node, sum(r.rank / d.outdeg) AS c
        |       FROM edges e JOIN deg d ON e.src = d.src
        |       JOIN r2 r ON r.node = e.src GROUP BY e.dst),
        |r3 AS (SELECT n.node, 0.15 / nn.n + 0.85 * coalesce(c3.c, 0.0) AS rank
        |       FROM nodes n LEFT JOIN c3 USING (node), nn)
        |SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node""".stripMargin,

    "q195_label_prop" -> {
      def round(n: Int) =
        s"""l$n AS (
           |  SELECT node, label FROM (
           |    SELECT a.node, l.label, count(*) AS c,
           |      row_number() OVER (PARTITION BY a.node
           |        ORDER BY count(*) DESC, l.label ASC) AS rk
           |    FROM adj a JOIN l${n - 1} l ON l.node = a.nb
           |    GROUP BY a.node, l.label) z
           |  WHERE rk = 1)""".stripMargin
      s"""WITH lagk AS (
         |  SELECT CAST(props->>'$$.k' AS BIGINT) AS dst,
         |    lag(CAST(props->>'$$.k' AS BIGINT)) OVER
         |      (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS src
         |  FROM events),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM lagk WHERE src IS NOT NULL AND src <> dst),
         |adj AS (SELECT a AS node, b AS nb FROM und
         |        UNION ALL SELECT b, a FROM und),
         |l0 AS (SELECT DISTINCT node, node AS label FROM adj),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, label FROM l3 ORDER BY node""".stripMargin
    },

    "q107_domain_blocklist" -> {
      val vals = BlockedSuffixes.map(s => s"('$s')").mkString(", ")
      s"""WITH d AS (
         |  SELECT *, source || '.example.de' AS domain FROM documents),
         |bl(suffix) AS (SELECT * FROM (VALUES $vals)),
         |kept AS (SELECT * FROM d WHERE NOT EXISTS
         |  (SELECT 1 FROM bl WHERE ends_with(d.domain, bl.suffix)))
         |SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q108_bigram_nll" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |big AS (
         |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         |        FROM toks WHERE len(t) >= 2)),
         |cb AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2),
         |cu AS (SELECT w1, count(*) AS cu FROM big GROUP BY w1)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(avg(-ln(CAST(cb.cb AS DOUBLE) / cu.cu)), 6) AS mean_nll
         |FROM big JOIN cb USING (w1, w2) JOIN cu USING (w1)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q172_kn_bigram_nll" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${toksSql("text")} AS t FROM documents),
         |big AS (
         |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
         |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
         |        FROM toks WHERE len(t) >= 2)),
         |cb AS (SELECT w1, w2, count(*) AS cb FROM big GROUP BY w1, w2),
         |cu AS (SELECT w1, count(*) AS cu FROM big GROUP BY w1),
         |fan AS (SELECT w1, count(*) AS fan FROM cb GROUP BY w1),
         |pc AS (SELECT w2, count(*) AS nprec FROM cb GROUP BY w2),
         |types AS (SELECT count(*) AS ntypes FROM cb)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(avg(-ln(
         |    greatest(CAST(cb.cb AS DOUBLE) - 0.75, 0.0) / cu.cu
         |    + 0.75 * fan.fan / cu.cu *
         |      (CAST(pc.nprec AS DOUBLE) / types.ntypes))), 6)
         |    AS mean_kn_nll
         |FROM big JOIN cb USING (w1, w2) JOIN cu USING (w1)
         |  JOIN fan USING (w1) JOIN pc USING (w2), types
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
