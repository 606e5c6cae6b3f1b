package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.fastMd5

/** Text-analysis operators for training-data pipelines (north star:
  * language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is a native Column expression tree (codegen'd,
  * shuffle-free, row-local) — at 100 TB these run inside the scan stage and
  * cost nothing beyond the read. Hashing is md5-hex so results are portable
  * across engines (and hence DuckDB-oracle-checkable), unlike Spark's
  * murmur3 `hash()`.
  */
object Text {

  /** Whitespace tokenization, lowercased, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => t =!= lit(""))

  /** Token count (whitespace) — `size` is -1 on null, so null-guard. */
  def tokenCount(text: Column): Column =
    when(text.isNull, lit(0)).otherwise(size(tokens(text)))

  /** BPE-ish token count: letter-runs, digit-runs and single punctuation
    * each count as one token — a cheap proxy for subword tokenizers. */
  val BpeIshRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeIshTokenCount(text: Column): Column =
    when(text.isNull, lit(0)).otherwise(regexp_count(text, lit(BpeIshRe)))

  /** English stopword set used by the quality / language heuristics. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
      "was", "for", "on", "with", "as", "at", "by", "it", "this", "that")

  /** Word-boundary alternation over literal words, each \Q..\E-quoted so
    * metacharacters in caller-supplied words ("c++", "a|b") can't corrupt
    * the pattern. \Q..\E is honored by both Java regex and RE2, so the
    * oracle-SQL generator reuses this builder verbatim. */
  def wordAltRe(words: Seq[String]): String =
    "(?i)\\b(" + words.map(w => "\\Q" + w + "\\E").mkString("|") + ")\\b"

  /** Counted over lower(text) so (?i) never needs non-ASCII case folding —
    * Java regex (?i) is ASCII-only while RE2's is full-Unicode; lowering
    * first makes both engines agree on words like "für". */
  def stopwordCount(text: Column, stopwords: Seq[String] = EnStopwords): Column =
    when(text.isNull, lit(0))
      .otherwise(regexp_count(lower(text), lit(wordAltRe(stopwords))))

  /** Quality score in [0,1]: blend of length band, stopword presence,
    * alpha ratio and token diversity. Deterministic double arithmetic with
    * a fixed evaluation order (oracle-parity safe after round()). */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(coalesce(text, lit(""))).cast("double")
    val lengthOk = when(nTok.between(8, 4096), lit(1.0)).otherwise(lit(0.25))
    val stopRatio = when(nTok > 0, stopwordCount(text).cast("double") / nTok)
      .otherwise(lit(0.0))
    val stopOk = when(stopRatio.between(0.05, 0.6), lit(1.0)).otherwise(lit(0.5))
    val alphaRatio = when(nChar > 0,
      regexp_count(text, lit("[A-Za-z]")).cast("double") / nChar).otherwise(lit(0.0))
    val diversity = when(nTok > 0,
      size(array_distinct(tokens(text))).cast("double") / nTok).otherwise(lit(0.0))
    round(lengthOk * 0.3 + stopOk * 0.2 + alphaRatio * 0.3 + diversity * 0.2, 6)
  }

  /** Hashed-feature linear classifier inference (the fastText-style
    * quality filter of CCNet/RefinedWeb-shaped pipelines): score =
    * sigmoid(bias + Σ_token weights[md5-bucket(token)]). The model is
    * a plain weight vector — train it anywhere, paste the weights —
    * and inference is a row-local fold over the token array: zero
    * shuffles, the corpus is scored inside the scan stage. Feature
    * hashing is [[Sampling.splitBucket]] (md5, engine-portable), so an
    * external engine reproduces scores exactly.
    *
    * Weight-vector length = bucket count. Exactness note for oracle
    * parity: weights that are exact binary fractions (k/2^n) make the
    * fold's partial sums exact, so summation order can never produce a
    * different double. */
  def hashedLinearScore(text: Column, weights: Seq[Double],
                        bias: Double): Column = {
    require(weights.nonEmpty, "need at least one weight")
    val w = array(weights.map(lit): _*)
    val z = lit(bias) + aggregate(tokens(text), lit(0.0), (acc, t) =>
      acc + element_at(w,
        pmod(Sampling.splitBucket(t), lit(weights.length)) + 1))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Greedy longest-match subword segmentation (the WordPiece/BPE
    * inference rule) against a pasted vocabulary: each whitespace token
    * is consumed left-to-right, at every position taking the LONGEST
    * vocabulary piece that prefixes the remainder, falling back to a
    * single character when nothing matches (that character then counts
    * as unknown unless it is itself a piece). Returns the flattened
    * piece array for the document — real token counts for budgeting /
    * packing, where [[bpeIshTokenCount]] is only a proxy.
    *
    * Row-local and shuffle-free: the fold is a fixed
    * `maxPiecesPerWord`-step aggregate per word (truncating pathological
    * words, mirrored exactly by the oracle's recursion cap), each step
    * one codegen'd filter over the vocabulary array — O(steps · |V|)
    * string prefix tests per word. Fine for the curated-vocabulary
    * sizes this signature targets; a full 30k-entry production vocab
    * wants the same fold behind a trie-backed custom expression, the
    * [[graft.functions.RollingFingerprintExpression]] pattern. */
  def greedyPieces(text: Column, vocab: Seq[String],
                   maxPiecesPerWord: Int = 16): Column = {
    require(vocab.nonEmpty, "need a non-empty vocabulary")
    val vocabArr = array(vocab.map(lit): _*)
    val segmented = transform(tokens(text), w => {
      val folded = aggregate(
        sequence(lit(1), lit(maxPiecesPerWord)),
        struct(w.as("rest"), lit(Array.empty[String]).as("pieces")),
        (acc, _) => {
          val rest = acc.getField("rest")
          val pieces = acc.getField("pieces")
          val best = array_max(transform(
            filter(vocabArr, v => rest.startsWith(v)), v => length(v)))
          val take = coalesce(best, lit(1))
          when(length(rest) === 0, acc).otherwise(struct(
            rest.substr(take + 1, length(rest)).as("rest"),
            concat(pieces, array(rest.substr(lit(1), take))).as("pieces")))
        })
      folded.getField("pieces")
    })
    flatten(segmented)
  }

  /** [[greedyPieces]] behind a code-point trie
    * ([[graft.functions.GreedySegmentExpression]]): identical output
    * (FunctionsSpec asserts parity on a 10k-piece vocabulary; q159's
    * DuckDB oracle replays the same rule), but the per-position cost is
    * O(matched piece length) instead of O(|V|) prefix tests — the path
    * a production 30k-entry vocabulary runs. Tokenization is shared
    * with the fold formulation (the expression consumes
    * [[tokens]]' output array), so the two differ only in the scan. */
  def greedyPiecesTrie(text: Column, vocab: Seq[String],
                       maxPiecesPerWord: Int = 16): Column =
    graft.functions.GraftFunctions.greedySegment(
      tokens(text), vocab, maxPiecesPerWord)

  /** n-gram heuristic language ID: CJK chars -> zh, else argmax of
    * per-language stopword hits (ties broken by fixed language order). */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "es" -> Seq("el", "la", "los", "las", "es", "en", "que", "por", "una", "para"),
    "fr" -> Seq("le", "la", "les", "est", "et", "que", "pour", "dans", "une", "vous"))

  def langId(text: Column): Column = {
    val scores = LangStopwords.map { case (lang, words) =>
      lang -> stopwordCount(text, words)
    }
    // zh if any CJK char; else the first language (fixed order => ties are
    // deterministic) whose stopword-hit count equals the max — but only
    // when at least one stopword hit exists, otherwise every branch would
    // match score 0 and "unknown" could never fire.
    val maxScore = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(
      when(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0, lit("zh"))) {
      case (acc, (l, s)) => acc.when(maxScore > 0 && s === maxScore, lit(l))
    }
    chain.otherwise(lit("unknown"))
  }

  /** Sentence count: runs of [.!?], floored at 1 for non-empty text — the
    * usual Flesch denominator convention. */
  def sentenceCount(text: Column): Column =
    when(text.isNull || trim(text) === "", lit(0))
      .otherwise(greatest(regexp_count(text, lit("[.!?]+")), lit(1)))

  /** Syllable estimate: vowel groups per word ([aeiouy]+, case-folded) —
    * the standard cheap heuristic. */
  def syllableCount(text: Column): Column =
    when(text.isNull, lit(0))
      .otherwise(regexp_count(lower(text), lit("[aeiouy]+")))

  /** Flesch Reading Ease re-computation (the reference stores the
    * crawler's pre-computed score, sf_html_data.py:131; this derives it
    * from raw text): 206.835 - 1.015*(words/sentences)
    * - 84.6*(syllables/words). 0 for empty text. */
  def fleschReadingEase(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sents = sentenceCount(text).cast("double")
    val sylls = syllableCount(text).cast("double")
    when(words === 0, lit(0.0))
      .otherwise(lit(206.835) - lit(1.015) * (words / sents)
        - lit(84.6) * (sylls / words))
  }

  /** PII/noise scrubbing patterns (training-data cleaning). Patterns are
    * deliberately RE2-compatible (no backrefs/lookaround) so the same
    * regex runs identically in Spark (Java) and any RE2 engine. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val LongDigitRe = "[0-9]{7,}"

  /** Redact emails, URLs and long digit runs with typed placeholders. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      LongDigitRe, "<NUM>")

  def emailCount(text: Column): Column =
    when(text.isNull, lit(0)).otherwise(regexp_count(text, lit(EmailRe)))

  /** n-gram repetition ratio in [0,1): fraction of shingles that are
    * repeats of an earlier shingle — the standard boilerplate/spam signal
    * (0 = all distinct, ->1 = the document loops). */
  def repetitionRatio(text: Column, n: Int = 3): Column =
    repetitionRatioOfShingles(shingles(text, n))

  /** [[repetitionRatio]] over an already-computed shingle array. The
    * array is referenced three times below — project it as a named
    * column first (lambda-bearing expressions are exempt from codegen
    * CSE, so an inline `shingles(text, n)` argument would re-tokenize
    * the text once per reference). */
  def repetitionRatioOfShingles(sh: Column): Column = {
    val total = size(sh).cast("double")
    val distinctN = size(array_distinct(sh)).cast("double")
    when(total > 0, round((total - distinctN) / total, 6)).otherwise(lit(0.0))
  }

  /** Most frequent token with deterministic ties, computed ROW-LOCALLY:
    * sort the token array once, then fold run-lengths — no explode, no
    * shuffle, so at corpus scale this runs inside the scan stage. The
    * ascending sort makes the FIRST maximal run the tie-winner, which is
    * exactly "count desc, token asc" determinism (a strictly-greater
    * compare keeps the earliest = smallest token). Returns
    * struct(token, n); null-token/empty arrays yield (null, 0).
    *
    * Takes the token ARRAY (not text) so callers materialize the
    * tokenization once and share it across ops — re-tokenizing inside
    * every op is the expression-duplication trap. */
  def topToken(tokenArr: Column): Column = {
    val sorted = array_sort(tokenArr)
    // close the open run: promote it to best iff strictly longer
    def closed(acc: Column) = {
      val better = acc("run") > acc("n")
      (when(better, acc("prev")).otherwise(acc("tok")),
        when(better, acc("run")).otherwise(acc("n")))
    }
    val z = struct(
      lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(null).cast("string").as("tok"), lit(0L).as("n"))
    aggregate(sorted, z,
      (acc, x) => {
        val (ct, cn) = closed(acc)
        when(x === acc("prev"),
          struct(acc("prev").as("prev"), (acc("run") + 1).as("run"),
            acc("tok").as("tok"), acc("n").as("n")))
          .otherwise(struct(x.as("prev"), lit(1L).as("run"),
            ct.as("tok"), cn.as("n")))
      },
      acc => {
        val (ct, cn) = closed(acc)
        struct(ct.as("token"), cn.as("n"))
      })
  }

  /** Shannon entropy (base 2) of the token distribution, ROW-LOCAL like
    * [[topToken]]: H = log2(N) − Σ n·log2(n)/N over run-lengths of the
    * sorted array — the factored form needs no per-token probability and
    * one fold computes Σ n·log2(n). 0.0 for empty input (H of the empty
    * distribution by convention). The fold order is fixed (ascending
    * tokens), so the double sum is reproducible run-to-run. */
  def tokenEntropy(tokenArr: Column): Column = {
    val n = size(tokenArr).cast("double")
    def runTerm(run: Column) = {
      val r = run.cast("double")
      when(run > 1, r * log(2.0, r)).otherwise(lit(0.0))
    }
    val z = struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
      lit(0.0).as("s"))
    val sum = aggregate(array_sort(tokenArr), z,
      (acc, x) =>
        when(x === acc("prev"),
          struct(acc("prev").as("prev"), (acc("run") + 1).as("run"),
            acc("s").as("s")))
          .otherwise(struct(x.as("prev"), lit(1L).as("run"),
            (acc("s") + runTerm(acc("run"))).as("s"))),
      acc => acc("s") + runTerm(acc("run")))
    when(n > 0, log(2.0, n) - sum / n).otherwise(lit(0.0))
  }

  /** Re-chunk a token array into pseudo-lines of `width` tokens (space-
    * joined). Gives line-level signals (duplication, bullet ratios) a
    * deterministic line structure when the source text has none — and is
    * the display-side inverse of [[graft.ops.Curation.chunkTokens]].
    * Row-local. */
  def tokenLines(toks: Column, width: Int): Column = {
    require(width > 0, s"line width must be positive, got $width")
    // sequence(1, 0) counts DOWN in Spark — guard the empty case instead
    // of relying on an empty range.
    when(size(toks) > 0,
      transform(
        sequence(lit(1), ceil(size(toks).cast("double") / width).cast("int")),
        i => array_join(slice(toks, (i - lit(1)) * width + lit(1), lit(width)),
          " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Line-duplication profile over a line array — the Gopher/MassiveText
    * boilerplate repetition signals: struct(n_lines, dup_line_frac,
    * dup_char_frac) where dup_line_frac is the fraction of lines that
    * repeat an earlier identical line and dup_char_frac the fraction of
    * line characters inside those repeats. Row-local: one array_distinct
    * + two length folds, no explode, so at corpus scale it rides the
    * scan stage. */
  def lineDupStats(linesArr: Column): Column = {
    val chars = (a: Column) =>
      aggregate(a, lit(0L), (acc, l) => acc + length(l))
    val n = size(linesArr)
    val d = array_distinct(linesArr)
    val total = chars(linesArr).cast("double")
    struct(
      n.cast("long").as("n_lines"),
      when(n > 0, (n - size(d)).cast("double") / n.cast("double"))
        .otherwise(lit(0.0)).as("dup_line_frac"),
      when(total > 0, (chars(linesArr) - chars(d)).cast("double") / total)
        .otherwise(lit(0.0)).as("dup_char_frac"))
  }

  /** Count of characters matching a single-char regex class (e.g.
    * "[A-Za-z]") — length-difference against the class stripped out, so
    * it stays inside codegen (no regexp_extract_all array). */
  def charClassCount(text: Column, classRe: String): Column =
    when(text.isNull, lit(0L)).otherwise(
      (length(text) - length(regexp_replace(text, classRe, ""))).cast("long"))

  /** Character-script profile — struct of latin / digit / whitespace /
    * ASCII-punctuation / non-ASCII fractions plus the U+FFFD replacement-
    * character count, the standard mojibake / encoding-damage detector a
    * web-scale ingest runs before language ID. Row-local. */
  def scriptProfile(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val total = length(t).cast("double")
    val latin = charClassCount(t, "[A-Za-z]")
    val digit = charClassCount(t, "[0-9]")
    val space = charClassCount(t, "\\s")
    val nonAscii = charClassCount(t, "[^\\x00-\\x7F]")
    val punct = length(t) - latin - digit - space - nonAscii
    def frac(c: Column) = when(total > 0, c.cast("double") / total)
      .otherwise(lit(0.0))
    struct(
      length(t).cast("long").as("n_chars"),
      frac(latin).as("latin_frac"), frac(digit).as("digit_frac"),
      frac(space).as("space_frac"), frac(punct).as("punct_frac"),
      frac(nonAscii).as("non_ascii_frac"),
      (length(t) - length(regexp_replace(t, "�", ""))).cast("long")
        .as("n_replacement"))
  }

  /** Document fingerprint: md5 over the sorted distinct token bag — a
    * word-order-insensitive exact-duplicate key (cheaper than rolling
    * hashes and portable to the oracle). */
  def fingerprint(text: Column): Column =
    fastMd5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Rolling (polynomial / Rabin-Karp-style) document hash: fold tokens
    * in ORDER as h = (h * B + tokenVal) mod M — order-sensitive, unlike
    * [[fingerprint]]'s bag key, and incrementally updatable at 100 TB
    * (append a token = one multiply-add). tokenVal is the token's md5
    * 28-bit prefix; M = 2^31 - 1 keeps every intermediate below 2^52 so
    * the arithmetic is exact in both long and double engines and never
    * overflows an engine that checks (DuckDB errors on BIGINT overflow,
    * Java wraps — staying small sidesteps the divergence). */
  def rollingHash(text: Column): Column = {
    val M = 2147483647L // 2^31 - 1
    val B = 1000003L
    val tokenVals = transform(tokens(text),
      t => conv(substring(fastMd5(t), 1, 7), 16, 10).cast("long"))
    when(text.isNull, lit(0L)).otherwise(
      aggregate(tokenVals, lit(0L), (acc, v) => pmod(acc * B + v, lit(M))))
  }

  /** Word n-gram shingles; documents shorter than n collapse to one
    * whole-text shingle. Row-local (no explode needed by callers that
    * aggregate with higher-order functions). */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** Same, over an already-tokenized array column (avoids re-tokenizing
    * when the caller needs both the tokens and the shingles). */
  def shinglesOfTokens(toks: Column, n: Int): Column = {
    val cnt = size(toks)
    when(cnt >= n,
      transform(sequence(lit(1), cnt - n + 1),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash family: h_i(x) = (h(x) * a_i + b_i) mod M over
    * h(x) = value of the first 7 hex digits of md5(x) (28 bits < M).
    * ONE md5 per shingle regardless of how many seeds — the per-seed work
    * is two integer ops — where a md5-per-seed formulation pays
    * numHashes x the digest cost, the dominant CPU of the LSH pipeline at
    * corpus scale. All operands stay < 2^59, so the arithmetic is exact
    * in any engine with 64-bit integers (the DuckDB oracle generator
    * receives the same (a_i, b_i) literals). */
  val MinhashMod = 2147483647L // 2^31 - 1, prime

  /** Deterministic mixing constants for seed i, derived from md5 so both
    * engines can be handed identical literals; a_i in [1, M-1]. */
  private[graft] def minhashParams(i: Int): (Long, Long) = {
    def v(tag: String): Long =
      java.lang.Long.parseLong(md5HexString(s"$tag:$i").substring(0, 7), 16)
    (v("a") % (MinhashMod - 1) + 1, v("b") % MinhashMod)
  }

  private def md5HexString(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** 28-bit base hash of one shingle: md5 hex prefix parsed to a long. */
  private[graft] def shingleHash(s: Column): Column =
    conv(substring(fastMd5(s), 1, 7), 16, 10).cast("long")

  /** MinHash value for one seed. No array_distinct: duplicates cannot
    * change a minimum, and distinct on a string array is O(n^2) — the
    * single hottest cost in the LSH pipeline before it was dropped. */
  def minhash(shingleArr: Column, seed: Int): Column = {
    val (a, b) = minhashParams(seed)
    array_min(transform(shingleArr,
      s => (shingleHash(s) * a + b) % MinhashMod))
  }

  /** SimHash over `bits` bits (<=32): per token md5; bit j is derived from
    * hex char j/4 (bit 3-(j%4) within the nibble); simhash bit j = sign of
    * sum(+1/-1) over tokens; packed little-endian. Row-local, no shuffle.
    *
    * Implementation: the first bits/4 hex chars parse to one integer L via
    * conv(), in which bit j of the definition above is (L >> (bits-1-j))&1
    * — so the whole per-token contribution is one md5 + one conv + `bits`
    * integer ops in a single fold, instead of `bits` separate
    * substring/instr passes over the token list (~10x less work, same
    * value bit-for-bit). */
  def simhash(text: Column, bits: Int = 32): Column = {
    require(bits % 4 == 0 && bits <= 32)
    // fused custom expression: one digest per token + `bits` integer ops
    // in a tight loop (the HOF formulation folded a bits-element
    // accumulator array through an interpreted zip_with per token —
    // see functions.SimHashExpression for the exact-identity argument)
    val packed = graft.functions.GraftFunctions
      .simhashPacked(tokens(text), bits)
    // null text must also land in the 0 branch: size(tokens(null)) is null
    // (not 0), which would otherwise propagate a NULL simhash while the
    // SQL oracle's CASE chain yields 0
    when(text.isNull || size(tokens(text)) === 0, lit(0L)).otherwise(packed)
  }

  /** Hamming distance between two packed simhash values (<=32 bits):
    * popcount of xor — one codegen'd instruction instead of a 32-term
    * shift/mask chain. */
  def hammingDistance(a: Column, b: Column, bits: Int = 32): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}
