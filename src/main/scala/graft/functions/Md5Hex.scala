package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: lowercase-hex md5 of a binary input.
  *
  * Value-identical to Spark's built-in `md5()`, but ~2x cheaper on
  * hash-dense workloads: the built-in goes through commons-codec
  * `DigestUtils.md5Hex`, which calls `MessageDigest.getInstance` on every
  * row; this expression allocates ONE digest per operator instance
  * (codegen mutable state / thread-local in interpreted mode) and resets
  * it between rows. MinHash signatures evaluate millions of md5s per
  * partition, so instance-allocation overhead is the measurable hot path
  * (SURVEY §2.12: a native Expression with doGenCode beats a UDF).
  */
case class Md5HexExpression(child: Expression) extends UnaryExpression {

  // surface a wrong input type at ANALYSIS time, not as a Janino compile
  // failure mid-job (ExpectsInputTypes is private[sql], so check manually)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_md5 requires BINARY input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_md5"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Md5HexExpression.hex(
        Md5HexExpression.threadDigest.get().digest(input.asInstanceOf[Array[Byte]])))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val digest = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.Md5HexExpression.hex($digest.digest($c)))")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5HexExpression =
    copy(child = newChild)
}

object Md5HexExpression {
  // MessageDigest.digest() resets the instance after each call, so reuse
  // across rows is safe.
  private[functions] val threadDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex, identical to commons-codec's encoding. */
  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge

  /** md5 hex of a string/binary column (digest-reusing fast path). */
  def fastMd5(c: Column): Column =
    GraftColumnBridge.column(
      Md5HexExpression(GraftColumnBridge.expression(c.cast("binary"))))

  /** Distinct-common-element count of two string arrays (fused
    * intersection counter — replaces array_intersect+array_union in
    * the exact-Jaccard verify hot loop; see the expression scaladoc). */
  def intersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntersectCountExpression(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Compression-ratio quality signal (deflate bytes / raw bytes —
    * low = repetitive/machine-generated). Deterministic; spec-verified
    * (no SQL oracle — see the expression's scaladoc). */
  def deflateRatio(c: Column): Column =
    GraftColumnBridge.column(
      DeflateRatioExpression(GraftColumnBridge.expression(c)))

  /** Unicode NFC canonical composition of a string column (native
    * expression; matches DuckDB nfc_normalize). Dedup keys must be
    * composed before hashing or visually-equal strings split. */
  def nfcNormalize(c: Column): Column =
    GraftColumnBridge.column(
      NfcNormalizeExpression(GraftColumnBridge.expression(c)))

  /** Cosine similarity of two float/double array columns (fused
    * codegen'd loop; value-identical to the HOF formulation). */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimExpression(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Dot product of two float/double array columns (fused codegen'd
    * loop; value-identical to the zip_with/aggregate fold). */
  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpression(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Squared L2 distance of two float/double array columns (fused
    * codegen'd loop; value-identical to the zip_with/aggregate fold —
    * the PQ distance). */
  def l2Sq(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2SqExpression(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Packed SimHash of a token-array column (one digest per token +
    * integer ops in a fused loop; exact replica of the HOF derivation). */
  def simhashPacked(tokens: Column, bits: Int): Column =
    GraftColumnBridge.column(SimHashExpression(
      GraftColumnBridge.expression(tokens), bits))

  /** Bloom-filter membership probe of a pre-built sketch against a long
    * key column (codegen'd; the sketch ships as bytes, inflates once per
    * executor). Probe half of Scale.bloomPrefilteredJoin. */
  def bloomMightContain(bloom: org.apache.spark.util.sketch.BloomFilter,
                        key: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    GraftColumnBridge.column(BloomMightContainExpression(
      bos.toByteArray, GraftColumnBridge.expression(key)))
  }

  /** Full MinHash signature (all seed minima) of a shingle-array column
    * in one fused pass — one digest per shingle, two integer ops per
    * seed. */
  def minhashSig(shingles: Column, as: Seq[Long], bs: Seq[Long],
                 mod: Long): Column =
    GraftColumnBridge.column(MinHashSigExpression(
      GraftColumnBridge.expression(shingles), as, bs, mod))

  /** Content-defined substring fingerprints of a string column in one
    * O(n) Rabin-Karp pass (the fast path of substring dup profiling —
    * one multiply-add per char vs one md5 per position). */
  def rollingFingerprints(text: Column, windowChars: Int,
                          sampleMod: Int): Column =
    GraftColumnBridge.column(RollingFingerprintExpression(
      GraftColumnBridge.expression(text), windowChars, sampleMod))

  /** md5-mode substring-window fingerprints of a string column in one
    * fused pass (bit-identical to the filter(transform(sequence...))
    * HOF chain it replaces — see the expression's scaladoc; the
    * cross-engine md5 arithmetic is unchanged, only the per-window
    * interpreter machinery is gone). The coalesce matches the chain's
    * null contract exactly: a NULL text yields an EMPTY array there
    * (greatest(char_length(NULL) − w + 1, 1) = 1, and the single null
    * md5 is dropped by the filter predicate), not a null array. */
  def md5Fingerprints(text: Column, windowChars: Int,
                      sampleMod: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      GraftColumnBridge.column(Md5FingerprintsExpression(
        GraftColumnBridge.expression(text), windowChars, sampleMod)),
      org.apache.spark.sql.functions.typedLit(Seq.empty[String]))

  /** Greedy longest-match subword segmentation of a word-array column
    * via a code-point trie (O(piece length) per position instead of
    * O(|V|) prefix tests — the production-vocabulary path of
    * `Text.greedyPieces`). */
  def greedySegment(words: Column, vocab: Seq[String],
                    maxPiecesPerWord: Int): Column =
    GraftColumnBridge.column(GreedySegmentExpression(
      GraftColumnBridge.expression(words), vocab, maxPiecesPerWord))

  /** BPE encoding of a word-array column under a learned merge table
    * shipped as a rank map (classic min-rank merge loop — zero plan
    * growth in the rule count, the production path of `Bpe.encode`). */
  def bpeEncode(words: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeEncodeExpression(
      GraftColumnBridge.expression(words), merges))
}
