package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Custom Catalyst expression: packed SimHash of a token-array column in
  * one pass.
  *
  * Value-identical to the higher-order-function formulation it replaces
  * (`Text.simhash`, which now delegates here): per token, md5 the UTF-8
  * bytes, parse the first bits/4 hex chars as an integer L, and add
  * ±1 to counter j from bit (bits-1-j) of L; bit j of the packed result
  * is set iff counter j ends positive. All-integer arithmetic, so
  * "identical" is exact, not rounded — the q25/q26 oracles (generated
  * SQL mirroring the same bit derivation) are unchanged.
  *
  * Why: the HOF tree folds a bits-element accumulator ARRAY through an
  * interpreted zip_with per token — one closure call per (token, bit)
  * plus an array allocation per token. This loop is the whole cost of
  * the simhash dedup family; fusing it leaves one digest per token and
  * `bits` integer ops in a tight Java loop (digest instance reused via
  * the same thread-local as Md5HexExpression). Empty input packs to 0L;
  * a null token element yields 0L (mirroring the HOF null-propagation
  * endpoint); a null array is null.
  */
case class SimHashExpression(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits % 4 == 0 && bits > 0 && bits <= 32,
    s"bits must be a positive multiple of 4, <= 32; got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_packed"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpression.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashExpression.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpression =
    copy(child = newChild)
}

/** Custom Catalyst expression: the full MinHash signature (all seed
  * minima) of a shingle-array column in one pass.
  *
  * Value-identical to the HOF formulation it replaces
  * (`Dedup.withMinhashSignature`'s aggregate/zip_with fold): per
  * shingle, h = first 7 md5 hex chars as an integer (28 bits), and
  * sig_i = min over shingles of (h * a_i + b_i) mod `mod`. Minima start
  * at `mod` (every mixed value is smaller), an empty shingle array
  * yields a mod-filled signature, and null shingle elements are skipped
  * — exactly the `least(m, null) = m` endpoint of the fold. All-integer
  * (operands < 2^59), so identity is exact.
  *
  * Why: the HOF tree pays an interpreted closure per (shingle, seed)
  * plus a per-shingle accumulator-array allocation; this loop is one
  * digest per shingle and two integer ops per seed — and the md5
  * signature pass is the dominant CPU of the LSH dedup pipeline.
  */
case class MinHashSigExpression(child: Expression,
                                as: Seq[Long], bs: Seq[Long], mod: Long)
    extends UnaryExpression {
  require(as.nonEmpty && as.length == bs.length,
    s"need matching non-empty seed params, got ${as.length}/${bs.length}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${t.sql}")
  }

  private lazy val aArr = as.toArray
  private lazy val bArr = bs.toArray

  def compute(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val k = aArr.length
    val minima = Array.fill(k)(mod)
    val digest = Md5HexExpression.threadDigest.get()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) { // least(m, null) = m -> skip
        val hex = Md5HexExpression.hex(
          digest.digest(shingles.getUTF8String(i).getBytes))
        val h = java.lang.Long.parseLong(hex.substring(0, 7), 16)
        var s = 0
        while (s < k) {
          val v = (h * aArr(s) + bArr(s)) % mod
          if (v < minima(s)) minima(s) = v
          s += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(minima)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mhSig", this,
      classOf[MinHashSigExpression].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpression =
    copy(child = newChild)
}

object SimHashExpression {
  /** One digest per token + bits integer ops; exact replica of the HOF
    * bit derivation (see class doc). */
  def compute(tokens: ArrayData, bits: Int): Long = {
    val n = tokens.numElements()
    if (n == 0) return 0L
    val hexChars = bits / 4
    val counts = new Array[Int](bits)
    val digest = Md5HexExpression.threadDigest.get()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) return 0L // HOF tree's null endpoint
      val hex = Md5HexExpression.hex(
        digest.digest(tokens.getUTF8String(i).getBytes))
      val l = java.lang.Long.parseLong(hex.substring(0, hexChars), 16)
      var j = 0
      while (j < bits) {
        counts(j) += ((((l >> (bits - 1 - j)) & 1L) * 2L - 1L)).toInt
        j += 1
      }
      i += 1
    }
    var packed = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) packed |= (1L << j)
      j += 1
    }
    packed
  }
}
