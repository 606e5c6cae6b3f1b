package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: content-defined substring fingerprints in
  * one O(n) pass — the fast path for exact-substring dup profiling
  * (`Dedup.substringDupWindows`).
  *
  * Semantics: slide a `windowChars`-wide window over the string at every
  * position (a string shorter than the window yields one whole-string
  * window), Rabin-Karp-roll a polynomial hash (base 1000003, implicit
  * mod 2^64), finalize each window hash with a splitmix64-style mixer
  * (polynomial low bits are periodic in the base, so raw hashes must
  * not drive selection), and emit the mixed fingerprints whose unsigned
  * value ≡ 0 (mod `sampleMod`), in document order.
  *
  * Selection is content-defined, so — like the md5 formulation this
  * replaces at scale — a verbatim run shared by two documents selects
  * the same windows in both regardless of byte offset. Fingerprints are
  * NOT md5-compatible: the md5 path stays the cross-engine-checkable
  * oracle surface (q136), this expression is the measured fast path
  * (one multiply-add per character instead of one full md5 per
  * position — the digest work drops from O(n·w) to O(n)).
  *
  * Null input → null; empty string hashes its single empty window.
  */
case class RollingFingerprintExpression(child: Expression,
                                        windowChars: Int, sampleMod: Int)
    extends UnaryExpression {
  require(windowChars > 0 && windowChars <= (1 << 16),
    s"windowChars must be in [1, 65536], got $windowChars")
  require(sampleMod > 0, s"sampleMod must be > 0, got $sampleMod")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_rolling_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprintExpression.compute(
      input.asInstanceOf[UTF8String], windowChars, sampleMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingFingerprintExpression.compute(" +
        s"$c, $windowChars, $sampleMod)")

  override protected def withNewChildInternal(
      newChild: Expression): RollingFingerprintExpression =
    copy(child = newChild)
}

object RollingFingerprintExpression {
  private final val Base = 1000003L

  /** splitmix64 finalizer: full-avalanche mix so every bit of the
    * window hash reaches the selection modulus. */
  private def mix(h0: Long): Long = {
    var h = h0 + 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** All selected window fingerprints of `s`, in position order. */
  def compute(s: UTF8String, windowChars: Int, sampleMod: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val w = math.min(windowChars, math.max(n, 1))
    val out = new java.util.ArrayList[Any]()
    // initial window [0, w)
    var h = 0L
    var i = 0
    while (i < w && i < n) { h = h * Base + str.charAt(i); i += 1 }
    var m = mix(h)
    if (java.lang.Long.remainderUnsigned(m, sampleMod) == 0L)
      out.add(java.lang.Long.valueOf(m))
    if (n > w) {
      // B^(w-1) mod 2^64 for the roll-out term
      var bw = 1L
      i = 1
      while (i < w) { bw *= Base; i += 1 }
      var start = 1
      while (start <= n - w) {
        h = (h - str.charAt(start - 1) * bw) * Base + str.charAt(start + w - 1)
        m = mix(h)
        if (java.lang.Long.remainderUnsigned(m, sampleMod) == 0L)
          out.add(java.lang.Long.valueOf(m))
        start += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
