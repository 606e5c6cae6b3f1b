package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: the md5 MODE of substring-window
  * fingerprinting (`Dedup.substringDupWindows`) as ONE fused pass.
  *
  * Value-identical (bit-for-bit, FunctionsSpec-asserted) to the HOF
  * formulation it replaces:
  *
  * {{{
  * filter(transform(sequence(1, greatest(char_length(t) - (w-1), 1), 1),
  *                  p -> md5(substr(t, p, w))),
  *        h -> cast(conv(substr(h, 1, 3), 16, 10) as int) % mod = 0)
  * }}}
  *
  * i.e. md5-hex every `windowChars`-wide character window (a string
  * shorter than the window yields one whole-string window; the empty
  * string hashes its single empty window), keep the windows whose first
  * 12 digest bits ≡ 0 (mod `sampleMod`), in document order.
  *
  * Why the fusion is the hot-path win (guide: eliminate non-codegen
  * work in dense loops): the HOF chain evaluates interpreted
  * (ArrayTransform/ArrayFilter are CodegenFallback), pays one
  * `MessageDigest.getInstance` per window via the built-in `md5`,
  * materializes the full lazy `sequence` array, re-walks the string
  * from the start for every `substr(t, p, w)` (O(n·w) position lookups
  * alone), and then string-parses 3 hex chars back to an int per
  * window for the selection test. This pass walks the UTF-8 bytes
  * once to index character offsets, feeds each window's byte slice to
  * ONE reused digest instance, and reads the 12 selection bits
  * directly from the digest bytes. Same digest work, none of the
  * per-window machinery.
  *
  * Null input → null.
  */
case class Md5FingerprintsExpression(child: Expression,
                                     windowChars: Int, sampleMod: Int)
    extends UnaryExpression {
  require(windowChars > 0 && windowChars <= (1 << 16),
    s"windowChars must be in [1, 65536], got $windowChars")
  require(sampleMod > 0 && sampleMod <= 4096,
    s"sampleMod must be in [1, 4096] (selector is 12 digest bits), got $sampleMod")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_md5_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5FingerprintsExpression.compute(
      input.asInstanceOf[UTF8String], windowChars, sampleMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5FingerprintsExpression.compute(" +
        s"$c, $windowChars, $sampleMod)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5FingerprintsExpression =
    copy(child = newChild)
}

object Md5FingerprintsExpression {

  /** All selected window md5-hex fingerprints of `s`, in position
    * order — the fused twin of the `filter(transform(...))` chain in
    * the scaladoc above. */
  def compute(s: UTF8String, windowChars: Int, sampleMod: Int): ArrayData = {
    val bytes = s.getBytes
    // character → byte-offset index (one UTF-8 walk, like UTF8String's
    // own substring, so window boundaries match substr() code points)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      nChars += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    val offs = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      offs(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nChars) = bytes.length
    // greatest(char_length - (w-1), 1) windows, pos 1-based
    val count = math.max(nChars - windowChars + 1, 1)
    val md = Md5HexExpression.threadDigest.get()
    val out = new java.util.ArrayList[Any]()
    var p = 0
    while (p < count) {
      val from = if (p < nChars) offs(p) else bytes.length
      val to = if (p + windowChars < nChars) offs(p + windowChars)
        else bytes.length
      md.update(bytes, from, to - from)
      val d = md.digest() // digest() resets the instance
      // first 3 hex digits as an int: cast(conv(substr(h,1,3),16,10) as int)
      val sel = ((d(0) & 0xff) << 4) | ((d(1) >> 4) & 0xf)
      if (sel % sampleMod == 0)
        out.add(UTF8String.fromString(Md5HexExpression.hex(d)))
      p += 1
    }
    new GenericArrayData(out.toArray)
  }
}
