package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native
  * codegen'd expression — the dedup-keying canonicalizer: visually
  * identical strings with different codepoint sequences ("é" composed
  * vs "e" + U+0301 combining acute) md5 to DIFFERENT digests, so exact
  * dedup, fingerprinting and URL canonicalization silently miss
  * duplicates unless keys are composed first. Spark has no
  * normalization built-in; a Scala UDF would pay per-row
  * (de)serialization on the dedup hot path, so this is a native
  * UnaryExpression (interpreted + `doGenCode`). Value-identical to
  * DuckDB's `nfc_normalize` (the q192 oracle replays it) and to ICU
  * NFC on the BMP sequences real corpora contain.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap quick-check scan
  * (most real text is already NFC), so the common case does one pass
  * and ZERO allocation — the UTF8String is returned as-is.
  */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpression.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalizeExpression.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpression =
    copy(child = newChild)
}

object NfcNormalizeExpression {
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
