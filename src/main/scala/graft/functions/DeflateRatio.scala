package graft.functions

import java.util.zip.Deflater
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: deflate(text).length /
  * text.utf8Length — the classic "compression filter" of web-corpus
  * curation (machine-generated boilerplate and keyword-stuffed spam
  * compress far better than human prose, so a LOW ratio is a strong
  * removal signal, complementary to the n-gram repetition and
  * duplicate-line fractions which only see exact repeats).
  *
  * Deterministic: fixed Deflater level/strategy with raw (nowrap)
  * output — the same bytes on every JVM, so scores are stable across
  * runs and partitions (asserted in FunctionsSpec). No SQL oracle —
  * DuckDB has no deflate — so verification is spec-level, like the
  * image decode path. One Deflater per thread, reset between rows
  * (allocation-free on the hot path, the Md5HexExpression discipline).
  * Empty and null inputs yield null (no meaningful ratio).
  */
case class DeflateRatioExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_ratio requires STRING input, got ${child.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    DeflateRatioExpression.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen
      .CodeGenerator.javaType(dataType)
    nullSafeCodeGen(ctx, ev, c => {
      // freshName: with a non-nullable child, nullSafeExec emits this
      // block UNBRACED into the shared scope — a fixed variable name
      // would collide across two deflateRatio calls in one stage
      val r = ctx.freshName("gdr")
      s"""java.lang.Double $r = graft.functions.DeflateRatioExpression.ratio($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ($javaType) $r.doubleValue(); }""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpression =
    copy(child = newChild)
}

object DeflateRatioExpression {
  private val threadDeflater: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() =>
      new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true))

  private val threadBuf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  /** null for empty input; otherwise compressedBytes / rawBytes. */
  def ratio(s: UTF8String): java.lang.Double = {
    val raw = s.getBytes
    if (raw.length == 0) return null
    val d = threadDeflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = threadBuf.get()
    var compressed = 0L
    while (!d.finished()) compressed += d.deflate(buf)
    compressed.toDouble / raw.length
  }
}
