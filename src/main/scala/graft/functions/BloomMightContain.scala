package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Custom Catalyst expression: membership probe of a pre-built Bloom
  * filter (`org.apache.spark.util.sketch.BloomFilter`, the public sketch
  * Spark itself uses for runtime row-group filtering) against a LONG key
  * column.
  *
  * The filter travels as its serialized bytes inside the expression and
  * is deserialized once per executor instance (@transient lazy), so the
  * per-row cost is just the sketch's hash probes — codegen'd, stays
  * inside the whole-stage pipeline. This is the probe half of a
  * bloom-prefiltered join: build the sketch from the small side's keys
  * (distributed treeAggregate via `df.stat.bloomFilter`), prefilter the
  * big side BEFORE its shuffle, then exact-join; false positives are
  * removed by the join, so results are identical to the plain join while
  * the shuffle only carries the (1 + fpp)-fraction of matching rows.
  */
case class BloomMightContainExpression(bloomBytes: Array[Byte],
                                       child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain requires BIGINT input, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(input: Any): Any =
    mightContain(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference THIS expression (serializes only the bytes; the sketch
    // inflates lazily executor-side) rather than the deserialized filter
    val ref = ctx.addReferenceObj("graftBloom", this,
      classOf[BloomMightContainExpression].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpression =
    copy(child = newChild)
}
