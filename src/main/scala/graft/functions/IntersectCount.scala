package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of DISTINCT common elements of two string arrays — the fused
  * inner loop of the exact-similarity verify stage: Jaccard needs
  * |A∩B| and |A∪B|, but with distinct inputs |A∪B| = |A| + |B| − |A∩B|,
  * so ONE intersection count replaces the `array_intersect` +
  * `array_union` pair — two hash-set builds and two MATERIALIZED
  * result arrays per candidate pair become one set build and a long.
  * Value-identical to `size(array_intersect(a, b))` on null-free
  * inputs (FunctionsSpec asserts bit-parity, including duplicate
  * edges: duplicates count once, like the set-returning built-ins).
  * ONE deliberate divergence: a null ELEMENT never matches anything
  * here, whereas `array_intersect` pairs null with null — so on
  * arrays that can contain null elements this is NOT a drop-in for
  * `size(array_intersect)`. The verify-stage digest arrays are
  * null-free by construction (md5 of non-null shingles), which is the
  * contract this expression is scoped to.
  *
  * Null ARRAY on either side → null (the built-ins' propagation).
  */
case class IntersectCountExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_count requires two ARRAY<STRING> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectCountExpression.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.IntersectCountExpression.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountExpression =
    copy(left = newLeft, right = newRight)
}

object IntersectCountExpression {
  /** Distinct-common-element count: hash the SMALLER side once, probe
    * with the larger, removing on hit so duplicates count once. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[UTF8String](
      math.max(4, small.numElements() * 2))
    var i = 0
    val n = small.numElements()
    while (i < n) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var c = 0L
    var j = 0
    val m = large.numElements()
    while (j < m && !set.isEmpty) {
      if (!large.isNullAt(j) && set.remove(large.getUTF8String(j))) c += 1
      j += 1
    }
    c
  }
}
