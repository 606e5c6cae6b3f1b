package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.BinaryType

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions as SQL functions, so the raw `spark.sql` path can call
  * them too:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT graft_md5(text) FROM docs")
  * }}}
  *
  * For an already-running session (tests, notebooks) use
  * [[GraftExtensions.registerOn]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.GraftMd5Descriptor)
}

object GraftExtensions {
  /** graft_md5(expr): digest-reusing md5 hex (accepts string or binary —
    * non-binary input is cast, mirroring the fastMd5 builder). */
  val GraftMd5Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_md5"),
    new ExpressionInfo(classOf[Md5HexExpression].getName, "graft_md5"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_md5 takes exactly one argument")
      val c = children.head
      if (c.dataType == BinaryType) Md5HexExpression(c)
      else Md5HexExpression(Cast(c, BinaryType))
    })

  /** Register on a live session (the extensions conf only applies at
    * session construction). */
  def registerOn(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftColumnBridge.registerFunction(spark,
      GraftMd5Descriptor._1, GraftMd5Descriptor._2, GraftMd5Descriptor._3)
}
