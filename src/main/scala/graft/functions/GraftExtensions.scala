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
    GraftExtensions.descriptors.foreach(ext.injectFunction)
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

  import org.apache.spark.sql.GraftColumnBridge.{column, deepExpression}
  import org.apache.spark.sql.Column

  /** Lift a Column-tree op into a SQL function builder: child expressions
    * wrap as Columns, the ops-library function builds its (codegen'd,
    * UDF-free) expression tree, and the result unwraps back to an
    * Expression. The SQL surface and the DataFrame surface therefore
    * share ONE implementation — they cannot drift. */
  private def lift(name: String, arity: Int)(f: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(GraftExtensions.getClass.getName, name),
    (children: Seq[Expression]) => {
      if (children.length != arity)
        // the standard analysis error for bad arity, not a bare
        // IllegalArgumentException the analyzer would surface as internal
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> arity.toString,
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      deepExpression(f(children.map(column)))
    })

  /** graft_rolling_fingerprints(text, windowChars, sampleMod): the O(n)
    * content-defined substring fingerprints (window/mod must be integer
    * literals — they parameterize the generated code). Defined BEFORE
    * `descriptors`, which captures it at object init. */
  val RollingFingerprintsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_rolling_fingerprints"),
    new ExpressionInfo(classOf[RollingFingerprintExpression].getName,
      "graft_rolling_fingerprints"),
    (children: Seq[Expression]) => {
      if (children.length != 3)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
            "functionName" -> "`graft_rolling_fingerprints`",
            "expectedNum" -> "3",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      def intArg(e: Expression, name: String): Int = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case _ => throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT", Map(
            "funcName" -> "`graft_rolling_fingerprints`",
            "paramName" -> s"`$name`",
            "paramType" -> "\"INT\""))
      }
      RollingFingerprintExpression(children.head,
        intArg(children(1), "windowChars"), intArg(children(2), "sampleMod"))
    })

  /** Evaluate a foldable array argument to a Scala Seq, or raise the
    * standard non-foldable analysis error — model parameters (a
    * tokenizer vocabulary, a weight vector) must be literals because
    * they parameterize the generated expression tree. */
  private def foldableArray[T](e: Expression, fn: String, param: String,
      elemType: org.apache.spark.sql.types.DataType,
      conv: Any => T): Seq[T] = {
    // a foldable array of the wrong element type (array(0.25, -0.5) is
    // DECIMAL in SQL) is coerced via Cast, mirroring how the scalar
    // args are handled — NON_FOLDABLE_ARGUMENT is reserved for
    // genuinely non-foldable / non-array inputs
    val coerced = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(t, n) if e.foldable =>
        if (t == elemType) e
        else org.apache.spark.sql.catalyst.expressions.Cast(e,
          org.apache.spark.sql.types.ArrayType(elemType, n))
      case _ =>
        throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT", Map(
            "funcName" -> s"`$fn`", "paramName" -> s"`$param`",
            "paramType" -> s""""ARRAY<$elemType>""""))
    }
    coerced.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(elemType).toSeq.map(conv)
  }

  /** graft_wordpiece(text, vocabArray): greedy longest-match subword
    * segmentation — vocab must be an array literal (it parameterizes
    * the trie the expression builds once per instance). */
  val WordpieceDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_wordpiece"),
    new ExpressionInfo(GraftExtensions.getClass.getName, "graft_wordpiece"),
    (children: Seq[Expression]) => {
      if (children.length != 2)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
            "functionName" -> "`graft_wordpiece`",
            "expectedNum" -> "2",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      val vocab = foldableArray[String](children(1), "graft_wordpiece",
        "vocab", org.apache.spark.sql.types.StringType, _.toString)
      deepExpression(
        graft.ops.Text.greedyPiecesTrie(column(children.head), vocab))
    })

  /** graft_bpe_encode(text, lhsArray, rhsArray): BPE encoding under a
    * learned merge table (rank = array position; the two arrays must
    * be literal and same-length — the SQL lift of
    * `Bpe.encodeFast`/[[BpeEncodeExpression]]). */
  val BpeEncodeDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bpe_encode"),
    new ExpressionInfo(GraftExtensions.getClass.getName, "graft_bpe_encode"),
    (children: Seq[Expression]) => {
      if (children.length != 3)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
            "functionName" -> "`graft_bpe_encode`",
            "expectedNum" -> "3",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      val lhs = foldableArray[String](children(1), "graft_bpe_encode",
        "lhs", org.apache.spark.sql.types.StringType, _.toString)
      val rhs = foldableArray[String](children(2), "graft_bpe_encode",
        "rhs", org.apache.spark.sql.types.StringType, _.toString)
      require(lhs.length == rhs.length,
        s"graft_bpe_encode: lhs (${lhs.length}) and rhs (${rhs.length}) " +
          "merge arrays must be the same length")
      deepExpression(graft.functions.GraftFunctions.bpeEncode(
        graft.ops.Text.tokens(column(children.head)), lhs.zip(rhs)))
    })

  /** graft_linear_score(text, weightsArray, bias): hashed-feature
    * linear-model inference (q152's scorer) — weights and bias must be
    * literals. */
  val LinearScoreDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_linear_score"),
    new ExpressionInfo(GraftExtensions.getClass.getName, "graft_linear_score"),
    (children: Seq[Expression]) => {
      if (children.length != 3)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
            "functionName" -> "`graft_linear_score`",
            "expectedNum" -> "3",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      val w = foldableArray[Double](children(1), "graft_linear_score",
        "weights", org.apache.spark.sql.types.DoubleType,
        _.asInstanceOf[Double])
      val bias = (if (children(2).foldable)
          Option(Cast(children(2),
            org.apache.spark.sql.types.DoubleType).eval(null))
        else None) match {
        case Some(d: java.lang.Double) => d.doubleValue
        case _ => throw new org.apache.spark.sql.AnalysisException(
          "NON_FOLDABLE_ARGUMENT", Map(
            "funcName" -> "`graft_linear_score`",
            "paramName" -> "`bias`", "paramType" -> "\"DOUBLE\""))
      }
      deepExpression(graft.ops.Text.hashedLinearScore(
        column(children.head), w, bias))
    })

  /** Every graft op exposed to the raw SQL path. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    GraftMd5Descriptor,
    lift("graft_token_count", 1)(cs => graft.ops.Text.tokenCount(cs.head)),
    lift("graft_bpe_token_count", 1)(cs => graft.ops.Text.bpeIshTokenCount(cs.head)),
    lift("graft_quality_score", 1)(cs => graft.ops.Text.qualityScore(cs.head)),
    lift("graft_lang_id", 1)(cs => graft.ops.Text.langId(cs.head)),
    lift("graft_fingerprint", 1)(cs => graft.ops.Text.fingerprint(cs.head)),
    lift("graft_rolling_hash", 1)(cs => graft.ops.Text.rollingHash(cs.head)),
    lift("graft_simhash", 1)(cs => graft.ops.Text.simhash(cs.head)),
    lift("graft_repetition_ratio", 1)(cs => graft.ops.Text.repetitionRatio(cs.head)),
    lift("graft_cosine", 2)(cs => graft.ops.Similarity.cosine(cs(0), cs(1))),
    lift("graft_canonical_url", 1)(cs => graft.ops.Urls.canonicalize(cs.head)),
    lift("graft_redact_pii", 1)(cs => graft.ops.Text.redactPii(cs.head)),
    lift("graft_flesch", 1)(cs => graft.ops.Text.fleschReadingEase(cs.head)),
    // text-in (tokenizes internally): SQL callers pass the raw column
    lift("graft_token_entropy", 1)(cs =>
      graft.ops.Text.tokenEntropy(graft.ops.Text.tokens(cs.head))),
    lift("graft_top_token", 1)(cs =>
      graft.ops.Text.topToken(graft.ops.Text.tokens(cs.head))),
    lift("graft_normalize_text", 1)(cs =>
      graft.ops.Curation.normalizeText(cs.head)),
    lift("graft_dot", 2)(cs => GraftFunctions.dotProduct(cs(0), cs(1))),
    lift("graft_nfc", 1)(cs => GraftFunctions.nfcNormalize(cs.head)),
    lift("graft_deflate_ratio", 1)(cs => GraftFunctions.deflateRatio(cs.head)),
    lift("graft_l2sq", 2)(cs => GraftFunctions.l2Sq(cs(0), cs(1))),
    // distinct-common-element count of two string arrays (the exact-
    // similarity verify inner loop; null ELEMENTS never match — see
    // IntersectCountExpression's contract)
    lift("graft_intersect_count", 2)(cs =>
      GraftFunctions.intersectCount(cs(0), cs(1))),
    // md5 bucket in [0,256): the primitive under split labels, stratified
    // sampling and sharding — graft_split_bucket(id) % n is a shard id
    lift("graft_split_bucket", 1)(cs =>
      graft.ops.Sampling.splitBucket(cs.head)),
    RollingFingerprintsDescriptor,
    WordpieceDescriptor,
    BpeEncodeDescriptor,
    LinearScoreDescriptor)

  /** Register on a live session (the extensions conf only applies at
    * session construction). */
  def registerOn(spark: SparkSession): Unit =
    descriptors.foreach { d =>
      org.apache.spark.sql.GraftColumnBridge.registerFunction(
        spark, d._1, d._2, d._3)
    }
}
