package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: greedy longest-match subword segmentation
  * (the WordPiece/BPE inference rule) behind a code-point trie — the
  * production-vocabulary fast path for `Text.greedyPieces`.
  *
  * Input is the already-tokenized word array (the output of
  * `Text.tokens`), so tokenization semantics are shared with the fold
  * formulation by construction; only the per-word vocabulary scan is
  * replaced. Each word is consumed left-to-right: at every position the
  * trie walk finds the LONGEST vocabulary piece prefixing the remainder
  * in O(piece length) — independent of |V| — falling back to a single
  * code point when no piece matches, capped at `maxPiecesPerWord` pieces
  * per word (the remainder beyond the cap is dropped, mirroring the
  * fold's fixed-step aggregate and the oracle's recursion cap). Output
  * is the flattened piece array in document order, bit-identical to
  * `Text.greedyPieces` (FunctionsSpec asserts parity on a 10k-piece
  * vocabulary).
  *
  * The fold costs O(steps · |V|) string prefix tests per word — fine for
  * curated vocabularies, ~500× the work of this walk at a production
  * 30k-entry vocab. The trie is built once per expression instance
  * (`@transient lazy`, rebuilt per executor after serialization) and
  * shipped to codegen as a reference object.
  *
  * Null word array → null; null elements (cannot occur from
  * `Text.tokens`, whose filter drops them) are skipped defensively.
  */
case class GreedySegmentExpression(child: Expression, vocab: Seq[String],
                                   maxPiecesPerWord: Int)
    extends UnaryExpression {
  require(vocab.nonEmpty, "need a non-empty vocabulary")
  require(vocab.forall(_.nonEmpty), "vocabulary pieces must be non-empty")
  require(maxPiecesPerWord > 0,
    s"maxPiecesPerWord must be > 0, got $maxPiecesPerWord")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_greedy_segment"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${t.sql}")
  }

  @transient private lazy val trie: GreedySegmentExpression.Trie =
    GreedySegmentExpression.buildTrie(vocab)

  override protected def nullSafeEval(input: Any): Any =
    GreedySegmentExpression.compute(
      input.asInstanceOf[ArrayData], trie, maxPiecesPerWord)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("greedyTrie", trie,
      classOf[GreedySegmentExpression.Trie].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GreedySegmentExpression.compute(" +
        s"$c, $trieRef, $maxPiecesPerWord)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): GreedySegmentExpression =
    copy(child = newChild)
}

object GreedySegmentExpression {

  /** Code-point-keyed trie node. LongMap keeps child lookup
    * allocation-free on the hot path (ASCII vocabularies could use a
    * 128-ary array, but the walk must stay correct for any Unicode
    * piece set). */
  final class Trie extends Serializable {
    val children = new mutable.LongMap[Trie]()
    var isPiece: Boolean = false
  }

  def buildTrie(vocab: Seq[String]): Trie = {
    val root = new Trie
    vocab.foreach { piece =>
      var node = root
      var i = 0
      while (i < piece.length) {
        val cp = piece.codePointAt(i)
        node = node.children.getOrElseUpdate(cp.toLong, new Trie)
        i += Character.charCount(cp)
      }
      node.isPiece = true
    }
    root
  }

  def compute(words: ArrayData, trie: Trie, maxPiecesPerWord: Int): ArrayData = {
    val out = new java.util.ArrayList[Any]()
    val n = words.numElements()
    var wi = 0
    while (wi < n) {
      if (!words.isNullAt(wi)) {
        val w = words.getUTF8String(wi)
        if (w != null) segmentWord(w.toString, trie, maxPiecesPerWord, out)
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** One word: repeated longest-prefix trie walks. Matching is by code
    * point — identical to the fold path, whose `substr`/`length` count
    * code points — with UTF-16 indices only as internal cursors
    * (boundaries always align because the trie consumes whole code
    * points). */
  private def segmentWord(word: String, root: Trie, maxPieces: Int,
                          out: java.util.ArrayList[Any]): Unit = {
    val len = word.length
    var pos = 0
    var steps = 0
    while (pos < len && steps < maxPieces) {
      var node = root
      var j = pos
      var best = -1
      var walking = true
      while (walking && j < len) {
        val cp = word.codePointAt(j)
        val next = node.children.getOrNull(cp.toLong)
        if (next eq null) walking = false
        else {
          node = next
          j += Character.charCount(cp)
          if (node.isPiece) best = j
        }
      }
      val end =
        if (best > pos) best
        else pos + Character.charCount(word.codePointAt(pos))
      out.add(UTF8String.fromString(word.substring(pos, end)))
      pos = end
      steps += 1
    }
  }
}
