package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators (SURVEY §2.12: "a custom Aggregator[IN,BUF,OUT] is
  * justified only for exact top-k-by-similarity per group" — this is that
  * aggregator).
  */
object Aggregators {

  case class Scored(group: Long, id: Long, score: Double)
  case class ScoredId(id: Long, score: Double)
  case class TopKBuf(items: Seq[ScoredId])

  /** Exact per-group top-k with a k-bounded buffer. Versus the
    * window/row_number formulation, the shuffle carries at most k rows per
    * group per map partition (partial buffers merge map-side) instead of
    * every candidate row — at 100 TB with millions of candidates per
    * group, that is the difference between a k-row exchange and a full
    * sort of the candidate set.
    *
    * Ordering: score descending, id ascending tiebreak (deterministic,
    * matches Similarity.crossTopK). Buffer maintenance is sort+take —
    * O(k log k) on insert batches; swap for a bounded heap if k is large.
    */
  class TopK(k: Int) extends Aggregator[Scored, TopKBuf, Seq[ScoredId]] {
    // java.lang.Double.compare semantics (NaN greater than everything)
    // match Spark's desc sort, where NaN ranks FIRST — Scala's tuple
    // sortBy(-score) would instead drop NaN rows to the bottom and
    // diverge from the window formulation
    private def trim(items: Seq[ScoredId]): Seq[ScoredId] =
      items.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c > 0 else a.id < b.id
      }.take(k)

    override def zero: TopKBuf = TopKBuf(Seq.empty)
    override def reduce(b: TopKBuf, a: Scored): TopKBuf =
      TopKBuf(trim(b.items :+ ScoredId(a.id, a.score)))
    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
      TopKBuf(trim(b1.items ++ b2.items))
    override def finish(b: TopKBuf): Seq[ScoredId] = trim(b.items)
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Per-group exact top-k over a scored Dataset. */
  def groupedTopK(scored: Dataset[Scored], k: Int): Dataset[(Long, Seq[ScoredId])] = {
    import scored.sparkSession.implicits._
    scored.groupByKey(_.group).agg(new TopK(k).toColumn.name("topk"))
  }
}
