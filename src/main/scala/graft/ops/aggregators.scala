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

  /** Mergeable gram-matrix aggregator: buffer = the flattened d×d
    * matrix, reduce folds one v·vᵀ outer product in a tight JVM loop,
    * merge adds buffers element-wise. Versus the (i,j)-explode +
    * groupBy formulation this moves the d² work out of Catalyst row
    * fan-out (d² ROWS per vector through the partial aggregate)
    * into d² double ops per vector — the difference that matters once
    * d reaches real embedding widths (1024² = 1M rows per vector vs
    * one array update). Exploits symmetry: only the upper triangle is
    * accumulated, then mirrored in finish. */
  class Gram(dim: Int)
      extends Aggregator[Seq[Float], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = new Array[Double](dim * dim)
    override def reduce(b: Array[Double], v: Seq[Float]): Array[Double] = {
      val a = v.toArray
      require(a.length == dim,
        s"Gram(dim=$dim) fed a ${a.length}-wide vector — a mismatched " +
          "dim would silently truncate or crash mid-aggregation")
      var i = 0
      while (i < dim) {
        val vi = a(i).toDouble
        var j = i
        while (j < dim) { b(i * dim + j) += vi * a(j); j += 1 }
        i += 1
      }
      b
    }
    override def merge(x: Array[Double], y: Array[Double]): Array[Double] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(b: Array[Double]): Seq[Double] = {
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < i) { b(i * dim + j) = b(j * dim + i); j += 1 }
        i += 1
      }
      b.toSeq
    }
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Count-Min Sketch frequency estimation: a mergeable sketch aggregator
    * over a token stream, answering "how often does each probe key
    * occur?" within eps·N overcount (never undercount) at the given
    * confidence — the bounded-memory heavy-hitter tool for corpus-scale
    * frequency questions where an exact groupBy on a 100 TB token stream
    * would shuffle the whole vocabulary.
    *
    * Built on Spark's public `org.apache.spark.util.sketch.CountMinSketch`
    * (the same structure `DataFrameStatFunctions.countMinSketch` fills,
    * but as an `Aggregator` the sketch merges map-side across partitions
    * and composes with typed groupBy instead of collecting per-column to
    * the driver). Increments commute, and the seed is fixed, so estimates
    * are identical under any partitioning. */
  class Cms(probes: Seq[String], eps: Double = 0.001,
            confidence: Double = 0.99, seed: Int = 42)
      extends Aggregator[String, org.apache.spark.util.sketch.CountMinSketch, Seq[Long]] {
    import org.apache.spark.util.sketch.CountMinSketch
    override def zero: CountMinSketch = CountMinSketch.create(eps, confidence, seed)
    override def reduce(b: CountMinSketch, a: String): CountMinSketch = {
      if (a != null) b.add(a)
      b
    }
    override def merge(b1: CountMinSketch, b2: CountMinSketch): CountMinSketch = {
      b1.mergeInPlace(b2)
      b1
    }
    override def finish(b: CountMinSketch): Seq[Long] =
      probes.map(b.estimateCount)
    override def bufferEncoder: Encoder[CountMinSketch] =
      Encoders.kryo[CountMinSketch]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Corpus-wide estimated frequencies of `probes` over a token stream:
    * one sketch per partition, merged to a single (probe, estimate) set.
    * The only data movement is the sketches themselves. */
  def cmsFrequencies(tokens: Dataset[String], probes: Seq[String],
                     eps: Double = 0.001, confidence: Double = 0.99)
      : Dataset[(String, Long)] = {
    import tokens.sparkSession.implicits._
    tokens.groupByKey(_ => 0)
      .agg(new Cms(probes, eps, confidence).toColumn.name("est"))
      .flatMap { case (_, ests) => probes.zip(ests) }
  }
}
