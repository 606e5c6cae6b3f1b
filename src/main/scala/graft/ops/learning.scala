package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-engine model fitting for the quality-scoring loop: train the
  * hashed-feature linear model whose INFERENCE side is
  * [[Text.hashedLinearScore]] (q152) without leaving the engine — batch
  * gradient descent expressed as repeated aggregations over a cached
  * feature table.
  *
  * Least squares (not logistic) on purpose: every update is +/×/÷ only,
  * no transcendentals, so an external engine replays training step for
  * step and the learned weights are oracle-checkable — the same
  * determinism-first trade the PCA power iteration makes. For a
  * classification-shaped label in {0,1} the fitted scores still rank
  * (linear probability model); plug them into the sigmoid scorer as
  * calibration demands.
  */
object Learning {

  /** Hashed bag-of-words features, (doc_id, bucket, cnt) rows — the
    * sparse design matrix. Bucketing is md5-based
    * ([[Sampling.splitBucket]]) so features are stable across runs,
    * partitionings and engines. One (doc, bucket)-keyed shuffle with
    * map-side combine; rows are three fixed-width columns. */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(Text.tokens(col(textCol))).as("__t"))
      .select(col("doc_id"),
        pmod(Sampling.splitBucket(col("__t")), lit(buckets)).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).cast("double").as("cnt"))

  /** Fixed-iteration batch gradient descent for min_w Σ_d (y_d − w·x_d)²
    * over [[hashedFeatures]] rows and a (doc_id, y) label frame:
    * w ← w + lr · Σ_d (y_d − w·x_d) x_d / n.
    *
    * Scale: the feature table is localCheckpoint-ed once (fixed-width
    * rows; per-iteration plans are leaf scans, not re-derived
    * pipelines); each iteration is ONE doc-grain shuffle (margins) and
    * one bucket-grain shuffle (gradient, map-side combined into ≤
    * `buckets` groups per partition) — the corpus text is never
    * re-read. Weights live on the driver (buckets doubles) and enter
    * each pass as a broadcast literal array, the same
    * driver/cluster split as the PCA power iteration. Deterministic:
    * zero init, fixed iteration count, no sampling. */
  def trainLinear(features: DataFrame, labels: DataFrame, buckets: Int,
                  lr: Double, iters: Int): Array[Double] = {
    val feats = features.localCheckpoint()
    val n = labels.count().toDouble
    var w = Array.fill(buckets)(0.0)
    for (_ <- 0 until iters) {
      val wArr = array(w.toIndexedSeq.map(lit): _*)
      val margins = feats.groupBy("doc_id")
        .agg(sum(col("cnt") * element_at(wArr, col("bucket") + 1))
          .as("__m"))
      val resid = labels.join(margins, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("y") - coalesce(col("__m"), lit(0.0))).as("__r"))
      val grad = feats.join(resid, Seq("doc_id"))
        .groupBy("bucket")
        .agg((sum(col("cnt") * col("__r")) / n).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = Array.tabulate(buckets)(b => w(b) + lr * grad.getOrElse(b, 0.0))
    }
    // the weights are driver-side now — the checkpointed feature
    // blocks have no further reader
    Scale.releaseLocalCheckpoint(feats)
    w
  }

  /** Mean squared error of a weight vector over the same frames —
    * the train-loss gauge a fit loop reports. */
  def mse(features: DataFrame, labels: DataFrame,
          w: Array[Double]): Double = {
    val wArr = array(w.toIndexedSeq.map(lit): _*)
    val margins = features.groupBy("doc_id")
      .agg(sum(col("cnt") * element_at(wArr, col("bucket") + 1)).as("__m"))
    labels.join(margins, Seq("doc_id"), "left")
      .select(pow(col("y") - coalesce(col("__m"), lit(0.0)), 2).as("__e"))
      .agg(avg("__e")).head().getDouble(0)
  }
}
