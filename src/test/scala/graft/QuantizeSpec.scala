package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantize

/** Unit coverage for product quantization (q168-q170). */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  // 8 vectors in 2 subspaces of 2 dims: two tight clusters per
  // subspace, and the two seeds (lowest ids 0 and 1) land in opposite
  // clusters, so the k=2 codebook is unambiguous
  private def toyEmb = Seq(
    (0L, Seq(0.0f, 0.0f, 10.0f, 10.0f)),
    (1L, Seq(5.0f, 5.0f, 0.0f, 0.0f)),
    (2L, Seq(0.1f, 0.0f, 10.1f, 10.0f)),
    (3L, Seq(5.1f, 5.0f, 0.1f, 0.0f)),
    (4L, Seq(0.0f, 0.1f, 10.0f, 10.1f)),
    (5L, Seq(5.0f, 5.1f, 0.0f, 0.1f)),
    (6L, Seq(0.1f, 0.1f, 10.1f, 10.1f)),
    (7L, Seq(5.1f, 5.1f, 0.1f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("codebook converges to the two cluster means per subspace") {
    val cb = Quantize.pqCodebook(toyEmb, "embedding", "vec_id",
      m = 2, k = 2, iters = 2, dim = 4)
    val got = rows(cb.select(col("subspace"), col("code"), col("cvec"))
      .orderBy("subspace", "code"))
    assert(got.size == 4) // 2 subspaces x 2 codes
    // subspace 0, code 0 seeded from vec 0 -> the near-zero cluster mean
    val c00 = got.head(2).asInstanceOf[scala.collection.Seq[Double]]
    assert(c00.forall(v => v >= 0.0 && v <= 0.1))
    // subspace 0, code 1 seeded from vec 1 -> the 5s cluster mean
    val c01 = got(1)(2).asInstanceOf[scala.collection.Seq[Double]]
    assert(c01.forall(v => v >= 5.0 && v <= 5.1))
  }

  test("encode assigns every vector and reconstruction error is small") {
    val cb = Quantize.pqCodebook(toyEmb, "embedding", "vec_id",
      m = 2, k = 2, iters = 2, dim = 4)
    val enc = Quantize.pqEncode(toyEmb, cb, "embedding", "vec_id",
      m = 2, dim = 4)
    val got = rows(enc.orderBy("vec_id"))
    assert(got.size == 8)
    got.foreach { r =>
      assert(r(1).asInstanceOf[scala.collection.Seq[Int]].size == 2)
      // tight clusters -> per-vector squared error stays tiny
      assert(r(2).asInstanceOf[Double] < 0.1)
    }
    // vectors 0 and 1 live in opposite clusters in BOTH subspaces
    val codes = got.map(r => r(0) -> r(1).asInstanceOf[scala.collection.Seq[Int]]).toMap
    assert(codes(0L) != codes(1L))
    assert(codes(0L)(0) != codes(1L)(0) && codes(0L)(1) != codes(1L)(1))
  }

  test("ADC top-k ranks same-cluster vectors first and excludes self") {
    val cb = Quantize.pqCodebook(toyEmb, "embedding", "vec_id",
      m = 2, k = 2, iters = 2, dim = 4)
    val qs = toyEmb.where(col("vec_id") === 0L)
    val out = rows(Quantize.pqAdcTopK(toyEmb, qs, cb, "embedding",
      "vec_id", "vec_id", m = 2, dim = 4, k = 3).orderBy("adc_dist",
      "vec_id"))
    assert(out.size == 3)
    assert(out.forall(_(0) == 0L))
    assert(!out.exists(_(1) == 0L)) // self excluded
    // the 0-cluster mates (2, 4, 6) outrank every 5-cluster vector
    assert(out.map(_(1)).toSet == Set(2L, 4L, 6L))
  }

  test("codebook is identical across repeated runs (determinism)") {
    val a = rows(Quantize.pqCodebook(toyEmb, "embedding", "vec_id",
      m = 2, k = 2, iters = 3, dim = 4).orderBy("subspace", "code"))
    val b = rows(Quantize.pqCodebook(toyEmb.repartition(7), "embedding",
      "vec_id", m = 2, k = 2, iters = 3, dim = 4)
      .orderBy("subspace", "code"))
    assert(a == b)
  }
}
