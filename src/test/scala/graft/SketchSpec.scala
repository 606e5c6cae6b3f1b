package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketch

/** Unit coverage for the count-min sketch (q171). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("cms estimates are never below exact counts") {
    val toks = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++
      Seq.fill(3)("gamma") ++ Seq("delta")).toDF("tok")
    val cms = Sketch.cmsBuild(toks, "tok", d = 4)
    val cands = toks.distinct()
    val est = rows(Sketch.cmsEstimate(cms, cands, "tok", d = 4))
      .map(r => r(0) -> r(1).asInstanceOf[Long]).toMap
    val exact = Map("alpha" -> 50L, "beta" -> 20L, "gamma" -> 3L,
      "delta" -> 1L)
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"$t: cms ${est(t)} < exact $n")
    }
    // 4 tokens in 4x256 cells: collisions are overwhelmingly unlikely,
    // so the estimates are exact here
    assert(est == exact)
  }

  test("cms cell count is bounded by d x width regardless of vocabulary") {
    val toks = (1 to 5000).map(i => s"tok$i").toDF("tok")
    val cells = Sketch.cmsBuild(toks, "tok", d = 2)
    assert(cells.count() <= 2L * Sketch.CmsWidth)
    // total mass per sketch row equals the token-occurrence count
    val mass = rows(cells.groupBy("sketch_row")
      .agg(sum("cnt").as("m")).select("m"))
    assert(mass.forall(_.head == 5000L))
  }

  test("unseen candidate tokens estimate to zero (or collision mass)") {
    val toks = Seq("only").toDF("tok")
    val cms = Sketch.cmsBuild(toks, "tok", d = 4)
    val est = rows(Sketch.cmsEstimate(cms,
      Seq("never-seen-xyz").toDF("tok"), "tok", d = 4))
    assert(est.head(1).asInstanceOf[Long] <= 1L)
  }
}
