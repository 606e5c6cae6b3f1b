package graft

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: sinks keep base rank, popular nodes accumulate") {
    // star: 1->3, 2->3 plus a self-contained hop 3->4; 4 is a sink
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // N=4, r0=0.25 each: sources keep (1-d)/N = 0.0375; node 3 gets
    // 0.0375 + 0.85*(0.25+0.25) = 0.4625; node 4 gets 0.0375+0.85*0.25
    assert(math.abs(r(1L) - 0.0375) < 1e-12)
    assert(math.abs(r(2L) - 0.0375) < 1e-12)
    assert(math.abs(r(3L) - 0.4625) < 1e-12)
    assert(math.abs(r(4L) - 0.25) < 1e-12)
  }

  test("pageRank: duplicate edges collapse, ranks sum stays bounded") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, iterations = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // symmetric 2-cycle: both nodes stay at 1/N = 0.5 every iteration
    assert(math.abs(r(1L) - 0.5) < 1e-12)
    assert(math.abs(r(2L) - 0.5) < 1e-12)
  }
}
