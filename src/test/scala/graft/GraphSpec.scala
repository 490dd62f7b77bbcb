package graft

import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("path graph needs multiple propagation rounds and still converges") {
    // 1-2-3-4-5-6-7-8: diameter 7, min label must travel the whole path
    val cc = components((1L to 7L).map(i => (i, i + 1)))
    assert(cc === (1L to 8L).map(_ -> 1L).toMap)
  }

  test("separate components keep separate labels") {
    val cc = components(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(cc(10L) === 10L && cc(11L) === 10L && cc(12L) === 10L)
    assert(cc(20L) === 20L && cc(21L) === 20L)
    assert(cc(30L) === 30L && cc(31L) === 30L)
    assert(cc.size === 7)
  }

  test("hitting the round cap without convergence fails loudly") {
    // diameter 7 needs 7 propagation rounds + 1 detection round; cap at 3
    val edges = (1L to 7L).map(i => (i, i + 1))
    val ex = intercept[IllegalArgumentException] {
      Graph.connectedComponents(edges.toDF("src", "dst"), maxIters = 3).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("edge direction is irrelevant") {
    // min vertex on the destination side
    val cc = components(Seq((5L, 1L), (2L, 5L)))
    assert(cc === Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }
}
