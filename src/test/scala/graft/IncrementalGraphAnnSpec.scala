package graft

import java.nio.file.Files

import graft.ops.GraphIndex

/** Graph-ANN twin of IncrementalAnnSpec: the append-only edge log plus a
  * read-time degree window must reproduce the from-scratch base graph
  * (q440's adjacency) bit-for-bit after an append.
  */
class IncrementalGraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private val base = Array(1f, 0.5f, -0.25f, 1f, 0f, 0.5f, -1f, 0.75f)
  private val ortho = Array(-0.5f, 1f, 1f, 0f, 1f, -0.5f, 0.25f, 0f)
  private def mix(a: Float): Array[Float] =
    base.zip(ortho).map { case (x, y) => x + a * y }

  private def oldVecs = Seq(
    (0L, base, 0),
    (1L, mix(0.05f), 0),
    (2L, mix(0.1f), 0),
    (3L, ortho, 1)
  ).toDF("vec_id", "embedding", "label")

  private def newVecs = Seq(
    (10L, mix(0.02f), 0), // near the base cluster
    (11L, ortho.map(x => -x), 1) // antipodal — matches nothing
  ).toDF("vec_id", "embedding", "label")

  private def adjSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("v", "o", "cos").as[(Long, Long, Double)].collect().toSet

  test("edge log + append reproduces the from-scratch degree-bounded graph") {
    val path = Files.createTempDirectory("graft-graphidx").resolve("idx").toString
    GraphIndex.build(oldVecs, path, dim = 8)

    val newEdges = GraphIndex.appendVecs(spark, path, newVecs, dim = 8)
    // every appended edge has a new endpoint
    assert(newEdges.select("vec_a", "vec_b").as[(Long, Long)].collect()
      .forall { case (a, b) => a >= 10L || b >= 10L })

    val incr = adjSet(GraphIndex.readAdjacency(spark, path, degree = 2))
    val batch = adjSet(
      GraphIndex.batchAdjacency(oldVecs.union(newVecs), degree = 2, dim = 8))
    assert(incr === batch)
    assert(incr.nonEmpty)

    // a second append stays consistent (new-new pair vs batch-1 vector)
    val more = Seq((20L, mix(0.03f), 0)).toDF("vec_id", "embedding", "label")
    GraphIndex.appendVecs(spark, path, more, dim = 8)
    val incr2 = adjSet(GraphIndex.readAdjacency(spark, path, degree = 2))
    val batch2 = adjSet(GraphIndex.batchAdjacency(
      oldVecs.union(newVecs).union(more), degree = 2, dim = 8))
    assert(incr2 === batch2)
  }
}
