package graft

import graft.ops.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks fuller term overlap first and omits no-overlap docs") {
    val docs = Seq(
      (0L, "apple banana cherry", "en", "s0", 0L), // probe
      (1L, "apple banana cherry date", "en", "s0", 0L), // all three terms
      (2L, "apple zebra yak", "en", "s0", 0L), // one term
      (3L, "q r s", "en", "s0", 0L) // no overlap
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Retrieval.bm25TopK(docs, nProbes = 1, k = 3)
      .select("probe_id", "rnk", "doc_id")
      .as[(Long, Int, Long)].collect().toSeq.sortBy(_._2)
    assert(rows.map(_._3) === Seq(1L, 2L))
    assert(rows.forall(_._1 == 0L))
  }
}
