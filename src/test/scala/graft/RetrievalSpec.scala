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

  test("wandPrune: weak single-common-term docs prune; top-k never does") {
    // probe 0 shares "alpha"+"beta" with the strong docs 1-2; docs 3-8
    // share only the ubiquitous "beta" (high df → tiny idf → tiny UB)
    val docs = (Seq(
      (0L, "alpha beta", "en", "s0", 0L),
      (1L, "alpha beta one", "en", "s0", 0L),
      (2L, "alpha beta two", "en", "s0", 0L)) ++
      (3L to 8L).map(j => (j, s"beta junk$j filler$j", "en", "s0", 0L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Retrieval.wandPrune(docs, nProbes = 1, k = 2)
      .select("probe_id", "n_candidates", "n_prunable", "prune_rate")
      .as[(Long, Long, Long, Double)].head()
    assert(r._2 === 8L) // docs 1-8 all share ≥1 term with the probe
    // SAFETY: the k survivors are never prunable (score ≤ UB-sum ⇒ any
    // top-k member has UB-sum ≥ θ by construction)
    assert(r._2 - r._3 >= 2L)
    // all six beta-only docs sit below θ on upper bound alone
    assert(r._3 === 6L)
    assert(math.abs(r._4 - 6.0 / 8) < 1e-6)
  }

  test("wandPrune safety invariant holds on the real corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rows = Retrieval.wandPrune(docs, nProbes = 5, k = 5)
      .select("n_candidates", "n_prunable")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 - r._2 >= 5L))
  }
}
