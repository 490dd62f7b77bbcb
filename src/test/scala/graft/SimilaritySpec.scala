package graft

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters on orthogonal axes; probe ids are < 10 by convention
  private def emb = Seq(
    (0L, Array(1f, 0f), 0),
    (1L, Array(0.99f, 0.01f), 0),
    (2L, Array(0.98f, 0.02f), 0),
    (10L, Array(0f, 1f), 1),
    (11L, Array(0.01f, 0.99f), 1),
    (12L, Array(0.02f, 0.98f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cosineTopK ranks same-cluster vectors first") {
    val rows = Similarity.cosineTopK(emb, nProbes = 1, k = 2)
      .select("probe_id", "rnk", "neighbor_id").as[(Long, Int, Long)].collect()
    assert(rows.toSeq === Seq((0L, 1, 1L), (0L, 2, 2L)))
  }

  test("ivfAnn with nprobe=1 searches only the nearest cluster") {
    val rows = Similarity.ivfAnn(emb, nProbes = 1, k = 5, nprobe = 1)
      .select("neighbor_id").as[Long].collect()
    // probe 0 is in cluster 0 → only vectors 1, 2 are candidates
    assert(rows.sorted.toSeq === Seq(1L, 2L))
  }

  test("ivfAnn agrees with brute force when every cluster is probed") {
    val bf = Similarity.cosineTopK(emb, nProbes = 1, k = 3).collect().toSeq
    val ivf = Similarity.ivfAnn(emb, nProbes = 1, k = 3, nprobe = 2).collect().toSeq
    assert(ivf === bf)
  }

  // 8-dim twin of the fixture for the subspace-split operators (m=4 wants
  // dim ≥ m): cluster 0 hugs e1, cluster 1 hugs e2 — orthogonal cells.
  private def emb8 = {
    def v(a: Float, b: Float) = Array(a, b, 0f, 0f, 0f, 0f, 0f, 0f)
    Seq(
      (0L, v(1f, 0f), 0), (1L, v(0.99f, 0.01f), 0), (2L, v(0.98f, 0.02f), 0),
      (10L, v(0f, 1f), 1), (11L, v(0.01f, 0.99f), 1), (12L, v(0.02f, 0.98f), 1)
    ).toDF("vec_id", "embedding", "label")
  }

  test("ivfPqRecall: probing every cell recovers the exact top-k through ADC") {
    val rows = Similarity.ivfPqRecall(emb8, m = 4, kCodes = 8, iters = 2,
        nProbes = 1, k = 2, nprobe = 2)
      .select("probe_id", "n_hits", "n_true", "recall")
      .as[(Long, Long, Long, Double)].collect()
    // orthogonal cells: quantization error ≪ cluster separation, so the
    // ADC-ranked set matches the exact set even with a coarse codebook
    assert(rows.toSeq === Seq((0L, 2L, 2L, 1.0)))
  }

  test("ivfPqRecall: nprobe=1 only reaches the probe's own cell") {
    val rows = Similarity.ivfPqRecall(emb8, m = 4, kCodes = 8, iters = 2,
        nProbes = 1, k = 4, nprobe = 1)
      .select("probe_id", "n_hits", "n_true", "recall")
      .as[(Long, Long, Long, Double)].collect()
    // true top-4 spans both cells (only 2 same-cell neighbors exist), but
    // the scan never leaves cell 0 → exactly the 2 same-cell hits survive
    assert(rows.toSeq === Seq((0L, 2L, 4L, 0.5)))
  }

  test("kcenterCoreset: farthest-point traversal alternates clusters, coverage tightens") {
    val rows = Similarity.kcenterCoreset(emb8, t = 3)
      .orderBy($"k")
      .select("k", "center_id", "radius", "cov_max")
      .as[(Int, Long, Option[Double], Double)].collect()
    // pick 0 = min id (cell 0); pick 1 = the orthogonal cluster (d² = 2);
    // pick 2 = the worst-covered remainder, tie on id → vec 2
    assert(rows.map(r => (r._1, r._2)).toSeq === Seq((0, 0L), (1, 10L), (2, 2L)))
    assert(rows(0)._3.isEmpty)
    assert(math.abs(rows(1)._3.get - 2.0) < 1e-9)
    assert(math.abs(rows(2)._3.get - 0.0008) < 1e-9)
    // after the cross-cluster pick every vector is ≤ .0008 from a center
    assert(rows(1)._4 <= 0.0008 + 1e-9)
    // coverage max is non-increasing in k
    assert(rows(0)._4 >= rows(1)._4 && rows(1)._4 >= rows(2)._4)
  }

  test("balancedPq: snake draft splits co-located hot dims the interleave stacks") {
    // variance lives ONLY in dims 0 and 4 — naive interleave (i % 4) puts
    // BOTH into subspace 0; the draft sends the top-2 to different subspaces
    val vecs = (0 until 6).map { v =>
      val a = Array.fill(8)(0f); a(0) = v.toFloat; a(4) = (v * 2).toFloat
      (v.toLong, a, 0)
    }.toDF("vec_id", "embedding", "label")
    val rows = Similarity.balancedPq(vecs, m = 4, kCodes = 4, iters = 1)
      .select("alloc", "subspace", "n_dims", "var_sum")
      .as[(String, Int, Long, Double)].collect()
    assert(rows.length === 8)
    assert(rows.forall(_._3 === 2L)) // 8 dims over 4 subspaces, 2 each
    val bal = rows.filter(_._1 == "balanced").map(_._4)
    val itl = rows.filter(_._1 == "interleave").map(_._4)
    assert(math.abs(bal.sum - itl.sum) < 5e-6) // same total (1e-6 rounding)
    assert(bal.max < itl.max)                  // draft spreads the hot dims
    assert(itl.count(_ > 1e-9) === 1 && bal.count(_ > 1e-9) === 2)
  }

  test("abtt: removing the dominant variance direction raises isotropy") {
    // dim 0 carries ±10 (variance 100, the "common direction" PC1 locks
    // onto); dims 1-7 carry small distinct signals
    val vecs = (0L until 12L).map { j =>
      val a = Array.fill(8)(0f)
      a(0) = if (j % 2 == 0) 10f else -10f
      a(1 + (j % 7).toInt) = 1f + (j % 3)
      (j, a, 0)
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.abtt(vecs, iters = 6, nProbes = 10, k = 3)
      .select("pr_before", "pr_after", "top_share_before", "top_share_after",
        "mean_overlap", "n_probes")
      .as[(Double, Double, Double, Double, Double, Long)].head()
    assert(r._2 > r._1, s"PR should rise: ${r._1} -> ${r._2}")
    assert(r._4 < r._3, s"top share should drop: ${r._3} -> ${r._4}")
    assert(r._3 > 0.9) // dim 0 dominates the raw energy almost entirely
    assert(r._5 >= 0.0 && r._5 <= 3.0)
    assert(r._6 === 10L)
  }

  test("srpLsh: identical vectors collide in every band; orthogonal pairs are cut") {
    import org.apache.spark.sql.functions._
    // 8-dim: two identical vectors (all bands collide, cosine 1) plus an
    // orthogonal one (any accidental band collision dies at the cosine floor)
    val e = Seq(
      (0L, Array(1f, 0.5f, -0.25f, 1f, 0f, 0.5f, -1f, 0.75f), 0),
      (1L, Array(1f, 0.5f, -0.25f, 1f, 0f, 0.5f, -1f, 0.75f), 0),
      (2L, Array(-0.5f, 1f, 1f, 0f, 1f, -0.5f, 0.25f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.srpLsh(e, dim = 8)
      .orderBy("vec_a", "vec_b")
      .select("vec_a", "vec_b", "n_shared_bands", "cosine")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows === Seq((0L, 1L, 4L, 1.0)))
  }

  test("srpAutoBits picks occupancy-bounded geometry across corpus decades") {
    import org.apache.spark.sql.functions.col
    // smallest b in [8,24] with 8·2^b ≥ n: the three rehearsal decades
    // (sf0.1 / sf1 / sf10 corpus sizes) plus both clamps
    def bitsFor(n: Long): Int =
      Similarity.srpAutoBits(spark.range(n).toDF("vec_id"))
        .select(col("bits")).as[Int].collect().head
    assert(bitsFor(2000L) === 8)     // sf0.1: the historical pinned geometry
    assert(bitsFor(20000L) === 12)   // sf1: 4096 buckets/band, occupancy ~5
    assert(bitsFor(200000L) === 15)  // sf10: occupancy ~6, still bounded
    assert(bitsFor(10L) === 8)       // floor clamp
    assert(bitsFor((8L << 24) + 1) === 24) // ceiling clamp (coalesce path)
  }

  test("srpLshAuto at a small corpus is bit-identical to the pinned default") {
    val auto = Similarity.srpLshAuto(emb, dim = 2)
      .orderBy("vec_a", "vec_b").collect().toSeq
    val pinned = Similarity.srpLsh(emb, dim = 2)
      .orderBy("vec_a", "vec_b").collect().toSeq
    assert(auto === pinned && auto.nonEmpty)
  }

  test("semanticPrune: near-dup cluster keeps its min id; singletons survive") {
    val e = Seq(
      (0L, Array(1f, 0.5f, -0.25f, 1f, 0f, 0.5f, -1f, 0.75f), 0),
      (1L, Array(1f, 0.5f, -0.25f, 1f, 0f, 0.5f, -1f, 0.75f), 0),
      (2L, Array(-0.5f, 1f, 1f, 0f, 1f, -0.5f, 0.25f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.semanticPrune(e, dim = 8)
      .orderBy("vec_id")
      .select("vec_id", "cluster_id", "cluster_size", "is_kept")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(rows === Seq((0L, 0L, 2L, true), (1L, 0L, 2L, false), (2L, 2L, 1L, true)))
  }

  test("embeddingStats: energy shares sum to 1 and a constant dim has zero variance") {
    val e = Seq(
      (0L, Array(1f, 2f), 0),
      (1L, Array(1f, 4f), 0)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.embeddingStats(e)
      .orderBy("dim")
      .select("dim", "n", "mean", "variance", "energy_share")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(rows.head === ((0L, 2L, 1.0, 0.0, math.rint(2.0 / 22.0 * 1e6) / 1e6)))
    assert(rows(1)._3 === 3.0) // mean of 2 and 4
    assert(rows(1)._4 === 1.0) // variance of {2, 4}
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-5)
  }

  test("clusterBalance: uniform labels score evenness 1, a hot label drops it") {
    val uniform = (0L until 8L).map(i => (i, Array(1f, 0f), (i % 4).toInt))
      .toDF("vec_id", "embedding", "label")
    val u = Similarity.clusterBalance(uniform)
      .select("label", "n", "share", "evenness")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(u.forall(_._2 == 2L) && u.forall(_._3 == 0.25) && u.forall(_._4 == 1.0))

    // 7-of-10 vectors on one label: entropy well below the uniform ln(2)
    val skewed = (0L until 10L).map(i => (i, Array(1f, 0f), if (i < 7) 0 else 1))
      .toDF("vec_id", "embedding", "label")
    val s = Similarity.clusterBalance(skewed)
      .orderBy("size_rank")
      .select("label", "n", "size_rank", "evenness")
      .as[(Int, Long, Int, Double)].collect().toSeq
    assert(s.map(r => (r._1, r._2, r._3)) === Seq((0, 7L, 1), (1, 3L, 2)))
    assert(s.head._4 < 0.9)
  }

  test("mmrTopK diversifies: second pick trades relevance for novelty") {
    // Vectors 1 and 2 are near-copies (sim ≈ 1) with relevance 0.9; vector
    // 3 has lower relevance 0.8 but points away from them (sim ≈ 0.46).
    // Plain top-2 returns {1, 2}; MMR picks 1, then 3 because 2's marginal
    // score 0.7·0.9 − 0.3·1 ≈ 0.33 loses to 3's 0.7·0.8 − 0.3·0.46 ≈ 0.42.
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(0.9f, 0.43589f, 0f), 0),
      (2L, Array(0.9f, 0.43589f, 0.001f), 0),
      (3L, Array(0.8f, -0.6f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val picks = Similarity.mmrTopK(vecs, probeId = 0, pool = 3, k = 2,
        lambda = 0.7, mu = 0.3)
      .orderBy("rnk").select("vec_id").as[Long].collect().toSeq
    assert(picks === Seq(1L, 3L))
  }

  test("mmrTopK first pick is the plain relevance argmax") {
    val vecs = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0.5f, 0.5f), 0)
    ).toDF("vec_id", "embedding", "label")
    val first = Similarity.mmrTopK(vecs, probeId = 0, pool = 2, k = 1,
        lambda = 0.7, mu = 0.3)
      .select("rnk", "vec_id").as[(Int, Long)].collect().toSeq
    assert(first === Seq((1, 1L)))
  }

  test("knnGraphCensus: k=1 edges on an asymmetric trio are not all mutual") {
    // cluster 0: a0 at 0°, a1 at 5°, a2 at 20°. Nearest neighbors:
    // 0→1, 1→0 (mutual pair), 2→1 (unreciprocated) → 2 of 3 edges mutual
    def v(deg: Double) = Array(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val vecs = Seq((0L, v(0), 0), (1L, v(5), 0), (2L, v(20), 0))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.knnGraphCensus(vecs, k = 1).collect().head
    assert(r.getAs[Long]("n_vecs") == 3)
    assert(r.getAs[Long]("n_edges") == 3)
    assert(r.getAs[Long]("n_mutual") == 2)
  }

  test("kmeansFixed recovers four well-separated clusters exactly") {
    // seeds are vec_ids 0-3, one per true cluster; two Lloyd rounds must
    // pull every satellite to its center
    val centers = Seq((0f, 0f), (10f, 0f), (0f, 10f), (10f, 10f))
    val vecs = centers.zipWithIndex.flatMap { case ((cx, cy), ci) =>
      Seq(
        (ci.toLong, Array(cx, cy), 0),
        (10L + ci * 2, Array(cx + 0.5f, cy), 0),
        (11L + ci * 2, Array(cx, cy + 0.5f), 0))
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.kmeansFixed(vecs, k = 4, iters = 2).collect()
      .map(r => r.getAs[Long]("cluster") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("wss")))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    out.values.foreach { case (n, wss) =>
      assert(n == 3)
      assert(wss < 1.0) // tight: satellites 0.5 away from the mean
    }
  }

  test("silhouette is near 1 for tight separated clusters, negative for a misfit") {
    val vecs = Seq(
      (0L, Array(0f, 0.1f), 0), (1L, Array(0.1f, 0f), 0),
      (2L, Array(10f, 10.1f), 1), (3L, Array(10.1f, 10f), 1),
      // labeled 0 but sitting inside cluster 1 -> negative s, misplaced
      (4L, Array(10f, 10f), 0)
    ).toDF("vec_id", "embedding", "label")
    val m = Similarity.silhouette(vecs).collect()
      .map(r => r.getAs[Int]("label") -> r).toMap
    assert(m(1).getAs[Double]("mean_silhouette") > 0.8)
    assert(m(0).getAs[Long]("n_misplaced") == 1)
  }

  test("graph-ANN beam search recovers a planted tight cluster's neighbors") {
    // two antipodal tight clusters, 64-d: every SRP sign bit agrees within
    // a cluster, so the LSH graph is near-complete inside each and the
    // beam walk from hub entries must recover the exact within-cluster
    // top-5 for probes 0..9 (all in cluster A)
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(scale: Float) =
      base.map(x => x + (rnd.nextGaussian() * scale).toFloat)
    val a = (0L until 20L).map(i => (i, jitter(0.02f), 0))
    val b = (20L until 40L).map(i =>
      (i, jitter(0.02f).map(x => -x), 1))
    val emb = (a ++ b).toDF("vec_id", "embedding", "label")
    val out = Similarity.graphAnnRecall(emb).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("recall")).toMap
    assert(out.keySet === (0L until 10L).toSet)
    val mean = out.values.sum / out.size
    assert(mean >= 0.6, s"mean recall $mean over $out")
    // sweep: one row per beam width, full probe coverage, and at the
    // planted geometry the widest beam must do at least as well
    val sw = Similarity.graphAnnBeamSweep(emb).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Double]("mean_recall")))
      .toMap
    assert(sw.keySet === Set(4, 8, 16))
    assert(sw.values.forall(_._1 == 10L))
    assert(sw(16)._2 >= sw(4)._2 - 1e-9)
  }
}
