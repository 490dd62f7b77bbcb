package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.{Retrieval, Similarity, StatTests, TextAnalysis, TimeSeries}

/** Degenerate-input conventions for the q409–q416 widening wave — the
  * corners the DuckDB oracle can't exercise at the test SFs: detectors that
  * never disagree, gap-riddled series, probes whose vocabulary swallows the
  * corpus, constant windows.
  */
class Round9WideningSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("mcnemar emits NULL chi2 when the detectors never disagree") {
    // constant series: neither detector ever fires -> n10 = n01 = 0
    val ev = (1L to 40L).map(i =>
      (i, ts(i * 60), i % 3, "a", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = StatTests.mcnemar(ev)
      .select("n10", "n01", "chi2").as[(Long, Long, Option[Double])].head()
    assert(r._1 === 0L && r._2 === 0L && r._3.isEmpty)
  }

  test("cochranQ emits NULL q_stat when no detector ever fires") {
    val ev = (1L to 40L).map(i =>
      (i, ts(i * 60), i % 3, "a", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = StatTests.cochranQ(ev)
      .select("g_sigma", "g_tukey", "g_tail", "q_stat")
      .as[(Long, Long, Long, Option[Double])].head()
    assert(r._1 === 0L && r._2 === 0L && r._3 === 0L && r._4.isEmpty)
  }

  test("permutationEntropy: monotone series is one pattern with H = 0") {
    // strictly increasing daily means, no gaps -> every triple codes 4+2+1
    val ev = (0L until 12L).map(i =>
      (i, ts(i * 86400 + 10), 1L, "a", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeSeries.permutationEntropy(ev)
      .select("n_windows", "n_patterns", "h", "h_norm")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 === 10L && r._2 === 1L && r._3 === 0.0 && r._4 === 0.0)
  }

  test("permutationEntropy skips gapped triples") {
    // days 0,1,2 then 10,11,12: exactly two gap-free triples
    val days = Seq(0L, 1L, 2L, 10L, 11L, 12L)
    val ev = days.zipWithIndex.map { case (d, i) =>
      (i.toLong, ts(d * 86400 + 10), 1L, "a", (i * i).toDouble, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeSeries.permutationEntropy(ev)
      .select("n_windows").as[Long].head()
    assert(r === 2L)
  }

  test("rm3Expansion never returns the probe's own terms") {
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "s0"),
      (10L, "alpha beta delta epsilon", "en", "s0"),
      (11L, "delta epsilon zeta", "en", "s0"),
      (12L, "beta gamma delta", "en", "s0"),
      (13L, "iota kappa lambda", "en", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Retrieval.rm3Expansion(docs, nProbes = 1, k = 2, kExp = 3)
    val own = Set("alpha", "beta", "gamma")
    assert(out.select("tok").as[String].collect().forall(t => !own(t)))
  }

  test("knBigram scores unseen contexts through the continuation backoff") {
    // doc_ids chosen so the md5 split puts some docs on each side is not
    // guaranteed for tiny sets; instead assert the operator contract on a
    // corpus where every eval bigram context is novel: backoff_rate = 1
    // would need a split we control, so assert the cheaper invariant —
    // output rows only for sources with eval bigrams, entropy positive.
    val docs = (0L until 60L).map(i =>
      (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7}", "en",
        s"s${i % 3}")).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.knBigram(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ce = r.getAs[Double]("cross_entropy")
      val br = r.getAs[Double]("backoff_rate")
      assert(ce > 0.0 && br >= 0.0 && br <= 1.0)
    }
  }

  test("jlDistortion mean ratio concentrates near 1 on random-ish vectors") {
    val emb = (0L until 300L).map { i =>
      val arr = Array.tabulate(64) { d =>
        (((i * 131 + d * 17) % 97).toFloat - 48f) / 48f
      }
      (i, arr, (i % 3).toInt)
    }.toDF("vec_id", "embedding", "label")
    val rows = Similarity.jlDistortion(emb)
      .select("dprime", "mean_ratio").as[(Int, Double)].collect().toMap
    assert(rows.keySet === Set(8, 16, 32))
    // E[ratio] = 1; with hundreds of pairs the mean should be within 20%
    rows.values.foreach(v => assert(math.abs(v - 1.0) < 0.2, s"mean $v"))
  }

  test("hampelCensus flags a lone spike and nothing else") {
    val vals = Seq.tabulate(21)(i => if (i == 10) 100.0 else 5.0)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i * 60), 1L, "a", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeSeries.hampelCensus(ev)
      .select("n", "n_flagged").as[(Long, Long)].head()
    assert(r._1 === 21L && r._2 === 1L)
  }

  test("hampelCensus MAD=0 convention: constant window flags any deviation") {
    val vals = Seq.fill(15)(5.0).updated(7, 5.001)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i * 60), 1L, "a", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeSeries.hampelCensus(ev)
      .select("n_flagged").as[Long].head()
    assert(r === 1L)
  }

  test("forecastEnsemble drops series shorter than holdout + 8 days") {
    val shortSeries = (0L until 10L).map(i =>
      (i, ts(i * 86400 + 10), 1L, "short", i.toDouble, "{}"))
    val longSeries = (0L until 30L).map(i =>
      (100 + i, ts(i * 86400 + 20), 1L, "long", (i % 7).toDouble, "{}"))
    val ev = (shortSeries ++ longSeries)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val types = TimeSeries.forecastEnsemble(ev)
      .select("event_type").as[String].collect().toSet
    assert(types === Set("long"))
  }

  test("ppmiCooc clamps negative PMI at zero and enforces minCount") {
    // "a b" co-occurs often (high marginals -> PMI <= 0 for the
    // ubiquitous pair), "x y" is rare but exclusive (PMI > 0)
    val docs = ((0L until 20L).map(i => (i, "a b a b a b", "en", "s0"))
      ++ (20L until 26L).map(i => (i, "x y", "en", "s0")))
      .toDF("doc_id", "text", "lang", "source")
    val rows = graft.ops.TextAnalysis.ppmiCooc(docs)
      .select("w1", "w2", "c12", "ppmi")
      .as[(String, String, Long, Double)].collect()
    assert(rows.forall(_._3 >= 5L))
    assert(rows.forall(_._4 >= 0.0))
    val xy = rows.find(r => r._1 == "x" && r._2 == "y")
    assert(xy.nonEmpty && xy.get._4 > 0.0)
  }

  test("funnelSteps: purchase before the click does not reach level 3") {
    val ev = Seq(
      // user 1: view -> click -> purchase inside the window: level 3
      (1L, ts(1000), 1L, "view", 0.0, "{}"),
      (2L, ts(1100), 1L, "click", 0.0, "{}"),
      (3L, ts(1200), 1L, "purchase", 0.0, "{}"),
      // user 2: purchase BEFORE the click: strict order stops at level 2
      (4L, ts(1000), 2L, "view", 0.0, "{}"),
      (5L, ts(1300), 2L, "click", 0.0, "{}"),
      (6L, ts(1100), 2L, "purchase", 0.0, "{}"),
      // user 3: click outside the window: level 1
      (7L, ts(1000), 3L, "view", 0.0, "{}"),
      (8L, ts(9000), 3L, "click", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.ops.Ranges.funnelSteps(ev)
      .select("n_views", "n_level2", "n_level3")
      .as[(Long, Long, Long)].head()
    assert(r === ((3L, 2L, 1L)))
  }

  test("zipFit: underdispersed counts yield NULL lambda/pi") {
    // every (user, day) cell has exactly one event -> variance < mean ->
    // lam = m + v/m - 1 <= 0 -> the MoM split is undefined
    val ev = (0L until 30L).map(i =>
      (i, ts((i % 10) * 86400 + 50), i / 10, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = graft.ops.Relational.zipFit(ev)
      .select("nnz", "lambda_hat", "pi_hat")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(r._1 === 30L && r._2.isEmpty && r._3.isEmpty)
  }

  test("archLm is NULL on a variance-free (linear) series") {
    // linear daily means: every return equals the slope, s is constant,
    // vx = vy = 0 -> r and arch_lm are NULL
    val ev = (0L until 20L).map(i =>
      (i, ts(i * 86400 + 100), 1L, "a", 2.0 * i, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeSeries.archLm(ev)
      .select("n_pairs", "r", "arch_lm")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(r._1 === 18L && r._2.isEmpty && r._3.isEmpty)
  }

  test("bbitMinhash: identical docs estimate 1.0 under both widths") {
    val txt = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((0L, txt, "en", "s0"), (1L, txt, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.ops.Dedup.bbitMinhash(docs)
      .select("est_full", "est_bbit", "jaccard")
      .as[(Double, Double, Double)].head()
    assert(r === ((1.0, 1.0, 1.0)))
  }

  test("twoHopCensus: triangle has no 2-hop reach, path does") {
    // triangle 1-2-3: every 2-hop candidate is already a direct
    // neighbour; path 10-11-12: endpoints reach each other at hop 2
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L)).toDF("u", "v")
    val rows = graft.ops.Graph.twoHopCensus(edges)
      .select("bucket", "n_nodes").as[(Long, Long)].collect().toMap
    // bucket 0 spans n2 in [0, 9]: 3 triangle nodes (n2=0), node 11
    // (n2=0) and endpoints 10/12 (n2=1) — all six vertices
    assert(rows === Map(0L -> 6L))
    val detail = graft.ops.Graph.twoHopCensus(edges)
      .select("max_n2").as[Long].head()
    assert(detail === 1L)
  }

  test("twoHopCensus suppresses over-cap mid vertices and reports them") {
    // star hub 0 with 70 leaves: hub degree 70 > cap 64, so no leaf
    // reaches another THROUGH the hub; the hub itself is suppressed only
    // as a midpoint (its own 2-hop reach through degree-1 leaves is 0)
    val edges = (1L to 70L).map(l => (0L, l)).toDF("u", "v")
    val out = graft.ops.Graph.twoHopCensus(edges)
    val supp = out.select("n_suppressed_mids").as[Long].head()
    assert(supp === 1L)
    val n2max = out.agg(max($"max_n2")).as[Long].head()
    assert(n2max === 0L)
  }

  test("itemKnnEval recommends the co-purchased item at rank 1") {
    import java.sql.Timestamp
    def d(day: Int) = new Timestamp(day * 86400000L)
    val orders = Seq(
      (1L, 11L, d(1)), (1L, 12L, d(2)),   // cust 1: history {10}, test {20}
      (2L, 21L, d(1)), (2L, 22L, d(2)),   // cust 2: history {10,20}
      (3L, 31L, d(1)), (3L, 32L, d(2))    // cust 3: history {10,20}
    ).toDF("o_custkey", "o_orderkey", "o_orderdate")
    val lineitem = Seq(
      (11L, 10L), (12L, 20L),
      (21L, 10L), (21L, 20L), (22L, 99L),
      (31L, 10L), (31L, 20L), (32L, 99L)
    ).toDF("l_orderkey", "l_partkey")
    val r = graft.ops.Recommend.itemKnnEval(orders, lineitem)
      .select("n_users", "n_hit5", "n_hit10", "mrr_10")
      .as[(Long, Long, Long, Double)].head()
    // custs 2/3 already own both items -> no candidates; cust 1's history
    // {10} votes for 20 (cij=2 in history baskets 21,31) -> hit at rank 1
    assert(r._1 === 3L && r._2 === 1L && r._3 === 1L)
    assert(math.abs(r._4 - 0.333333) < 1e-6)
  }

  test("phashPairs: byte-identical assets collide on all 4 bands at distance 0") {
    // payloads must clear the 72-byte dHash grid floor (round-10 real hash)
    val txt = "same exact payload bytes repeated across the full difference " +
      "hash grid width"
    assert(txt.length >= 72)
    val docs = Seq((0L, txt, "en", "s0"), (1L, txt, "en", "s0"),
      (2L, "completely different content here keeping well over the " +
        "seventy two character grid floor", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = graft.ops.Multimodal.phashPairs(docs)
      .select("n_shared_bands", "n_candidates", "n_within_radius",
        "min_hamming")
      .as[(Long, Long, Long, Int)].collect()
    assert(rows.toSeq === Seq((4L, 1L, 1L, 0)))
  }

  test("countMin never undercounts and is exact without collisions") {
    // 3 distinct tokens into 4x256 counters: collisions are possible only
    // if two of the three tokens share a bucket in EVERY depth row —
    // the no_undercount flag must hold regardless
    val docs = Seq((0L, "aa bb aa cc aa bb", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = graft.ops.Sketches.countMin(docs)
      .select("tok", "exact", "est", "no_undercount")
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.length === 3)
    assert(rows.forall(_._4))
    assert(rows.forall(r => r._3 >= r._2))
  }

  test("priceIndex: a uniform price doubling indexes to exactly 2") {
    import java.sql.Timestamp
    def d(y: Int) = Timestamp.valueOf(s"$y-06-01 00:00:00")
    // part 1: price 10 -> 20, quantity unchanged; part 2: 5 -> 10
    val li = Seq(
      (1L, 1L, 1L, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", d(1995)),
      (2L, 2L, 1L, 1, 4.0, 20.0, 0.0, 0.0, "N", "O", d(1995)),
      (3L, 1L, 1L, 1, 2.0, 40.0, 0.0, 0.0, "N", "O", d(1996)),
      (4L, 2L, 1L, 1, 4.0, 40.0, 0.0, 0.0, "N", "O", d(1996))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    val rows = graft.ops.Relational.priceIndex(li)
      .select("y", "laspeyres", "paasche", "fisher")
      .as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.head === ((1995, 1.0, 1.0, 1.0)))
    assert(rows(1) === ((1996, 2.0, 2.0, 2.0)))
  }

  test("kAnonymity: a singleton class reports k_min = 1 and bucket 1") {
    val cust = Seq(
      (1L, "a", 0L, 500.0, "SEG1"),   // band 0, SEG1: class of 3
      (2L, "b", 0L, 600.0, "SEG1"),
      (3L, "c", 0L, 700.0, "SEG1"),
      (4L, "d", 0L, 1500.0, "SEG1")   // band 1: singleton
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment")
    val rows = graft.ops.Curation.kAnonymity(cust)
      .select("bucket", "n_classes", "n_rows", "n_low_diversity", "k_min")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // all four customers share the nonneg debt flag -> every class is
    // low-diversity
    assert(rows.toSeq === Seq((1L, 1L, 1L, 1L, 1L), (2L, 1L, 3L, 1L, 1L)))
  }

  test("keyness: a focus-exclusive token ranks with overused = true") {
    val docs = ((0L until 10L).map(i =>
      (i, "zebra zebra common words here", "en", "src0"))
      ++ (10L until 30L).map(i =>
        (i, "common words here again and again", "en", "src1")))
      .toDF("doc_id", "text", "lang", "source")
    val top = graft.ops.TextAnalysis.keyness(docs)
      .select("tok", "overused").as[(String, Boolean)].collect()
    val z = top.find(_._1 == "zebra")
    assert(z.exists(_._2), s"zebra should be overused in src0: ${top.toSeq}")
    val ag = top.find(_._1 == "again")
    assert(ag.exists(!_._2), "again should be underused in src0")
  }

  test("simpsonsReversal: within-brand slope flips against the pooled one") {
    import java.sql.Timestamp
    def d = Timestamp.valueOf("1995-06-01 00:00:00")
    // two brands: within each, MORE discount -> LESS quantity (slope < 0);
    // but brand B discounts more AND sells more, so pooled slope > 0
    val li = (Seq(
      (1L, 1L, 1L, 1, 10.0, 1.0, 0.00, 0.0, "N", "O", d),
      (2L, 1L, 1L, 1, 8.0, 1.0, 0.02, 0.0, "N", "O", d),
      (3L, 1L, 1L, 1, 6.0, 1.0, 0.04, 0.0, "N", "O", d),
      (4L, 2L, 1L, 1, 30.0, 1.0, 0.06, 0.0, "N", "O", d),
      (5L, 2L, 1L, 1, 28.0, 1.0, 0.08, 0.0, "N", "O", d),
      (6L, 2L, 1L, 1, 26.0, 1.0, 0.10, 0.0, "N", "O", d)
    )).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
    // write tiny dims + lineitem to a temp dir and run the sfDir entry
    val dir = java.nio.file.Files.createTempDirectory("simpson").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "s1", 0L, 0.0)).toDF("s_suppkey", "s_name", "s_nationkey",
      "s_acctbal").write.parquet(s"$dir/supplier.parquet")
    Seq((0L, "NATION_X", 0L)).toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1L, "p1", "BRAND_A", "t", 1, 1.0),
      (2L, "p2", "BRAND_B", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice").write.parquet(s"$dir/part.parquet")
    val r = graft.ops.Relational.simpsonsReversal(spark, dir)
      .select("slope_pooled", "slope_within", "reversed")
      .as[(Double, Double, Boolean)].head()
    assert(r._1 > 0 && r._2 < 0 && r._3, s"expected reversal, got $r")
  }

  test("pcaDeflation: orthogonal two-cluster data splits the energy") {
    // PC1 = (e0+e2)/√2 at amplitude 4, PC2 = (e0−e2)/√2 at amplitude 1 —
    // both overlap the e0 power-iteration start, shares ~ 16:1
    val emb = (0L until 60L).map { i =>
      val arr = Array.fill(64)(0f)
      if (i % 2 == 0) { val s = if (i % 4 == 0) 4f else -4f
        arr(0) = s; arr(2) = s }
      else { val s = if (i % 4 == 1) 1f else -1f
        arr(0) = s; arr(2) = -s }
      (i, arr, 0)
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.pcaDeflation(emb)
      .select("dim", "loading1", "loading2", "ev1_share", "ev2_share")
      .as[(Int, Double, Double, Double, Double)].collect()
    val byDim = r.map(x => x._1 -> x).toMap
    // PC1 loads dims 1 and 3 equally with the SAME sign; PC2 with
    // opposite signs (max-normalized, so the peaks sit at ±1)
    // power iteration converges geometrically (λ2/λ1 = 1/16 per round),
    // so after 6 rounds the off-peak residue is ~1e-7, not exactly 0
    assert(math.abs(byDim(1)._2) === 1.0
      && math.abs(byDim(1)._2 - byDim(3)._2) < 1e-5,
      s"PC1 should load dims 1,3 equally: $r")
    assert(math.abs(byDim(1)._3) > 0.99999
      && math.abs(byDim(1)._3 + byDim(3)._3) < 1e-5,
      s"PC2 should load dims 1,3 with opposite signs")
    val (ev1, ev2) = (r.head._4, r.head._5)
    assert(ev1 > 0.9 && ev2 > 0.05 && ev2 < 0.1,
      s"energy split ev1=$ev1 ev2=$ev2")
  }

  test("pcaDeflation degenerate: axis-aligned residual yields a zero PC2") {
    // all energy exactly along e0: after deflation nothing overlaps the
    // e0 start vector, the guarded loop freezes at the zero vector
    val emb = (0L until 40L).map { i =>
      val arr = Array.fill(64)(0f)
      arr(0) = if (i % 2 == 0) 3f else -3f
      (i, arr, 0)
    }.toDF("vec_id", "embedding", "label")
    val r = Similarity.pcaDeflation(emb)
      .select("loading2", "ev2_share").as[(Double, Double)].collect()
    assert(r.forall(_._1 === 0.0))
    assert(r.head._2 === 0.0)
  }

  test("scalingLaw: nested subsets give non-increasing eval NLL trend") {
    val docs = (0L until 400L).map(i =>
      (i, s"tok${i % 50} tok${(i * 7) % 50} tok${(i * 13) % 50} common", "en",
        "s0")).toDF("doc_id", "text", "lang", "source")
    val rows = graft.ops.TextAnalysis.scalingLaw(docs)
      .select("frac", "n_train_tokens", "eval_nll", "loglog_slope")
      .as[(Double, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.length === 4)
    // nested: train token counts strictly increase with the fraction
    assert(rows.map(_._2).sliding(2).forall(p => p(0) < p(1)))
    // one slope constant across rows
    assert(rows.map(_._4).distinct.length === 1)
    // more data should not make the add-one unigram model WORSE by much:
    // the largest subset must beat the smallest
    assert(rows.last._3 < rows.head._3)
  }

  test("langIdPrf: a never-predicted class reports NULL precision and F1") {
    // no stopwords anywhere -> everything predicts 'other'; class 'en'
    // has tp+fp = 0 (undefined precision), recall 0, undefined F1
    val docs = Seq(
      (0L, "alpha beta gamma", "en", "s0"),
      (1L, "delta epsilon zeta", "xx", "s0")
    ).toDF("doc_id", "text", "lang", "source")
    val rows = graft.ops.TextAnalysis.langIdPrf(docs)
      .select("cls", "tp", "fp", "fn", "precision", "recall", "f1")
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[Double])].collect().map(r => r._1 -> r).toMap
    val en = rows("en")
    assert(en._2 === 0L && en._3 === 0L && en._4 === 1L)
    assert(en._5.isEmpty && en._6.contains(0.0) && en._7.isEmpty)
    val other = rows("other")
    assert(other._5.contains(0.5) && other._6.contains(1.0))
  }

  test("minhashKSweep: identical docs are exact at every prefix k") {
    val txt = "one two three four five six seven eight"
    val docs = Seq((0L, txt, "en", "s0"), (1L, txt, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    val rows = graft.ops.Dedup.minhashKSweep(docs)
      .select("k", "n_pairs", "mean_abs_err", "max_abs_err")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(4, 8, 12))
    assert(rows.forall(r => r._2 === 1L && r._3 === 0.0 && r._4 === 0.0))
  }

  test("recCoverage: single recommended item has Gini 0 and tiny coverage") {
    import java.sql.Timestamp
    def d(day: Int) = new Timestamp(day * 86400000L)
    // same fixture as the itemKnnEval test: only item 20 is ever
    // recommended (to cust 1) -> 1 item of a 3-part catalog, Gini 0
    val orders = Seq(
      (1L, 11L, d(1)), (1L, 12L, d(2)),
      (2L, 21L, d(1)), (2L, 22L, d(2)),
      (3L, 31L, d(1)), (3L, 32L, d(2))
    ).toDF("o_custkey", "o_orderkey", "o_orderdate")
    val lineitem = Seq(
      (11L, 10L), (12L, 20L),
      (21L, 10L), (21L, 20L), (22L, 99L),
      (31L, 10L), (31L, 20L), (32L, 99L)
    ).toDF("l_orderkey", "l_partkey")
    val r = graft.ops.Recommend.recCoverage(orders, lineitem)
      .select("n_users_with_recs", "n_items_recommended", "n_catalog",
        "coverage", "exposure_gini")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 === 1L && r._2 === 1L && r._3 === 3L)
    assert(math.abs(r._4 - 1.0 / 3.0) < 1e-6)
    assert(r._5 === 0.0)
  }

  test("forecastEnsemble: weights sum to 1 and favor the better model") {
    // pure period-7 series: seasonal-naive is in-sample perfect up to the
    // 1e-12 floor, so its weight dominates
    val ev = (0L until 35L).map(i =>
      (i, ts(i * 86400 + 20), 1L, "a", (i % 7).toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeSeries.forecastEnsemble(ev)
      .select("w_naive", "w_snaive", "w_mean", "oos_blend_mae")
      .as[(Double, Double, Double, Double)].head()
    assert(math.abs(r._1 + r._2 + r._3 - 1.0) < 1e-6)
    assert(r._2 > 0.99, s"w_snaive ${r._2}")
    assert(r._4 < 1e-6)
  }
}
