package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, Graph, Similarity, TextAnalysis, TimeSeries}

/** Known-answer tests for the round-4 robust-statistics and curation
  * additions: rolling moments, runs test, drawdown, run-length census,
  * rich club, template prefix, soft-dedup weights, quality-temperature
  * sampling, shortlist-rerank recall.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double], tpe: String = "a"): DataFrame =
    vals.zipWithIndex.map { case (v, i) => (tpe, (i + 1) * 60L, i.toLong, v) }
      .toDF("event_type", "e", "event_id", "value")
      .select(col("event_type"), to_timestamp(col("e")).as("ts"),
        col("event_id"), col("value"))

  test("rollingMoments: symmetric window has zero skew, uniform-ish kurtosis") {
    // window [1,2,3,4,5]: mean 3, m2 2, m3 0 (symmetric), m4 6.8
    val out = TimeSeries.rollingMoments(series(Seq(1, 2, 3, 4, 5)), win = 5)
      .select("skew", "kurt").as[(Double, Double)].collect().toSeq
    assert(out === Seq((0.0, -1.3)))
  }

  test("runsTest: perfect alternation maximizes runs, clumping minimizes") {
    val alt = series(Seq.tabulate(10)(i => if (i % 2 == 0) 1.0 else 2.0))
    val a = TimeSeries.runsTest(alt)
      .select("n_above", "n_below", "runs", "z_runs")
      .as[(Long, Long, Long, Double)].head()
    // median 1.5, n1 = n2 = 5, runs 10, mu 6, sigma sqrt(20/9)
    assert(a === ((5L, 5L, 10L, 2.683282)))
    val clump = series(Seq.fill(5)(1.0) ++ Seq.fill(5)(2.0))
    val c = TimeSeries.runsTest(clump)
      .select("runs", "z_runs").as[(Long, Double)].head()
    assert(c === ((2L, -2.683282)))
  }

  test("drawdown: demeaned cumulative path, exact decimal answer") {
    // values [1,2,3,4]: mean 2.5, cum path -1.5,-2,-1.5,0
    // running max -1.5 until the end -> max drawdown 0.5, range 2
    val r = TimeSeries.drawdown(series(Seq(1, 2, 3, 4)))
      .select("n_points", "max_drawdown", "excursion_range")
      .as[(Long, Double, Double)].head()
    assert(r === ((4L, 0.5, 2.0)))
  }

  test("runLengthCensus: above-median islands land in log2 buckets") {
    // median of [1,5,1,5,5,1] = 3; above-median pattern F,T,F,T,T,F
    val out = TimeSeries.runLengthCensus(series(Seq(1, 5, 1, 5, 5, 1)))
      .select("bucket", "n_runs", "max_len", "mean_len")
      .as[(Int, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((0, 1L, 1L, 1.0), (1, 1L, 2L, 2.0)))
  }

  test("richClub: a clique with a pendant is a perfect club; a star has none") {
    val clique = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("u", "v")
    val r = Graph.richClub(clique, Seq(1))
      .select("t", "n_club", "e_club", "phi")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(r === Seq((1, 4L, 6L, 1.0)))
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("u", "v")
    assert(Graph.richClub(star, Seq(1)).count() === 0L)
  }

  test("templatePrefix: shared 8-token opening groups docs, unique ones drop") {
    val pre = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, s"$pre tail one two", "en", "s0"),
      (1L, s"$pre other ending entirely", "en", "s1"),
      (2L, "a different opening line with eight tokens here plus more", "en", "s0"),
      (3L, "short doc", "en", "s0") // < 8 tokens, excluded
    ).toDF("doc_id", "text", "lang", "source")
    val fams = TextAnalysis.templatePrefix(docs)
      .select("n_docs", "n_sources", "first_doc")
      .as[(Long, Long, Long)].collect().toSeq
    assert(fams === Seq((2L, 2L, 0L)))
  }

  test("softDedupWeights: a 3-doc family splits weight across sources") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, t, "en", "s0"), (1L, t, "en", "s0"), (2L, t, "en", "s1"),
      (3L, "completely unrelated text body with its own distinct words", "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val w = Dedup.softDedupWeights(docs)
      .select("source", "n_docs", "n_dup_members", "effective_docs", "efficiency")
      .as[(String, Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(w === Seq(
      ("s0", 2L, 2L, 0.666667, 0.333333),
      ("s1", 2L, 1L, 1.333333, 0.666667)))
  }

  test("qualityTemperatureSample: deterministic, internally consistent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Curation.qualityTemperatureSample(docs)
      .select("source", "n_docs", "n_kept", "keep_rate")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (_, n, k, rate) =>
      assert(k >= 0 && k <= n)
      assert(rate === math.round(k.toDouble / n * 1e6) / 1e6)
    }
    val again = Curation.qualityTemperatureSample(docs)
      .select("source", "n_docs", "n_kept", "keep_rate")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out.toSet === again.toSet)
  }

  test("kendallTau matches a brute-force tau-b on seeded random days") {
    val rnd = new scala.util.Random(42)
    val days = 20
    val va = Array.fill(days)(math.round(rnd.nextDouble() * 1e4) / 1e4)
    val vb = Array.fill(days)(math.round(rnd.nextDouble() * 1e4) / 1e4)
    // one event per day per type at noon -> daily mean == the value itself
    val rows = (0 until days).flatMap { d =>
      val e = 86400L * d + 43200L
      Seq(("a", e, d.toLong * 2, va(d)), ("b", e, d.toLong * 2 + 1, vb(d)))
    }
    val ev = rows.toDF("event_type", "e", "event_id", "value")
      .select(col("event_type"), to_timestamp(col("e")).as("ts"),
        col("event_id"), col("value"))
    val got = TimeSeries.kendallTau(ev)
      .select("n0", "conc", "disc", "tau_b")
      .as[(Long, Long, Long, Double)].head()
    var conc = 0L; var disc = 0L
    for (i <- 0 until days; j <- i + 1 until days) {
      val s = (va(i) - va(j)) * (vb(i) - vb(j))
      if (s > 0) conc += 1 else if (s < 0) disc += 1
    }
    val n0 = days.toLong * (days - 1) / 2
    val tau = (conc - disc).toDouble / n0 // no ties in random doubles
    assert(got._1 === n0 && got._2 === conc && got._3 === disc)
    assert(math.abs(got._4 - tau) < 2e-6)
  }

  test("spearmanDaily equals Pearson-on-ranks computed by hand") {
    val rnd = new scala.util.Random(7)
    val days = 15
    val va = Array.fill(days)(math.round(rnd.nextDouble() * 1e4) / 1e4)
    val vb = Array.fill(days)(math.round(rnd.nextDouble() * 1e4) / 1e4)
    val rows = (0 until days).flatMap { d =>
      val e = 86400L * d + 43200L
      Seq(("a", e, d.toLong * 2, va(d)), ("b", e, d.toLong * 2 + 1, vb(d)))
    }
    val ev = rows.toDF("event_type", "e", "event_id", "value")
      .select(col("event_type"), to_timestamp(col("e")).as("ts"),
        col("event_id"), col("value"))
    val got = TimeSeries.spearmanDaily(ev).select("rho").as[Double].head()
    def ranks(v: Array[Double]): Array[Double] =
      v.map(x => 1.0 + v.count(_ < x) + (v.count(_ == x) - 1) / 2.0)
    val ra = ranks(va); val rb = ranks(vb)
    val n = days
    val sa = ra.sum; val sb = rb.sum
    val sab = ra.zip(rb).map { case (x, y) => x * y }.sum
    val saa = ra.map(x => x * x).sum; val sbb = rb.map(x => x * x).sum
    val rho = (sab - sa * sb / n) /
      math.sqrt((saa - sa * sa / n) * (sbb - sb * sb / n))
    assert(math.abs(got - rho) < 2e-6)
  }

  test("positionAttribution conserves credit: sum equals attributed purchases") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val out = graft.ops.Attribution.positionAttribution(ev)
      .select("n_purchases", "total_credit")
      .as[(Long, Double)].collect().toSeq
    val nPurch = {
      import org.apache.spark.sql.functions._
      val ep = unix_timestamp(col("ts"))
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), ep.as("pe"))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id"), ep.as("ce"))
      p.join(c, Seq("user_id"))
        .where(col("ce") <= col("pe") && col("pe") - col("ce") <= 86400L)
        .select("pid").distinct().count()
    }
    assert(math.abs(out.map(_._2).sum - nPurch) < 1e-4)
  }

  test("rerankRecall: a full-corpus shortlist recovers exact recall 1.0") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count().toInt
    val out = Similarity.rerankRecall(emb, nProbes = 5, k = 3, shortN = n)
      .select("recall").as[Double].collect().toSeq
    assert(out.size === 5 && out.forall(_ === 1.0))
  }

  test("iqrOutliers fences exactly the planted tails") {
    // 1..100 per series plus two extreme points; Q1=25.75, Q3=75.25 (R-7),
    // IQR=49.5 -> lo=-48.5, hi=149.5: only the planted 1000/-1000 escape
    val rows = ((1 to 100).map(_.toDouble) ++ Seq(1000.0, -1000.0))
      .zipWithIndex.map { case (v, i) =>
        (i.toLong, new java.sql.Timestamp(i * 1000L), 1L, "a", v) }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.ops.Ranges.iqrOutliers(df).collect().head
    assert(r.getAs[Long]("n") == 102)
    assert(r.getAs[Long]("n_low") == 1)
    assert(r.getAs[Long]("n_high") == 1)
  }
}
