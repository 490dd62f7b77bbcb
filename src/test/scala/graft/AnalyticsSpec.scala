package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ranges, Relational, TextAnalysis, TimeSeries}

/** Known-answer and invariant tests for the round-3 analytics additions:
  * EWMA, changepoint, token entropy, source divergence, stickiness,
  * order backlog, ABC classes, supplier HHI, seasonal outliers.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def eventsDf(rows: Seq[(Long, Long, Long, Double)]) =
    rows.toDF("user_id", "event_id", "e", "value")
      .select(col("user_id"), col("event_id"),
        to_timestamp(col("e")).as("ts"), col("value"))

  test("ewma of a constant series is the constant; full windows only") {
    val ev = eventsDf((1L to 12L).map(i => (1L, i, i * 60L, 2.0)))
    val out = TimeSeries.ewma(ev).orderBy("event_id")
      .select("rn", "ewma").as[(Int, Double)].collect().toSeq
    // 12 rows, lags=8 -> rows 9..12 emit, all exactly the constant
    assert(out === Seq((9, 2.0), (10, 2.0), (11, 2.0), (12, 2.0)))
  }

  test("ewma weights recency: a single spike contributes w0/norm") {
    val ev = eventsDf(
      (1L to 9L).map(i => (1L, i, i * 60L, 0.0)) :+ (1L, 10L, 600L, 1.0))
    val out = TimeSeries.ewma(ev).orderBy("event_id")
      .select("rn", "ewma").as[(Int, Double)].collect().toSeq
    val expect = math.round(1.0 / 3.19882131 * 10000) / 10000.0
    assert(out === Seq((9, 0.0), (10, expect)))
  }

  test("changepoint finds a clean level shift at its true location") {
    val ev = eventsDf(
      (1L to 10L).map(i => (1L, i, i * 60L, 0.0)) ++
        (11L to 20L).map(i => (1L, i, i * 60L, 10.0)))
    val r = TimeSeries.changepoint(ev)
      .select("n", "split_rn", "mean_before", "mean_after", "shift")
      .as[(Long, Int, Double, Double, Double)].head()
    assert(r === ((20L, 10, 0.0, 10.0, 10.0)))
  }

  test("tokenEntropy: uniform two-token doc has H=ln2 and evenness 1") {
    val docs = Seq(
      (0L, "a a b b", "en", "s0"),
      (1L, "a a a a", "en", "s0"),
      (2L, "   ", "en", "s0") // whitespace-only doc is excluded
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.tokenEntropy(docs).orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_unique", "entropy", "evenness")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      (0L, 4L, 2L, 0.6931, 1.0),
      (1L, 4L, 1L, 0.0, 0.0)))
  }

  test("sourceDivergence: identical distributions diverge by zero") {
    val docs = Seq(
      (0L, "a b c", "en", "s0"),
      (1L, "a b c", "en", "s1"),
      (2L, "x y z a", "en", "s2") // mostly disjoint from s0/s1
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.sourceDivergence(docs)
      .select("src_a", "src_b", "jsd").as[(String, String, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    assert(out(("s0", "s1")) === 0.0)
    // one shared token out of 3 vs 4 -> 0.494 by hand, under the ln2 ceiling
    assert(out(("s0", "s2")) === 0.494)
  }

  test("stickiness: daily-active user vs one-day user") {
    // user 1 active every day of week 0; user 2 only on day 0
    val rows = (0L to 6L).map(d => (1L, d + 1, d * 86400L + 60L, 1.0)) :+
      (2L, 100L, 60L, 1.0)
    val r = Ranges.stickiness(eventsDf(rows))
      .select("wk", "n_user_days", "wau", "days_active", "avg_dau", "stickiness")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(r === ((0L, 8L, 2L, 7L, 1.1429, 0.5714)))
  }

  test("orderBacklog: every order opened is eventually closed") {
    val out = Relational.orderBacklog(spark, sf).orderBy("day_num")
      .select("open_after").as[Long].collect().toSeq
    assert(out.nonEmpty && out.forall(_ >= 0L) && out.last === 0L)
  }

  test("abcClassification covers all revenue in three Pareto bands") {
    val out = Relational.abcClassification(spark, sf)
      .select("cls", "rev_share").as[(String, Double)].collect().toSeq
    assert(out.map(_._1).toSet.subsetOf(Set("A", "B", "C")))
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-4)
  }

  test("supplierHhi stays within (0, 1] and dominates top share squared") {
    val rows = Relational.supplierHhi(spark, sf)
      .select("top_share", "hhi").as[(Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (top, hhi) =>
      assert(hhi > 0.0 && hhi <= 1.0 + 1e-9)
      assert(hhi >= top * top - 1e-4) // Σ share² ≥ max share²
    }
  }

  test("ivf recall is non-decreasing in nprobe and exact at full probe") {
    val emb = Tables.embeddings(spark, sf)
    val nlist = emb.select("label").distinct().count().toInt
    val recalls = Seq(1, 2, nlist).map { np =>
      ops.Similarity.annRecall(emb, nprobe = np)
        .agg(avg(col("recall"))).head().getDouble(0)
    }
    assert(recalls(0) <= recalls(1) + 1e-9)
    assert(recalls(1) <= recalls(2) + 1e-9)
    assert(recalls(2) === 1.0) // probing every partition IS brute force
  }

  test("mergedIncidents coalesces close ranges and keeps far ones apart") {
    // user 1: ranges [0,600] and [3000,3300] — 2400 s apart, exactly the
    // 2·pad merge horizon → one incident spanning [-1200, 4500].
    // user 2: ranges [0,600] and [10000,10500] — far apart, stay separate.
    // user 3: a lone error → no range at all (n_events >= 2 filter).
    val errAt = Seq(
      (1L, 0L), (1L, 600L), (1L, 3000L), (1L, 3300L),
      (2L, 0L), (2L, 600L), (2L, 10000L), (2L, 10500L),
      (3L, 0L))
    val ev = errAt.zipWithIndex.map { case ((u, e), i) => (u, i.toLong, e) }
      .toDF("user_id", "event_id", "e")
      .select(col("user_id"), col("event_id"),
        to_timestamp(col("e")).as("ts"), lit("error").as("event_type"),
        lit(1.0).as("value"))
    val out = ops.Ranges.mergedIncidents(ev)
      .select("user_id", "n_raw", "n_merged", "covered_sec", "longest_sec")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(out === Seq(
      (1L, 2L, 1L, 5700L, 5700L),
      (2L, 2L, 2L, 5900L, 3000L)))
  }

  test("linearTrend recovers an exact synthetic slope and flatlines constants") {
    val rows = (0 until 10).flatMap { k =>
      Seq(("lin", k * 86400L, 2.0 + 3.0 * k), ("const", k * 86400L, 5.0))
    }
    val ev = rows.toDF("event_type", "e", "value")
      .select(col("event_type"), to_timestamp(col("e")).as("ts"), col("value"))
    val got = TimeSeries.linearTrend(ev)
      .select("event_type", "n", "slope_day", "intercept", "r2")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("lin") === (("lin", 10L, 3.0, 2.0, 1.0)))
    assert(got("const") === (("const", 10L, 0.0, 5.0, 0.0)))
  }

  test("mannWhitney matches the hand-computed tie-corrected statistic") {
    // 4 weekday rows all value 1, 4 weekend rows all value 2: R_wd = 4·2.5
    // → U = 0; var with tie groups t=4,4 is 16/12·(9 − 120/56) = 9.142857,
    // so z = −8/√9.142857 = −2.645751…
    val rows =
      (1 to 4).map(i => (i.toLong, 0L, 1.0)) ++ // day 0 = Thursday
        (1 to 4).map(i => (i.toLong + 4, 2L * 86400, 2.0)) // day 2 = Saturday
    val ev = rows.toDF("event_id", "e", "value")
      .select(lit("s").as("event_type"), to_timestamp(col("e")).as("ts"),
        col("value"))
    val got = TimeSeries.mannWhitney(ev)
      .select("event_type", "n_wd", "n_we", "u", "z")
      .as[(String, Long, Long, Double, Double)].head()
    assert(got === (("s", 4L, 4L, 0.0, -2.6458)))
  }

  test("cusum flags a sustained post-train shift and clears a stable series") {
    val rows = (0 until 20).flatMap { d =>
      val base = if (d % 2 == 0) 9.0 else 11.0
      Seq(
        ("flat", d, base),
        ("shift", d, if (d >= 15) 20.0 else base)) // eval tail jumps +10
    }
    val ev = rows.zipWithIndex.map { case ((k, d, v), i) =>
      (k, i.toLong, d * 86400L, v)
    }.toDF("event_type", "event_id", "e", "value")
      .select(col("event_type"), to_timestamp(col("e")).as("ts"), col("value"))
    val got = TimeSeries.cusum(ev)
      .select("event_type", "peak_day", "peak", "drifted")
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("shift")._4 && got("shift")._3 > 5.0)
    assert(got("shift")._2 === 19L) // excursion keeps growing to the end
    assert(!got("flat")._4 && got("flat")._3 < 3.0)
  }

  test("streamed daily aggregates yield the same CUSUM verdict as batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val rows = (0 until 20).flatMap { d =>
      val base = if (d % 2 == 0) 9.0 else 11.0
      Seq(("flat", d * 86400L, base),
        ("shift", d * 86400L, if (d >= 15) 20.0 else base))
    }
    val mem = MemoryStream[(String, Long, Double)]
    val streamedDaily = mem.toDF().toDF("event_type", "e", "value")
      .withColumn("day", floor(col("e") / 86400L))
      .groupBy(col("event_type"), col("day"))
      .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
        / count(lit(1))).as("x"))
    val q = streamedDaily.writeStream
      .format("memory").queryName("cusum_daily").outputMode("complete").start()
    try {
      mem.addData(rows.take(25))
      q.processAllAvailable()
      mem.addData(rows.drop(25))
      q.processAllAvailable()
      // snapshot the live table: cusumFromDaily joins the daily frame with
      // its own aggregate, and the memory-sink VIEW can't be on both sides
      val live = TimeSeries.cusumFromDaily(
        spark.table("cusum_daily").localCheckpoint())
        .select("event_type", "peak_day", "peak", "drifted")
        .as[(String, Long, Double, Boolean)].collect().sortBy(_._1)
      val batch = TimeSeries.cusum(rows.toDF("event_type", "e", "value")
        .select(col("event_type"), to_timestamp(col("e")).as("ts"), col("value")))
        .select("event_type", "peak_day", "peak", "drifted")
        .as[(String, Long, Double, Boolean)].collect().sortBy(_._1)
      assert(live.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("dominantPeriod finds a planted weekly cycle") {
    val rows = (0 until 28).map { d =>
      (d.toLong, d * 86400L, if (d % 7 == 0) 10.0 else 0.0)
    }
    val ev = rows.toDF("event_id", "e", "value")
      .select(lit("s").as("event_type"), to_timestamp(col("e")).as("ts"),
        col("value"))
    val got = TimeSeries.dominantPeriod(ev)
      .select("event_type", "n_days", "best_lag", "r_best")
      .as[(String, Long, Int, Double)].head()
    assert(got._2 === 28L)
    assert(got._3 === 7)
    assert(got._4 > 0.7)
  }

  test("matryoshka recall is monotone in width and exact at full width") {
    val got = ops.Similarity.matryoshkaRecall(spark, sf)
      .orderBy("trunc_dim")
      .select("trunc_dim", "recall").as[(Int, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(8, 16, 32, 64))
    assert(got.sliding(2).forall { case Seq(a, b) => a._2 <= b._2 + 1e-9 })
    assert(got.last._2 === 1.0) // full width IS the ground truth
  }

  test("survivalCurve matches the hand-computed Kaplan-Meier estimate") {
    // A, D purchase at day 2; B at day 4; C never (censored at tmax=day 4).
    // S(2) = 1 - 2/4 = 0.5; S(4) = 0.5 * (1 - 1/2) = 0.25.
    val day = 86400L
    val rows = Seq(
      ("a", "signup", 0L), ("a", "purchase", 2 * day),
      ("b", "signup", 0L), ("b", "purchase", 4 * day),
      ("c", "signup", 0L),
      ("d", "signup", 0L), ("d", "purchase", 2 * day))
    val ev = rows.zipWithIndex.map { case ((u, t, e), i) => (u.hashCode.toLong, i.toLong, t, e) }
      .toDF("user_id", "event_id", "event_type", "e")
      .select(col("user_id"), col("event_id"), col("event_type"),
        to_timestamp(col("e")).as("ts"), lit(1.0).as("value"))
    val got = ops.Ranges.survivalCurve(ev)
      .select("t_day", "n_risk", "d_events", "c_censored", "surv")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((2L, 4L, 2L, 0L, 0.5), (4L, 2L, 1L, 1L, 0.25)))
  }

  test("sessionDurations buckets are log2 bins and shares sum to one") {
    val out = ops.Ranges.sessionDurations(spark, sf)
      .select("bucket", "n_sessions", "share")
      .as[(Int, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-4)
    assert(out.forall(_._1 >= 0))
  }

  test("seasonalOutliers emits a top-3 per series with sane z ordering") {
    val out = TimeSeries.seasonalOutliers(spark, sf)
      .select("event_type", "rn", "z").as[(String, Int, Double)].collect().toSeq
    val byType = out.groupBy(_._1)
    byType.values.foreach { rs =>
      assert(rs.map(_._2).sorted === Seq(1, 2, 3))
      val zs = rs.sortBy(_._2).map(t => math.abs(t._3))
      assert(zs === zs.sorted.reverse) // |z| non-increasing in rank
    }
  }

  // one event per (series, day): value IS the per-day mean
  private def typedEvents(rows: Seq[(String, Long, Double)]) =
    rows.zipWithIndex.map { case ((t, day, v), i) => (t, i.toLong, day, v) }
      .toDF("event_type", "event_id", "day", "value")
      .select(col("event_type"), col("event_id"),
        to_timestamp(col("day") * 86400 + 10).as("ts"), col("value"))

  test("theilSen shrugs off the outlier day that drags OLS") {
    // slope exactly 2, except day 9 explodes to 1000
    val ev = typedEvents((0L to 9L).map(d =>
      ("a", d, if (d == 9) 1000.0 else 2.0 * d)))
    val ts = TimeSeries.theilSen(ev)
      .select("n_days", "n_pairs", "ts_slope")
      .as[(Long, Long, Double)].head()
    assert(ts === ((10L, 45L, 2.0))) // 36 of 45 pairwise slopes are exactly 2
    val ols = TimeSeries.linearTrend(ev).select("slope_day").as[Double].head()
    assert(ols > 30.0) // the single outlier owns the OLS fit
  }

  test("theilSen matches the brute-force pairwise-slope median") {
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val ev = typedEvents(vals.zipWithIndex.map { case (v, d) => ("a", d.toLong, v) })
    val slopes = (for {
      i <- vals.indices; j <- vals.indices if i < j
    } yield (vals(j) - vals(i)) / (j - i)).sorted
    val n = slopes.length
    val expect = (slopes((n + 1) / 2 - 1) + slopes(n / 2)) / 2
    val got = TimeSeries.theilSen(ev).select("ts_slope").as[Double].head()
    assert(got === math.round(expect * 1000000) / 1000000.0)
  }

  test("leadLag recovers a planted 3-day lead at r = 1") {
    val base = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0, 6.0, 2.5,
      8.5, 1.5, 7.5, 3.5, 9.5, 0.5, 6.5, 4.5, 5.5, 2.2)
    val a = base.zipWithIndex.map { case (v, d) => ("a", d.toLong, v) }
    val b = base.zipWithIndex.map { case (v, d) => ("b", d.toLong + 3, v) }
    val got = TimeSeries.leadLag(typedEvents(a ++ b))
      .select("type_a", "type_b", "best_lag", "r_best")
      .as[(String, String, Int, Double)].head()
    assert(got === (("a", "b", 3, 1.0)))
  }

  test("benfordCensus: integer-space digits, zero-filled grid, exact shares") {
    val ev = typedEvents(Seq(("a", 0L, 1.0), ("a", 1L, 1.5), ("a", 2L, 2.0),
      ("a", 3L, 0.0))) // zero value excluded from the census
    val rows = ops.Diagnostics.benfordCensus(ev)
      .select("digit", "n", "obs_share")
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) === (1 to 9))
    assert(rows.map(_._2) === Seq(2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    assert(rows.head._3 === 0.666667)
    assert(rows(1)._3 === 0.333333)
  }

  test("bootstrapCi brackets the sample mean per series") {
    val rows = (0 until 300).map { i =>
      ("a", i.toLong, 10.0 + (i % 7) * 0.5)
    } ++ (0 until 300).map { i => ("b", (i + 1000).toLong, 50.0 + (i % 5)) }
    val out = ops.Diagnostics.bootstrapCi(typedEvents(rows))
      .select("event_type", "n_events", "mean", "ci_lo", "ci_hi")
      .as[(String, Long, Double, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) === Seq("a", "b"))
    out.foreach { case (_, n, mean, lo, hi) =>
      assert(n === 300L)
      assert(lo <= mean && mean <= hi)
      assert(hi - lo < 1.0) // ~σ/√n scale, nowhere near the value spread
    }
  }

  test("hurstRs separates trending from mean-reverting series") {
    // pure ramp: cumdev range grows ~S²/4 while σ ~ S/√12, so R/S ≈ 0.87·S
    // → slope of ln(R/S) vs ln S is exactly 1 (H = 1). Alternating ±1:
    // cumdev bounces between 1 and 0 in every window, σ = 1, so R/S = 1 at
    // every size → H = 0 exactly.
    val rows = (0 until 512).map(i => ("trend", i.toLong, i.toDouble)) ++
      (0 until 512).map(i => ("flip", i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val h = ops.TimeSeries.hurstRs(typedEvents(rows))
      .select("event_type", "hurst").as[(String, Double)].collect().toMap
    assert(math.abs(h("flip")) < 0.01)
    assert(h("trend") > 0.95 && h("trend") < 1.05)
  }

  test("peakCensus counts strict local maxima and their cadence") {
    // series a: values 1,5,1,1,7,1 at days 0..5 → peaks at day 1 (5) and
    // day 4 (7), gap = 3 days; plateaus (5,5) must NOT count as peaks.
    val rows = Seq(
      ("a", 0L, 1.0), ("a", 1L, 5.0), ("a", 2L, 1.0),
      ("a", 3L, 1.0), ("a", 4L, 7.0), ("a", 5L, 1.0),
      ("b", 0L, 2.0), ("b", 1L, 4.0), ("b", 2L, 4.0), ("b", 3L, 2.0))
    val byType = ops.TimeSeries.peakCensus(typedEvents(rows))
      .select("event_type", "n_peaks", "avg_gap_s", "max_peak")
      .as[(String, Long, Option[Double], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(byType("a") === ((2L, Some(3.0 * 86400), 7.0)))
    // b's plateau (4,4) is not a strict max → zero peaks, no row at all
    assert(!byType.contains("b"))
  }

  test("holtLinear tracks a pure linear trend exactly") {
    // x_t = 10 + 3t: level lands on the line, trend = 3, zero MAE,
    // forecast extrapolates the line 7 steps ahead
    val ev = typedEvents((0L to 9L).map(d => ("a", d, 10.0 + 3.0 * d)))
    val r = ops.TimeSeries.holtLinear(ev).collect().head
    assert(r.getAs[Long]("n_days") == 10)
    assert(math.abs(r.getAs[Double]("level") - 37.0) < 1e-6) // 10 + 3·9
    assert(math.abs(r.getAs[Double]("trend") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("forecast_7d") - 58.0) < 1e-6)
    assert(r.getAs[Double]("mae") == 0.0)
  }

  test("thetaForecast: constant series is a fixed point; linear trend damps") {
    // constant 5: trend 0, theta line ≡ 5, SES stays 5, zero MAE
    val flat = ops.TimeSeries.thetaForecast(
      typedEvents((0L to 9L).map(d => ("a", d, 5.0)))).collect().head
    assert(flat.getAs[Long]("n_days") == 10)
    assert(flat.getAs[Double]("slope") == 0.0)
    assert(flat.getAs[Double]("ses_level") == 5.0)
    assert(flat.getAs[Double]("forecast_7d") == 5.0)
    assert(flat.getAs[Double]("mae") == 0.0)

    // x_t = t (rank units): exact fit → z ≡ series, SES lags the ramp, so
    // the theta combination forecasts BELOW the pure trend (the known
    // theta damping vs q127/q251's straight extrapolation)
    val ramp = ops.TimeSeries.thetaForecast(
      typedEvents((0L to 9L).map(d => ("a", d, d.toDouble)))).collect().head
    assert(math.abs(ramp.getAs[Double]("slope") - 1.0) < 1e-9)
    val l = ramp.getAs[Double]("ses_level")
    val f = ramp.getAs[Double]("forecast_7d")
    assert(l < 9.0)            // SES lags the last point of the ramp
    assert(f < 16.0 && f > l)  // damped below trend(T+7), above the level
  }

  test("holtLinear level settles between the two means of a step series") {
    // constant 10 for 10 days then constant 50: the smoothed level must
    // land strictly between, approaching 50
    val ev = typedEvents((0L to 19L).map(d =>
      ("a", d, if (d < 10) 10.0 else 50.0)))
    val r = ops.TimeSeries.holtLinear(ev).collect().head
    val lvl = r.getAs[Double]("level")
    assert(lvl > 40.0 && lvl <= 52.0)
    assert(r.getAs[Double]("mae") > 0.0)
  }

  test("savitzkyGolay passes a quadratic through unchanged") {
    // SG(5, quadratic) exactly reproduces any degree-≤2 polynomial at the
    // window center: residuals are 0 for all interior points
    val ev = typedEvents((0L to 8L).map(d => ("a", d, 2.0 + d + 0.5 * d * d)))
    val out = ops.TimeSeries.savitzkyGolay(ev).collect()
    assert(out.length == 5) // 9 points minus 2 on each edge
    out.foreach(r => assert(math.abs(r.getAs[Double]("resid")) < 1e-6))
  }

  test("binsegTwoLevel finds both steps of a double staircase") {
    // 30 days: 10 at level 0, 10 at level 10, 10 at level 30 -> root split
    // isolates the biggest mean gap; a sub-split finds the other step
    val ev = typedEvents((0L to 29L).map { d =>
      val v = if (d < 10) 0.0 else if (d < 20) 10.0 else 30.0
      ("a", d, v)
    })
    val out = ops.TimeSeries.binsegTwoLevel(ev).collect()
      .map(r => r.getAs[String]("level") -> r).toMap
    assert(out.contains("root") && (out.contains("left") || out.contains("right")))
    val splits = out.values.map(_.getAs[Long]("split_day")).toSet
    // the two true boundaries are at days 9->10 and 19->20: the chosen
    // split days must be at (or next to) those steps
    assert(splits.exists(d => d >= 8 && d <= 11))
    assert(splits.exists(d => d >= 18 && d <= 21))
  }

  test("lifecycleStates balances the weekly growth ledger") {
    // user 1: weeks 0,1,2 (retained twice). user 2: weeks 0,2 (gap ->
    // churned into wk1, resurrected wk2). user 3: week 0 only (churned wk1)
    val rows = Seq((1L, 0), (1L, 1), (1L, 2), (2L, 0), (2L, 2), (3L, 0))
      .zipWithIndex.map { case ((u, wk), i) =>
        (i.toLong, new java.sql.Timestamp(wk * 7L * 86400000L + 1000L),
          u, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = ops.Ranges.lifecycleStates(rows).collect()
      .map(r => r.getAs[Long]("wk") -> r).toMap
    assert(out(0).getAs[Long]("n_new") == 3)
    assert(out(1).getAs[Long]("n_retained") == 1)
    assert(out(1).getAs[Long]("n_churned") == 2) // users 2 and 3
    assert(out(2).getAs[Long]("n_resurrected") == 1) // user 2 returns
    // ledger: actives(w) = new + retained + resurrected
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("n_new")
        + r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
    }
  }

  test("holtWinters locks onto a pure weekly sawtooth exactly") {
    // x_t = 50 + s(t mod 7), zero trend: the recursion is a fixpoint -> 
    // level 50, trend 0, MAE 0, forecast = next weekday's value
    val season = Seq(0.0, 7.0, -3.0, 2.0, -6.0, 4.0, -4.0)
    val ev = typedEvents((0L until 28L).map(d =>
      ("a", d, 50.0 + season((d % 7).toInt))))
    val r = ops.TimeSeries.holtWinters(ev).collect().head
    assert(r.getAs[Long]("n_days") == 28)
    assert(math.abs(r.getAs[Double]("level") - 50.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("trend")) < 1e-6)
    assert(r.getAs[Double]("mae") == 0.0)
    // day 29 (0-based 28) is weekday 0 -> forecast 50 + 0
    assert(math.abs(r.getAs[Double]("forecast_1") - 50.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("s_amplitude") - 13.0) < 1e-6)
  }

  test("retentionHalflife recovers a clean geometric decay") {
    // one cohort of 8 users in week 0; active users halve each week:
    // rate(o) = 2^-o exactly -> slope = -ln 2, half-life = 1 week
    val rows = (0 until 8).flatMap { u =>
      val lastWeek = Seq(3, 2, 1, 1, 0, 0, 0, 0)(u) // 8,4,2,1 actives
      (0 to lastWeek).map(w => (u.toLong, w))
    }.zipWithIndex.map { case ((u, w), i) =>
      (i.toLong, new java.sql.Timestamp(w * 604800000L + 1000L), u,
        "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = ops.Ranges.retentionHalflife(rows).collect()
    assert(out.nonEmpty)
    val r = out.head
    assert(math.abs(r.getAs[Double]("slope") + math.log(2.0)) < 1e-6)
    assert(math.abs(r.getAs[Double]("half_life_weeks") - 1.0) < 1e-4)
    val rates = out.map(x =>
      x.getAs[Long]("week_offset") -> x.getAs[Double]("rate")).toMap
    assert(rates(1L) == 0.5 && rates(2L) == 0.25 && rates(3L) == 0.125)
  }

  test("sessionConversion attributes purchases to the entry action") {
    // user 1: session [view, purchase] -> entry view, converted;
    // then a >4h gap; session [click] -> entry click, not converted
    val rows = Seq(
      (1L, 0L, "view"), (2L, 60L, "purchase"), (3L, 20000L, "click"),
      // user 2: lone purchase session -> entry purchase, converted
      (4L, 100L, "purchase"))
      .map { case (e, sec, t) =>
        (e, new java.sql.Timestamp(sec * 1000L), if (e == 4L) 2L else 1L,
          t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = ops.Ranges.sessionConversion(rows).collect()
      .map(r => r.getAs[String]("entry_type") -> r).toMap
    assert(m("view").getAs[Long]("n_sessions") == 1)
    assert(m("view").getAs[Long]("n_converted") == 1)
    assert(m("click").getAs[Long]("n_converted") == 0)
    assert(m("purchase").getAs[Double]("conversion_rate") == 1.0)
  }

  test("detectorAgreement: perfect agreement on a planted outlier") {
    // spread base 1..50 (healthy IQR) plus one extreme point: both the
    // 3-sigma rule and the Tukey fence flag exactly the planted point
    val vals = (1 to 50).map(_.toDouble) ++ Seq(1000.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(i * 1000L), 1L, "a", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = ops.Ranges.detectorAgreement(rows).collect().head
    assert(r.getAs[Long]("n_a") == 1 && r.getAs[Long]("n_b") == 1)
    assert(r.getAs[Long]("n_both") == 1)
    assert(r.getAs[Double]("jaccard") == 1.0)
    assert(r.getAs[Double]("kappa") == 1.0)
  }

  test("profileNeighbors pairs the series with matching daily shapes") {
    // a and b are morning series (hour 1), c is an evening series (hour 20):
    // a's nearest is b (identical share vector), not c
    val mk = (t: String, hrs: Seq[Int]) => hrs.map(h => (t, h))
    val rows = (mk("a", Seq(1, 1, 1, 2)) ++ mk("b", Seq(1, 1, 1, 2))
      ++ mk("c", Seq(20, 20, 21, 22))).zipWithIndex.map {
      case ((t, h), i) =>
        (i.toLong, new java.sql.Timestamp((h * 3600L + i) * 1000L), 1L, t, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val m = ops.TimeSeries.profileNeighbors(rows).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[String]("nearest_type"), r.getAs[Double]("l2_dist")))).toMap
    assert(m("a")._1 == "b" && m("a")._2 == 0.0)
    assert(m("b")._1 == "a")
  }
}
