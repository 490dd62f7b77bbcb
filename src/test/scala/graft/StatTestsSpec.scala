package graft

import org.apache.spark.sql.functions._
import graft.ops.StatTests
import java.sql.Timestamp

/** Known-answer checks for the classical-test suite (q206-q211): each
  * statistic is recomputed by brute force on tiny hand-built frames, so a
  * formula slip (wrong dof, missing correction term) fails loudly rather
  * than silently matching a wrong oracle.
  */
class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, sec: Int = 0): Timestamp =
    new Timestamp((day.toLong * 86400 + sec) * 1000)

  private def events(rows: Seq[(Long, Int, Long, String, Double)]) =
    rows.toDF("event_id", "day", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(day * 86400)"))
      .drop("day")

  test("jarqueBera matches brute-force moments on a skewed sample") {
    val xs = Seq(1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 10.0)
    val df = events(xs.zipWithIndex.map { case (v, i) =>
      (i.toLong, i % 3, 1L, "a", v)
    })
    val row = StatTests.jarqueBera(df).collect().head
    val n = xs.size.toDouble
    val mean = xs.sum / n
    val m2 = xs.map(v => (v - mean) * (v - mean)).sum / n
    val m3 = xs.map(v => math.pow(v - mean, 3)).sum / n
    val m4 = xs.map(v => math.pow(v - mean, 4)).sum / n
    val skew = m3 / (m2 * math.sqrt(m2))
    val exk = m4 / (m2 * m2) - 3.0
    assert(math.abs(row.getAs[Double]("skewness") - skew) < 1e-5)
    assert(math.abs(row.getAs[Double]("ex_kurtosis") - exk) < 1e-5)
    val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    assert(math.abs(row.getAs[Double]("jb_stat") - jb) < 1e-4)
  }

  test("chiSquare recovers independence on a uniform table and dof") {
    val rows = for {
      p <- Seq("1-URGENT", "2-HIGH", "3-MEDIUM")
      s <- Seq("F", "O")
      _ <- 1 to 10
    } yield (1L, 1L, s, 1.0, ts(1), p)
    val orders = rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val out = StatTests.chiSquare(orders).collect()
    assert(out.length == 6)
    assert(out.forall(_.getAs[Double]("chi2") == 0.0))
    assert(out.forall(_.getAs[Int]("dof") == 2))
    assert(out.forall(_.getAs[Long]("obs") == 10L))
  }

  test("anovaF matches the textbook two-group F statistic") {
    // two groups: {1,2,3} and {7,8,9} — SSB=54, SSW=4, F=(54/1)/(4/4)=54
    val df = events(Seq(
      (1L, 0, 1L, "a", 1.0), (2L, 0, 1L, "a", 2.0), (3L, 0, 1L, "a", 3.0),
      (4L, 0, 1L, "b", 7.0), (5L, 0, 1L, "b", 8.0), (6L, 0, 1L, "b", 9.0)))
    val row = StatTests.anovaF(df).collect().head
    assert(row.getAs[Long]("k") == 2)
    assert(row.getAs[Long]("n") == 6)
    assert(math.abs(row.getAs[Double]("ss_between") - 54.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("ss_within") - 4.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("f_stat") - 54.0) < 1e-4)
    assert(math.abs(row.getAs[Double]("eta_sq") - 54.0 / 58.0) < 1e-6)
  }

  test("bartlett is ~zero for equal variances, positive when they differ") {
    val eq = events(Seq(
      (1L, 0, 1L, "a", 1.0), (2L, 0, 1L, "a", 2.0), (3L, 0, 1L, "a", 3.0),
      (4L, 0, 1L, "b", 11.0), (5L, 0, 1L, "b", 12.0), (6L, 0, 1L, "b", 13.0)))
    val b0 = StatTests.bartlett(eq).collect().head.getAs[Double]("bartlett_stat")
    assert(math.abs(b0) < 1e-9)
    val ne = events(Seq(
      (1L, 0, 1L, "a", 1.0), (2L, 0, 1L, "a", 1.1), (3L, 0, 1L, "a", 0.9),
      (4L, 0, 1L, "b", 0.0), (5L, 0, 1L, "b", 50.0), (6L, 0, 1L, "b", 100.0)))
    val b1 = StatTests.bartlett(ne).collect().head.getAs[Double]("bartlett_stat")
    assert(b1 > 5.0)
  }

  test("cohensD recovers a hand-computed pooled effect size") {
    // day 3 (epoch day 3 -> (3+4)%7=0 -> weekend), day 4 -> weekday
    val df = events(Seq(
      (1L, 4, 1L, "a", 1.0), (2L, 4, 1L, "a", 2.0), (3L, 4, 1L, "a", 3.0),
      (4L, 3, 1L, "a", 5.0), (5L, 3, 1L, "a", 6.0), (6L, 3, 1L, "a", 7.0)))
    val row = StatTests.cohensD(df).collect().head
    assert(row.getAs[Long]("n_wd") == 3 && row.getAs[Long]("n_we") == 3)
    // pooled sd = sqrt((2+2)/4)=1; d = (2-6)/1 = -4
    assert(math.abs(row.getAs[Double]("pooled_sd") - 1.0) < 1e-6)
    assert(math.abs(row.getAs[Double]("cohens_d") + 4.0) < 1e-6)
  }

  test("seasonalMannKendall detects a monotone trend with z > 0") {
    // strictly increasing daily series over 28 days: every within-season
    // pair concordant -> S = sum over 7 seasons of C(4,2) = 42
    val rows = (0 until 28).map { d =>
      (d.toLong, d, 1L, "a", d.toDouble)
    }
    val row = StatTests.seasonalMannKendall(events(rows)).collect().head
    assert(row.getAs[Long]("n_days") == 28)
    assert(row.getAs[Long]("s_stat") == 42)
    // var = 7 * n_g(n_g-1)(2n_g+5)/18 with n_g=4 -> 7*4*3*13/18
    val v = 7.0 * 4 * 3 * 13 / 18.0
    assert(math.abs(row.getAs[Double]("var_s") - v) < 1e-6)
    assert(math.abs(row.getAs[Double]("z_score")
      - (42 - 1) / math.sqrt(v)) < 1e-5)
  }

  test("seasonalMannKendall is S=0 on a pure weekly cycle") {
    // value depends only on weekday -> all within-season pairs tie
    val rows = (0 until 28).map { d =>
      (d.toLong, d, 1L, "a", (d % 7).toDouble)
    }
    val row = StatTests.seasonalMannKendall(events(rows)).collect().head
    assert(row.getAs[Long]("s_stat") == 0)
  }

  test("grubbs pinpoints the single planted outlier") {
    val rows = (Seq.fill(20)(10.0) :+ 100.0).zipWithIndex.map {
      case (v, i) => (i.toLong, i % 3, 1L, "a", v)
    }
    val r = StatTests.grubbs(events(rows)).collect().head
    assert(r.getAs[Long]("worst_event_id") == 20L)
    assert(r.getAs[Double]("worst_value") == 100.0)
    assert(r.getAs[Double]("g_stat") > 4.0)
  }

  test("grubbs ties resolve to the smallest event id") {
    // two symmetric extremes with equal |dev|: ids 0 and 3
    val rows = Seq((0L, 0, 1L, "a", 0.0), (1L, 0, 1L, "a", 5.0),
      (2L, 0, 1L, "a", 5.0), (3L, 0, 1L, "a", 10.0))
    val r = StatTests.grubbs(events(rows)).collect().head
    assert(r.getAs[Long]("worst_event_id") == 0L)
  }

  test("proportionZ is ~zero when every type shares the weekend mix") {
    // two types, both 50% weekend (days 3=weekend, 4=weekday)
    val rows = (0 until 40).map { i =>
      val day = if (i % 2 == 0) 3 else 4
      (i.toLong, day, 1L, if (i < 20) "a" else "b", 1.0)
    }
    val out = StatTests.proportionZ(events(rows)).collect()
    assert(out.forall(r => math.abs(r.getAs[Double]("z_score")) < 1e-9))
  }

  test("oddsRatio is 1.0 on an independent 2x2 table") {
    // equal error rate on weekend and weekday
    val rows = (0 until 40).map { i =>
      val day = if (i % 2 == 0) 3 else 4
      (i.toLong, day, 1L, if (i % 4 < 2) "error" else "view", 1.0)
    }
    val r = StatTests.oddsRatio(events(rows)).collect().head
    assert(math.abs(r.getAs[Double]("odds_ratio") - 1.0) < 1e-9)
    assert(r.getAs[Double]("ci_lo") < 1.0 && r.getAs[Double]("ci_hi") > 1.0)
  }

  test("ljungBox is large on an alternating series, small on constant+spike") {
    // hourly sawtooth: r1 ~ -1 -> Q blows up
    val sawDf = (0 until 48).map { h =>
      (h.toLong, h.toLong * 3600, 1L, "a", if (h % 2 == 0) 1.0 else 9.0)
    }.toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
    val q = graft.ops.StatTests.ljungBox(sawDf).collect().head
    assert(q.getAs[Double]("r1") < -0.9)
    assert(q.getAs[Double]("q_lb") > 100.0)
  }

  test("partialCorr removes a perfectly-explained confounder") {
    // x and y are both exact linear functions of z -> r_xy=1 via z;
    // partial correlation given z is 0/0-guarded: use near-exact instead
    val days = 0 until 12
    val rows = days.flatMap { d =>
      val z = d.toDouble
      val x = 2.0 * z + (if (d % 2 == 0) 0.5 else -0.5)
      val y = -1.0 * z + (if (d % 3 == 0) 0.4 else -0.2)
      Seq((d * 3L, d, 1L, "x", x), (d * 3 + 1L, d, 1L, "y", y),
        (d * 3 + 2L, d, 1L, "z", z))
    }
    val out = StatTests.partialCorr(events(rows)).collect()
    // 3 types -> pairs (x,y),(x,z),(y,z) each with 1 control = 3 rows
    assert(out.length == 3)
    val xyGivenZ = out.find(r => r.getAs[String]("x") == "x"
      && r.getAs[String]("y") == "y").get
    val rxy = xyGivenZ.getAs[Double]("r_xy")
    val pr = xyGivenZ.getAs[Double]("partial_r")
    // raw r is strongly negative (y falls as x rises with z);
    // conditioning on z strips the shared trend
    assert(rxy < -0.9)
    assert(math.abs(pr) < math.abs(rxy))
    assert(out.forall(r => r.getAs[Long]("n") == 12))
  }

  test("brownForsythe flags a variance blowup the means hide") {
    // weekday (days 1-5): tight around 10; weekend (days 6-7 = Sat/Sun
    // for epoch days 2/3): same center, 10× the spread
    // epoch day d is weekend iff (d+4)%7 in {0,6} → days 2,3 (Sat,Sun)
    val wd = Seq(0, 1, 4, 5, 6).flatMap(d =>
      Seq(9.9, 10.0, 10.1, 9.8, 10.2).zipWithIndex.map { case (v, i) =>
        ((d * 10 + i).toLong, d, 1L, "a", v) })
    val we = Seq(2, 3).flatMap(d =>
      Seq(2.0, 18.0, 5.0, 15.0, 10.0).zipWithIndex.map { case (v, i) =>
        ((100 + d * 10 + i).toLong, d, 1L, "a", v) })
    val out = StatTests.brownForsythe(events(wd ++ we)).collect().head
    assert(out.getAs[Long]("n_wd") == 25)
    assert(out.getAs[Long]("n_we") == 10)
    assert(out.getAs[Double]("med_wd") == 10.0)
    assert(out.getAs[Double]("med_we") == 10.0)
    // same medians, wildly different spreads → large F
    assert(out.getAs[Double]("f_stat") > 10.0)
  }

  test("brownForsythe is ~zero when both phases share one distribution") {
    val vals = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val all = (0 to 6).flatMap(d => vals.zipWithIndex.map { case (v, i) =>
      ((d * 10 + i).toLong, d, 1L, "a", v) })
    val out = StatTests.brownForsythe(events(all)).collect().head
    assert(out.getAs[Double]("f_stat") < 0.1)
  }
}
