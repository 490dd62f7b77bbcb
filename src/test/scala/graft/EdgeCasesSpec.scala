package graft

import org.apache.spark.sql.functions._
import graft.ops.{ExtremeStats, StatTests}

/** Degradation behavior of the round-4 statistical operators on degenerate
  * inputs: short series and zero-variance groups must degrade gracefully
  * (drop the group or emit a defined value), never throw.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("event_id", "sec", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
      .withColumn("user_id", lit(1L))
      .drop("sec")

  test("hillTail drops series shorter than k+1 instead of crashing") {
    val rows = (1 to 5).map(i => (i.toLong, i.toLong * 60, "tiny", i * 1.0))
    val out = ExtremeStats.hillTail(events(rows), k = 100).collect()
    assert(out.isEmpty)
  }

  test("potExceedances on an all-equal series emits no exceedance row") {
    val rows = (1 to 40).map(i => (i.toLong, i.toLong * 60, "flat", 5.0))
    val out = ExtremeStats.potExceedances(events(rows)).collect()
    // nothing exceeds the (constant) threshold -> group drops out
    assert(out.isEmpty)
  }

  test("grubbs on a zero-variance series reports G=0 instead of crashing") {
    val rows = (1 to 10).map(i => (i.toLong, i.toLong * 60, "flat", 5.0))
    val out = StatTests.grubbs(events(rows)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("g_stat") == 0.0)
  }

  test("jarqueBera on a zero-variance series reports zero moments") {
    val rows = (1 to 10).map(i => (i.toLong, i.toLong * 60, "flat", 5.0))
    val out = StatTests.jarqueBera(events(rows)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("skewness") == 0.0)
    assert(out.head.getAs[Double]("jb_stat") == 0.0)
  }

  test("seasonalMannKendall with no within-season pairs yields no row") {
    // two days in different weekday seasons: zero pairs -> series drops
    val rows = Seq((1L, 0L, "s", 1.0), (2L, 86400L, "s", 2.0))
    assert(StatTests.seasonalMannKendall(events(rows)).collect().isEmpty)
  }

  test("anovaF with all-constant data reports F=0, eta=0") {
    val rows = (1 to 10).map(i =>
      (i.toLong, 0L, if (i <= 5) "a" else "b", 7.0))
    val r = StatTests.anovaF(events(rows)).collect().head
    assert(r.getAs[Double]("f_stat") == 0.0)
    assert(r.getAs[Double]("eta_sq") == 0.0)
  }

  test("cohensD with weekend-only data does not throw") {
    // epoch day 3 -> weekend residue
    val rows = (1 to 6).map(i =>
      (i.toLong, 3L * 86400 + i * 60, "a", i.toDouble))
    val out = StatTests.cohensD(events(rows)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_wd") == 0)
  }

  test("oddsRatio with an empty cell yields NULL estimates, no crash") {
    // only error events -> b = d = 0
    val rows = (1 to 8).map(i =>
      (i.toLong, (i % 7).toLong * 86400, "error", 1.0))
    val r = StatTests.oddsRatio(events(rows)).collect().head
    assert(r.isNullAt(r.fieldIndex("odds_ratio")))
    assert(r.isNullAt(r.fieldIndex("ci_lo")))
  }

  test("ljungBox on constant hourly means reports zero statistics") {
    val rows = (0 until 30).map(h =>
      (h.toLong, h.toLong * 3600, "flat", 4.0))
    val r = StatTests.ljungBox(events(rows)).collect().head
    assert(r.getAs[Double]("r1") == 0.0)
    assert(r.getAs[Double]("q_lb") == 0.0)
  }

  test("partialCorr with perfectly collinear series does not throw") {
    // x = z exactly, y = -z: every |r| = 1 -> partial guard kicks in
    val rows = (0 until 10).flatMap { d =>
      Seq((d * 3L, d.toLong * 86400, "x", d.toDouble),
        (d * 3 + 1L, d.toLong * 86400, "y", -d.toDouble),
        (d * 3 + 2L, d.toLong * 86400, "z", d.toDouble))
    }
    val out = StatTests.partialCorr(events(rows)).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => !r.getAs[Double]("partial_r").isNaN))
  }

  test("rollingCorr emits nothing before 12 aligned hours exist") {
    val rows = (0 until 5).flatMap { h =>
      Seq((h * 2L, h.toLong * 3600, "click", 1.0 * h),
        (h * 2 + 1L, h.toLong * 3600, "purchase", 2.0 * h))
    }
    assert(StatTests.rollingCorr(events(rows)).collect().isEmpty)
  }
}
