package graft

import org.apache.spark.sql.functions._
import graft.ops.{ExtremeStats, Relational, StatTests, TimeSeries}

/** Degradation behavior of the round-6 widening operators on degenerate
  * inputs: flat series, single observations, and collapsed category grids
  * must degrade gracefully (drop the group or emit defined NULL/0 values),
  * never throw — the same contract EdgeCasesSpec pins for the round-4
  * layer.
  */
class Round6EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("event_id", "sec", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
      .withColumn("user_id", lit(1L))
      .drop("sec")

  test("taylorLaw drops a flat series (zero daily variance everywhere)") {
    // two readings per day so n>=2, all identical -> v=0 -> filtered out
    val rows = (0 until 20).flatMap(d => Seq(
      (d * 2L + 1, d * 86400L + 60, "flat", 5.0),
      (d * 2L + 2, d * 86400L + 120, "flat", 5.0)))
    assert(TimeSeries.taylorLaw(events(rows)).collect().isEmpty)
  }

  test("vonNeumann on a single-day series emits defined NULLs, no throw") {
    val rows = Seq((1L, 60L, "one", 3.0), (2L, 120L, "one", 4.0))
    val out = TimeSeries.vonNeumann(events(rows)).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_days") == 1L)
    assert(out.head.isNullAt(out.head.fieldIndex("vn_ratio")))
  }

  test("extremalIndex on a flat series finds no exceedances") {
    val rows = (0 until 30).map(d =>
      (d.toLong + 1, d * 86400L + 60, "flat", 5.0))
    assert(ExtremeStats.extremalIndex(events(rows)).collect().isEmpty)
  }

  test("tailDependence with a single series yields no pairs") {
    val rows = (0 until 30).map(d =>
      (d.toLong + 1, d * 86400L + 60, "solo", d * 1.0))
    assert(ExtremeStats.tailDependence(events(rows)).collect().isEmpty)
  }

  test("acfHalfLife on a single-day series yields no lag pairs") {
    val rows = Seq((1L, 60L, "one", 3.0))
    assert(TimeSeries.acfHalfLife(events(rows)).collect().isEmpty)
  }

  test("medianPolish on a single-cell grid reports zero ranges") {
    // all readings in one (dow, hour) cell
    val rows = (1 to 5).map(i => (i.toLong, i * 60L, "cell", i * 1.0))
    val out = TimeSeries.medianPolish(events(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("dow_range") == 0.0)
    assert(r.getAs[Double]("hour_range") == 0.0)
    assert(r.getAs[Double]("resid_mad") == 0.0)
  }

  test("cramersV with a single discount level nulls V instead of crashing") {
    val li = (1 to 10).map(i => (i * 1.0, 0.05))
      .toDF("l_quantity", "l_discount")
    val out = StatTests.cramersV(li).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_disc_levels") == 1L)
    assert(out.head.isNullAt(out.head.fieldIndex("cramers_v")))
  }

  test("valuePrecision classifies integers as 0 decimals") {
    val rows = Seq((1L, 60L, "int", 42.0), (2L, 120L, "int", -7.0),
      (3L, 180L, "mix", 1.25))
    val out = TimeSeries.valuePrecision(events(rows)).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out(("int", 0)) == 2L)
    assert(out(("mix", 2)) == 1L)
  }

  test("discountMonotonicity first level has NULL violation flag") {
    val li = Seq((1.0, 0.0), (2.0, 0.0), (5.0, 0.01), (1.0, 0.01))
      .toDF("l_quantity", "l_discount")
    val out = Relational.discountMonotonicity(li)
      .orderBy(col("disc_pct")).collect()
    assert(out.length == 2)
    assert(out.head.isNullAt(out.head.fieldIndex("is_violation")))
    // 1.5 mean at 0% -> 3.0 mean at 1%: rising, not a violation
    assert(!out(1).getAs[Boolean]("is_violation"))
  }
}
