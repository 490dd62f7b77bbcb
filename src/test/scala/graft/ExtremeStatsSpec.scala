package graft

import org.apache.spark.sql.functions._
import graft.ops.ExtremeStats

/** Known-answer checks for the extreme-value / randomness screens
  * (q212-q215) on tiny hand-built series.
  */
class ExtremeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: Seq[(Long, Long, String, Double)]) =
    rows.toDF("event_id", "sec", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)"))
      .withColumn("user_id", lit(1L))
      .drop("sec")

  test("blockMaximaGumbel fits method-of-moments on known block maxima") {
    // two 30-day blocks with maxima 10 and 20
    val rows = Seq(
      (1L, 0L, "a", 3.0), (2L, 86400L, "a", 10.0),
      (3L, 31L * 86400, "a", 20.0), (4L, 32L * 86400, "a", 5.0))
    val row = ExtremeStats.blockMaximaGumbel(events(rows)).collect().head
    assert(row.getAs[Long]("n_blocks") == 2)
    assert(math.abs(row.getAs[Double]("mean_max") - 15.0) < 1e-6)
    val sd = math.sqrt(((10.0 - 15) * (10 - 15) + (20.0 - 15) * (20 - 15)) / 1)
    assert(math.abs(row.getAs[Double]("sd_max") - sd) < 1e-6)
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = 15.0 - 0.5772156649015329 * beta
    assert(math.abs(row.getAs[Double]("gumbel_scale") - beta) < 1e-5)
    assert(math.abs(row.getAs[Double]("gumbel_loc") - mu) < 1e-5)
    val rl = mu - beta * math.log(-math.log(0.99))
    assert(math.abs(row.getAs[Double]("rl100") - rl) < 1e-4)
  }

  test("hillTail recovers alpha on an exact Pareto ladder") {
    // x_i = 2^(i/2): ln(x_i/x_thr) telescopes; alpha = k / sum
    val n = 10
    val rows = (1 to n).map { i =>
      (i.toLong, i.toLong, "a", math.pow(2.0, i / 2.0))
    }
    val out = ExtremeStats.hillTail(events(rows), k = 4).collect().head
    assert(out.getAs[Long]("k_used") == 4)
    // top 4 are 2^5,2^4.5,2^4,2^3.5; threshold = 2^3
    val thr = math.pow(2.0, 3.0)
    assert(math.abs(out.getAs[Double]("threshold") - thr) < 1e-6)
    val sumLn = Seq(5.0, 4.5, 4.0, 3.5)
      .map(e => math.log(math.pow(2.0, e) / thr)).sum
    assert(math.abs(out.getAs[Double]("hill_alpha") - 4.0 / sumLn) < 1e-4)
  }

  test("recordsCensus counts strict running-max breaks") {
    // values 1,3,2,5,5,6 -> records at 1,3,5,6 = 4 (tie at 5 not a record)
    val rows = Seq(1.0, 3.0, 2.0, 5.0, 5.0, 6.0).zipWithIndex.map {
      case (v, i) => (i.toLong, i.toLong * 60, "a", v)
    }
    val row = ExtremeStats.recordsCensus(events(rows)).collect().head
    assert(row.getAs[Long]("n") == 6)
    assert(row.getAs[Long]("n_records") == 4)
  }

  test("turningPoints counts strict local extrema and scores vs iid") {
    // 1,3,2,4,1,5: interior points 3(peak),2(valley),4(peak),1(valley) = 4
    val rows = Seq(1.0, 3.0, 2.0, 4.0, 1.0, 5.0).zipWithIndex.map {
      case (v, i) => (i.toLong, i.toLong * 60, "a", v)
    }
    val row = ExtremeStats.turningPoints(events(rows)).collect().head
    assert(row.getAs[Long]("n") == 6)
    assert(row.getAs[Long]("n_turning") == 4)
    val e = 2.0 * 4 / 3.0
    val v = (16.0 * 6 - 29.0) / 90.0
    assert(math.abs(row.getAs[Double]("z_score") - (4 - e) / math.sqrt(v)) < 1e-5)
  }

  test("potExceedances picks the exact p95 rank and mean excess") {
    // 20 values 1..20: k = ceil(0.95*20) = 19 -> threshold = 19,
    // exceedances = {20}, mean excess = 1
    val rows = (1 to 20).map(i => (i.toLong, i.toLong * 60, "a", i.toDouble))
    val row = ExtremeStats.potExceedances(events(rows)).collect().head
    assert(row.getAs[Long]("n") == 20)
    assert(math.abs(row.getAs[Double]("threshold") - 19.0) < 1e-9)
    assert(row.getAs[Long]("n_exceed") == 1)
    assert(math.abs(row.getAs[Double]("mean_excess") - 1.0) < 1e-9)
    assert(math.abs(row.getAs[Double]("exp_rate") - 1.0) < 1e-9)
    assert(math.abs(row.getAs[Double]("frac_exceed") - 0.05) < 1e-9)
  }

  test("flat series has zero turning points and one record") {
    val rows = (0 until 5).map(i => (i.toLong, i.toLong * 60, "a", 7.0))
    assert(ExtremeStats.turningPoints(events(rows))
      .collect().head.getAs[Long]("n_turning") == 0)
    assert(ExtremeStats.recordsCensus(events(rows))
      .collect().head.getAs[Long]("n_records") == 1)
  }
}
