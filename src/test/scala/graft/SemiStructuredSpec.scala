package graft

import org.apache.spark.sql.functions._
import graft.ops.SemiStructured

/** Known-answer checks for q230-q232: JSON schema-on-read, higher-order
  * vector profiling, window-function tail.
  */
class SemiStructuredSpec extends SparkSpec {
  import spark.implicits._

  test("jsonProps parses the payload with from_json, not a regex") {
    val df = Seq(
      (1L, 0L, 1L, "a", 2.0, """{"k": 7}"""),
      (2L, 0L, 1L, "a", 4.0, """{"k": 13}"""),
      (3L, 0L, 1L, "a", 6.0, """not json"""))
      .toDF("event_id", "sec", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
    val out = SemiStructured.jsonProps(df).collect()
    // malformed row parses to NULL k -> its own NULL bucket
    val b0 = out.find(r => r.getAs[Integer]("k_bucket") == 0).get
    assert(b0.getAs[Long]("n") == 1 && b0.getAs[Int]("k_min") == 7)
    val b10 = out.find(r => r.getAs[Integer]("k_bucket") == 10).get
    assert(b10.getAs[Int]("k_max") == 13)
    assert(out.exists(r => r.getAs[Integer]("k_bucket") == null))
  }

  test("vectorProfile computes exact L1/Linf/sign census") {
    val df = Seq((1L, Array(1.0f, -2.0f, 0.0f, 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = SemiStructured.vectorProfile(df).collect().head
    assert(r.getAs[Int]("dim") == 4)
    assert(math.abs(r.getAs[Double]("l1") - 3.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("linf") - 2.0) < 1e-9)
    assert(r.getAs[Int]("n_pos") == 2)
    assert(math.abs(r.getAs[Double]("mean_abs") - 0.875) < 1e-9)
  }

  test("timeWeightedAvg weights by holding time, not sample count") {
    // value 0 held for 90s, then three quick 10-spikes 1s apart:
    // plain mean = (0+10+10+10)/4 = 7.5
    // TWA = (trap(0->10 over 90) + 2*trap(10->10 over 1)) / 92
    //     = (450 + 10 + 10) / 92 ≈ 5.1087
    val df = Seq(
      (1L, 0L, 1L, "a", 0.0), (2L, 90L, 1L, "a", 10.0),
      (3L, 91L, 1L, "a", 10.0), (4L, 92L, 1L, "a", 10.0))
      .toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
      .withColumn("props", lit("{}"))
    val r = graft.ops.TimeSeries.timeWeightedAvg(df).collect().head
    assert(math.abs(r.getAs[Double]("plain_mean") - 7.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("twa") - 470.0 / 92.0) < 1e-3)
    assert(r.getAs[Double]("sampling_bias") > 2.0)
  }

  test("rollingCorr tracks a sign flip between aligned series") {
    // x rises while y falls for 30h -> strongly negative local corr
    val rows = (0 until 30).flatMap { h =>
      Seq((h * 2L, h * 3600L, 1L, "click", h.toDouble),
        (h * 2 + 1L, h * 3600L, 1L, "purchase", 100.0 - h))
    }
    val df = rows.toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
      .withColumn("props", lit("{}"))
    val out = graft.ops.StatTests.rollingCorr(df).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("corr24") < -0.999))
  }

  test("windowTail percent_rank and nth_value over event order") {
    val df = Seq(
      (1L, 0L, 1L, "a", 10.0), (2L, 60L, 1L, "a", 20.0),
      (3L, 120L, 1L, "a", 30.0), (4L, 180L, 1L, "a", 40.0))
      .toDF("event_id", "sec", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_seconds(sec)")).drop("sec")
      .withColumn("props", lit("{}"))
    val out = SemiStructured.windowTail(df).orderBy(col("event_id")).collect()
    assert(out.map(_.getAs[Double]("pr")).toSeq ==
      Seq(0.0, 1.0 / 3, 2.0 / 3, 1.0).map(x => math.round(x * 1e6) / 1e6))
    assert(out.forall(_.getAs[Double]("first_val") == 10.0))
    // third_val is null until the frame holds 3 rows
    assert(out(0).isNullAt(out(0).fieldIndex("third_val")))
    assert(out(1).isNullAt(out(1).fieldIndex("third_val")))
    assert(out(2).getAs[Double]("third_val") == 30.0)
    assert(out(3).getAs[Double]("third_val") == 30.0)
  }
}
