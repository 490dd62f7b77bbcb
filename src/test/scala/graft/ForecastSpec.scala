package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ml.Forecast
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.regression.LinearRegressionModel

/** The AR forecaster must recover a known autoregressive process from
  * pooled multi-series data and survive save/load bit-identically.
  */
class ForecastSpec extends SparkSpec {
  import spark.implicits._

  // deterministic AR(1): x_t = 0.8 x_{t-1} + u_t with a fixed pseudo-noise
  // sequence (no Random: the spec must be reproducible)
  private def series(userId: Long, n: Int): Seq[(Long, Timestamp, Long, String, Double, String)] = {
    var x = 10.0
    (0 until n).map { i =>
      val noise = math.sin(userId * 31 + i * 7.13) * 0.1
      x = 0.8 * x + noise
      (userId * 10000 + i, new Timestamp(1704067200000L + i * 60000L), userId, "m", x, "")
    }
  }

  private def events =
    (series(1L, 200) ++ series(2L, 200))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("AR(1) coefficient is recovered from pooled series") {
    val feats = Forecast.lagFeatures(events, p = 1)
    val model = Forecast.fit(feats, p = 1)
    val lr = model.stages.last.asInstanceOf[LinearRegressionModel]
    assert(math.abs(lr.coefficients(0) - 0.8) < 0.05,
      s"AR coefficient ${lr.coefficients(0)} far from 0.8")
    assert(Forecast.rmse(model, feats) < 0.1) // residuals ~ the noise scale
  }

  test("higher-order lags add nothing for an AR(1) process; save/load is exact") {
    val feats = Forecast.lagFeatures(events, p = 3)
    val model = Forecast.fit(feats, p = 3)
    val r3 = Forecast.rmse(model, feats)
    assert(r3 < 0.1)

    val dir = Files.createTempDirectory("graft-ar").toString + "/m"
    model.write.overwrite().save(dir)
    val reloaded = PipelineModel.load(dir)
    val a = Forecast.score(model, feats)
      .select("event_id", "prediction").as[(Long, Double)].collect().toMap
    val b = Forecast.score(reloaded, feats)
      .select("event_id", "prediction").as[(Long, Double)].collect().toMap
    assert(a === b)
  }

  test("the residual column flags an injected level shift") {
    val shifted = events.withColumn("value",
      org.apache.spark.sql.functions.when(
        $"user_id" === 1L && $"event_id" >= 10150L, $"value" + 50.0)
        .otherwise($"value"))
    val feats = Forecast.lagFeatures(shifted, p = 1)
    val model = Forecast.fit(Forecast.lagFeatures(events, p = 1), p = 1)
    val worst = Forecast.score(model, feats)
      .orderBy(org.apache.spark.sql.functions.abs($"residual").desc)
      .select("event_id").as[Long].head()
    assert(worst === 10150L) // the first shifted sample has the largest residual
  }
}
