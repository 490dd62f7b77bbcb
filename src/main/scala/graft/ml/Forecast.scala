package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Autoregressive one-step forecaster — the "what should this sensor read
  * next" model that turns the anomaly question into forecast-error
  * thresholding (the other classic equipment-monitoring detector beside
  * AnomalyDetector's distance-to-normal). AR(p) restated Spark-first:
  * the lag matrix is p window columns over the series shuffle (no
  * per-series driver loop), and the coefficient fit is one distributed
  * `LinearRegression` over all series' rows — a single global model, the
  * cross-series pooling a fleet of similar machines wants.
  */
object Forecast {

  /** (user_id, e, label, lag1..lagp) — rows with any missing lag dropped,
    * so every training row has a full feature vector.
    */
  def lagFeatures(events: DataFrame, p: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("e"), col("event_id"))
    val base = events.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("e"), col("value").as("label"))
    val lagged = (1 to p).foldLeft(base) { (df, i) =>
      df.withColumn(s"lag$i", lag(col("label"), i).over(w))
    }
    lagged.na.drop((1 to p).map(i => s"lag$i"))
  }

  def pipeline(p: Int = 3): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols((1 to p).map(i => s"lag$i").toArray)
      .setOutputCol("features")
    val lr = new LinearRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(50).setRegParam(0.0).setElasticNetParam(0.0)
    new Pipeline().setStages(Array(assembler, lr))
  }

  def fit(features: DataFrame, p: Int = 3): PipelineModel =
    pipeline(p).fit(features)

  /** Forecast + residual per row; the residual is the anomaly signal. */
  def score(model: PipelineModel, features: DataFrame): DataFrame =
    model.transform(features)
      .withColumn("residual", col("label") - col("prediction"))

  /** Root-mean-square forecast error over a (held-out) feature frame. */
  def rmse(model: PipelineModel, features: DataFrame): Double =
    score(model, features)
      .agg(sqrt(avg(col("residual") * col("residual"))))
      .head().getDouble(0)
}
