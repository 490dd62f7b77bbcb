package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MLlib anomaly-detection pipeline — the trainable stand-in for the
  * reference's managed model (its service-side trainer is invisible; what a
  * Spark-native replacement needs is the same shape: feature engineering →
  * fitted model → per-window anomaly score → flagged ranges).
  *
  * Training is a standard `Pipeline(VectorAssembler → StandardScaler →
  * KMeans)`: all stages are distributed estimators, the fitted
  * [[PipelineModel]] is serializable (save/load), and scoring is one map
  * over the features. The anomaly score is the Euclidean distance to the
  * nearest cluster centroid in scaled feature space — with k=1 this is
  * "distance from normal operating points", with one centroid per operating
  * regime (idle/load/peak).
  */
object AnomalyDetector {

  /** Feature engineering: per (user_id, hour) activity features from the raw
    * event stream — counts, value moments, error share. One shuffle.
    */
  def featurize(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
        (floor(unix_timestamp(col("ts")) / 3600L) * 3600L).cast("long").as("hour"))
      .agg(
        count(lit(1)).cast("double").as("n_events"),
        avg(col("value")).as("mean_value"),
        max(col("value")).as("max_value"),
        sum(when(col("event_type") === "error", 1.0).otherwise(0.0)).as("n_errors"))

  val featureCols: Array[String] = Array("n_events", "mean_value", "max_value", "n_errors")

  /** Assembler → scaler → k-means, seeded for reproducibility. MLlib
    * requires k ≥ 2; multi-regime equipment wants several anyway. Train on
    * the TRAINING period only (reference set_time_periods semantics) — the
    * centroids then describe normal operation and anomalous windows score
    * far from all of them.
    */
  def pipeline(k: Int = 2, seed: Long = 42L): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols).setOutputCol("raw_features")
    val scaler = new StandardScaler()
      .setInputCol("raw_features").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val kmeans = new KMeans()
      .setK(k).setSeed(seed).setFeaturesCol("features").setPredictionCol("cluster")
    new Pipeline().setStages(Array(assembler, scaler, kmeans))
  }

  def fit(features: DataFrame, k: Int = 2): PipelineModel =
    pipeline(k).fit(features)

  /** Score = distance to the nearest centroid in scaled space. Centers are a
    * tiny driver-side array closed over by the scoring function — the same
    * broadcast-small-codebook shape as the IVF search.
    */
  def score(model: PipelineModel, features: DataFrame): DataFrame = {
    val centers = model.stages.last.asInstanceOf[KMeansModel].clusterCenters
    val distUdf = udf { v: Vector =>
      centers.map(c => math.sqrt(org.apache.spark.ml.linalg.Vectors.sqdist(v, c))).min
    }
    model.transform(features)
      .withColumn("anomaly_score", distUdf(col("features")))
  }
}
