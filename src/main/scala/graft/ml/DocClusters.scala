package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document clustering for corpus organization: tokenize → hashed TF →
  * IDF → k-means, the standard MLlib recipe for grouping a corpus by
  * topical similarity (near-duplicate clusters come from the dedup family;
  * THIS groups distinct-but-related documents — the "organize the corpus
  * into buckets a curator can sample from" step).
  *
  * Every stage is a distributed estimator/transformer: HashingTF is
  * stateless (feature hashing — no vocabulary build, no driver-side dict,
  * which is what makes it the 100 TB choice over CountVectorizer), IDF is
  * one aggregation over the corpus, and KMeans is the usual Lloyd's
  * iterations over cached features. The fitted PipelineModel serializes
  * (save/load) like any MLlib model; scoring is a map.
  */
object DocClusters {

  def pipeline(k: Int = 4, numFeatures: Int = 1024, seed: Long = 42L): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val km = new KMeans()
      .setFeaturesCol("features").setPredictionCol("cluster")
      .setK(k).setSeed(seed)
    new Pipeline().setStages(Array(tok, tf, idf, km))
  }

  def fit(docs: DataFrame, k: Int = 4): PipelineModel =
    pipeline(k).fit(docs)

  /** Per-cluster census of a fitted model's assignments. */
  def clusterCensus(model: PipelineModel, docs: DataFrame): DataFrame =
    model.transform(docs)
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
}
