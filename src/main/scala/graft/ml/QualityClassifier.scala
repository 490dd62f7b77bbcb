package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Trainable document-quality classifier — the model-based generalization of
  * the rule gates (q53 repetition filters, q77 funnel). The published recipe
  * for corpus curation at scale: label a small seed by rules or by "looks
  * like a reference corpus", fit a cheap linear model over hashed token
  * features, then score EVERYTHING and keep by threshold — the classifier
  * catches junk the hand rules miss, and scoring is one map over the corpus.
  *
  * Spark-first shape: `RegexTokenizer → HashingTF → IDF → LogisticRegression`
  * are all distributed MLlib stages; HashingTF is stateless feature hashing
  * (no driver-side vocabulary — the property that lets the featurizer run on
  * 100 TB without collecting anything), IDF and LR fit with one and a few
  * passes respectively, and the fitted [[PipelineModel]] is a serializable
  * artifact (save/load) whose transform is map-only, batch or streaming.
  */
object QualityClassifier {

  /** Rule-based weak labels seeding the classifier: a doc is "good" (1.0)
    * iff it has at least `minWords` tokens AND its most frequent token
    * covers at most `maxTopShare` of them — the same length/repetition
    * signals as the q53 gates, cheap enough to label the whole corpus.
    */
  def weakLabels(docs: DataFrame, minWords: Int = 15,
                 maxTopShare: Double = 0.2): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("text"),
        split(graft.ops.Dedup.normText(col("text")), " ").as("w"))
    val top = toks
      .select(col("doc_id"), explode(col("w")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    toks
      .join(top, "doc_id")
      .select(col("doc_id"), col("text"),
        when(size(col("w")) >= minWords &&
          col("top_c") <= size(col("w")) * maxTopShare, 1.0).otherwise(0.0)
          .as("label"))
  }

  /** numFeatures is a power of two so hash bucketing is a bit-mask; 2^12 is
    * plenty for a quality signal (collisions blur features, not labels).
    */
  def pipeline(numFeatures: Int = 1 << 12): Pipeline = {
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("toks")
      .setPattern("[^a-z0-9]+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val lr = new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(50).setRegParam(0.01)
    new Pipeline().setStages(Array(tok, tf, idf, lr))
  }

  def fit(labeled: DataFrame, numFeatures: Int = 1 << 12): PipelineModel =
    pipeline(numFeatures).fit(labeled)

  /** (doc_id, p_good, prediction): p_good is P(label=1), the keep-threshold
    * knob. Stateless map — works identically on a streaming frame.
    */
  def score(model: PipelineModel, docs: DataFrame): DataFrame =
    model.transform(docs.select(col("doc_id"), col("text")))
      .select(
        col("doc_id"),
        vector_to_array(col("probability")).getItem(1).as("p_good"),
        col("prediction"))
}
