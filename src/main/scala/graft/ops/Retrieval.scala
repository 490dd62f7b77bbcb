package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Term-based retrieval over the documents table — the lexical complement
  * to the embedding-space search in [[Similarity]]: BM25 ranking via an
  * inverted-index join, the operator a RAG/data-audit pipeline runs when it
  * needs "find the documents about X" without an embedding model.
  */
object Retrieval {

  /** q82: BM25 top-k — the first `nProbes` documents act as queries (their
    * distinct tokens), every other document is scored with Okapi BM25
    * (Lucene's idf form: ln(1 + (N − df + ½)/(df + ½))) and the top `k`
    * per probe survive.
    *
    * Scale posture: the score join is inverted-index shaped — postings
    * (doc, token, tf) equi-join the tiny probe term set, so the corpus
    * streams through keyed by token and only candidate (probe, doc) pairs
    * aggregate; df/dl side tables come from the SAME postings shuffle
    * (exchange reuse, not extra scans); the global (N, avgdl) scalar is a
    * one-row broadcast. Per-term scores snap to DECIMAL(18,10) before the
    * sum so ranking is independent of aggregation order (same trick as
    * q81), and the final top-k is a per-probe window over already-reduced
    * (probe, doc) scores.
    */
  def bm25TopK(docs: DataFrame, nProbes: Int = 5, k: Int = 5,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = docs
      .select(col("doc_id"),
        explode(split(Dedup.normText(col("text")), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // exact integer sums -> one double divide: order-free
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val probes = tf.where(col("doc_id") < nProbes)
      .select(col("doc_id").as("probe_id"), col("tok"))

    val scored = tf
      .join(probes, "tok")
      .where(col("doc_id") =!= col("probe_id"))
      .join(dfreq, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("term",
        (log((col("n_docs") - col("df").cast("double") + lit(0.5))
            / (col("df").cast("double") + lit(0.5)) + lit(1.0))
          * (col("tf").cast("double") * lit(k1 + 1.0))
          / (col("tf").cast("double")
             + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
          .cast("decimal(18,10)"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(sum(col("term")).as("s"))

    val w = Window.partitionBy(col("probe_id")).orderBy(col("s").desc, col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("probe_id"), col("rnk"), col("doc_id"),
        (round(col("s").cast("double") * 10000) / 10000).as("bm25"))
  }

  def bm25TopK(spark: SparkSession, sfDir: String): DataFrame =
    bm25TopK(Tables.documents(spark, sfDir))
}
