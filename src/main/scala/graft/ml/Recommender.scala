package graft.ml

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Collaborative-filtering recommender over the customer→part purchase
  * matrix by ALS (alternating least squares) — the matrix-factorization
  * workhorse MLlib ships precisely because it distributes: each ALS half-
  * step solves independent per-user (then per-item) normal equations
  * against the in-block ratings, so the work partitions by user/item
  * block with no global state beyond the small factor matrices. The
  * reference's "model" surface is anomaly detection; a query engine for
  * purchase data wants the ranking twin — which parts does this customer
  * buy next.
  *
  * Implicit-preference mode (Hu, Koren & Volinsky 2008): purchase
  * quantities are confidence weights on a binary "bought" signal, the
  * right formulation for transaction logs where absence is not a negative
  * rating. Seeded, so fits are reproducible run to run; the fitted model
  * save/loads like any MLlib model and scoring is a broadcast-factor
  * join, not a driver loop.
  */
object Recommender {

  /** (customer, part, total quantity) implicit-rating triples. */
  def ratings(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").cast("int").as("user"),
        col("l_partkey").cast("int").as("item"))
      .agg(sum(col("l_quantity")).cast("float").as("rating"))
  }

  def fit(ratings: DataFrame, rank: Int = 8, seed: Long = 42L): ALSModel = {
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(rank).setMaxIter(8).setRegParam(0.1)
      .setImplicitPrefs(true).setAlpha(1.0)
      .setSeed(seed)
      .setColdStartStrategy("drop")
      .fit(ratings)
  }

  /** Top-k part recommendations per customer, EXCLUDING already-bought
    * parts — the serving query. recommendForAllUsers is a blocked
    * factor-matrix product (distributed top-k per user block); the
    * already-bought filter is an anti-join on the rating pairs.
    */
  def recommend(model: ALSModel, ratings: DataFrame, k: Int = 5): DataFrame = {
    val raw = model.recommendForAllUsers(k * 2)
      .select(col("user"), explode(col("recommendations")).as("rec"))
      .select(col("user"), col("rec.item").as("item"),
        col("rec.rating").as("score"))
    raw.join(ratings.select(col("user"), col("item")),
        Seq("user", "item"), "left_anti")
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user"))
          .orderBy(col("score").desc, col("item"))))
      .where(col("rnk") <= k)
  }
}
