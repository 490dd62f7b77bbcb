package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** In-engine logistic regression by distributed Newton–Raphson.
  *
  * The canonical "ML training as aggregation" pattern: each Newton step is
  * ONE map-side-combinable aggregate over the data (gradient + Hessian
  * sufficient statistics), followed by an O(1) closed-form 2×2 solve — no
  * parameter server, no per-row state, and the data never moves. At 100 TB
  * each iteration costs exactly one scan+reduce; four iterations of a
  * well-conditioned 2-parameter model reach |Δβ| ~ 1e-8.
  *
  * Determinism contract (what makes the unrolled-SQL oracle replayable):
  * every per-row term is snapped to DECIMAL(28,12) before the sum, and the
  * coefficient pair is re-snapped to 1e-12 after each solve, so both
  * engines walk bit-identical (β₀, β₁) states; exp() noise is swallowed by
  * the per-term snap.
  */
object Regression {

  private def snap12(c: org.apache.spark.sql.Column) =
    round(c * lit(1e12)) / lit(1e12)
  private def r6(c: org.apache.spark.sql.Column) =
    round(c * lit(1000000)) / lit(1000000.0)

  /** q227: P(event_type = 'error' | value) by Newton-iterated logistic
    * regression — value is scaled by 1/100 so the logit stays in exp()'s
    * comfortable range. Returns the fitted intercept/slope, the positive
    * rate, and training accuracy of the β₀+β₁x > 0 rule (a pure sign
    * comparison — no float boundary).
    */
  def logisticNewton(events: DataFrame, iters: Int = 4): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val xy = events.select(
      (col("value") / lit(100.0)).as("x"),
      when(col("event_type") === "error", lit(1.0)).otherwise(lit(0.0))
        .as("y"))
    var beta = Seq((0.0, 0.0)).toDF("b0", "b1")
    for (_ <- 1 to iters) {
      val step = xy.crossJoin(broadcast(beta))
        .withColumn("t", col("b0") + col("b1") * col("x"))
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("t"))))
        .withColumn("w", col("p") * (lit(1.0) - col("p")))
        .agg(
          max(col("b0")).as("b0"), max(col("b1")).as("b1"),
          sum((col("y") - col("p")).cast("decimal(28,12)"))
            .cast("double").as("g0"),
          sum(((col("y") - col("p")) * col("x")).cast("decimal(28,12)"))
            .cast("double").as("g1"),
          sum(col("w").cast("decimal(28,12)")).cast("double").as("h00"),
          sum((col("w") * col("x")).cast("decimal(28,12)"))
            .cast("double").as("h01"),
          sum((col("w") * col("x") * col("x")).cast("decimal(28,12)"))
            .cast("double").as("h11"))
        .withColumn("det",
          col("h00") * col("h11") - col("h01") * col("h01"))
      beta = step.select(
        snap12(col("b0")
          + (col("h11") * col("g0") - col("h01") * col("g1")) / col("det"))
          .as("b0"),
        snap12(col("b1")
          + (col("h00") * col("g1") - col("h01") * col("g0")) / col("det"))
          .as("b1"))
        .localCheckpoint()
    }
    xy.crossJoin(broadcast(beta))
      .withColumn("pred",
        when(col("b0") + col("b1") * col("x") > 0, 1.0).otherwise(0.0))
      .groupBy(col("b0"), col("b1"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("pred") === col("y"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("n"), col("n_pos"),
        // + 0.0 folds a rounded -0.0 coefficient onto +0.0 (hash parity)
        (r6(col("b0")) + lit(0.0)).as("beta0"),
        (r6(col("b1")) + lit(0.0)).as("beta1"),
        r6(col("n_correct").cast("double") / col("n").cast("double"))
          .as("accuracy"))
  }

  def logisticNewton(spark: SparkSession, sfDir: String): DataFrame =
    logisticNewton(Tables.events(spark, sfDir))
}
