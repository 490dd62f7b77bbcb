package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Click→purchase attribution: the bounded interval join over the events
  * stream, in both batch and streaming form.
  */
object Attribution {

  /** q84: last-touch attribution — for every purchase, the most recent
    * click by the same user within `windowSec` before it. The per-user
    * equi-join carries the time bound as a residual predicate, so the
    * shuffle key is user_id (the natural co-partitioning at scale) and
    * fan-out per purchase is bounded by that user's click density inside
    * one window. "Most recent" is a max over (epoch, event_id) structs —
    * an aggregate, not a global-sort window — with the id tiebreak making
    * same-second clicks deterministic.
    */
  def lastTouch(events: DataFrame, windowSec: Long = 3600L): DataFrame = {
    val ep = TimeSeries.epochS(col("ts"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), ep.as("p_ep"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), ep.as("c_ep"))
    purchases
      .join(clicks, Seq("user_id"))
      .where(col("c_ep") <= col("p_ep") &&
        col("p_ep") - col("c_ep") <= windowSec)
      .groupBy(col("purchase_id"), col("user_id"), col("p_ep"))
      .agg(max(struct(col("c_ep"), col("click_id"))).as("m"))
      .select(col("purchase_id"), col("user_id"),
        col("m.click_id").as("click_id"),
        (col("p_ep") - col("m.c_ep")).as("gap_sec"))
  }

  def lastTouch(spark: SparkSession, sfDir: String): DataFrame =
    lastTouch(Tables.events(spark, sfDir))

  /** q205: U-shaped (position-based) multi-touch attribution — the
    * industry-standard credit split q84's last-touch can't express: with
    * k in-window touches, first and last get 40% each and the middles
    * split the remaining 20% (k=1 → 100%, k=2 → 50/50). Same bounded
    * user-keyed interval join as q84; positions come from ONE window over
    * the per-purchase touch list (partition key (purchase, user) —
    * bounded by a user's click density, never global); per-touch credits
    * snap to 12-dp decimal so the position rollup and the
    * credit-conservation identity (Σcredit = #attributed purchases,
    * spec-asserted) are exact.
    */
  def positionAttribution(events: DataFrame,
                          windowSec: Long = 86400L): DataFrame = {
    val ep = TimeSeries.epochS(col("ts"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        ep.as("p_ep"))
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), ep.as("c_ep"))
    val touches = purchases.join(clicks, Seq("user_id"))
      .where(col("c_ep") <= col("p_ep") &&
        col("p_ep") - col("c_ep") <= windowSec)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
      .orderBy(col("c_ep"), col("click_id"))
    val ranked = touches
      .withColumn("rn", row_number().over(w))
      .withColumn("k", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("purchase_id"))))
    val credit = when(col("k") === 1, lit(1.0))
      .when(col("k") === 2, lit(0.5))
      .when(col("rn") === 1 || col("rn") === col("k"), lit(0.4))
      .otherwise(lit(0.2) / (col("k") - lit(2)))
    val position = when(col("k") === 1, "single")
      .when(col("rn") === 1, "first")
      .when(col("rn") === col("k"), "last")
      .otherwise("middle")
    ranked
      .withColumn("credit",
        (round(credit * lit(1e12)) / lit(1e12)).cast("decimal(28,12)"))
      .groupBy(position.as("touch_pos"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("purchase_id")).as("n_purchases"),
        (round(sum(col("credit")).cast("double") * lit(1000000))
          / lit(1000000.0)).as("total_credit"))
  }

  def positionAttribution(spark: SparkSession, sfDir: String): DataFrame =
    positionAttribution(Tables.events(spark, sfDir))

  /** Stream-stream interval join: purchases arriving on one stream join
    * clicks arriving on another, same user, click within `windowSec`
    * before the purchase. The symmetric watermarks bound how long either
    * side's rows wait in state (Spark evicts a buffered click once no
    * future purchase can reach back to it), so state stays proportional to
    * one window of traffic — the property that lets attribution run
    * forever on unbounded streams. Batch q84 adds the keep-latest
    * aggregate; the streaming join emits every in-window pair and leaves
    * last-touch reduction to a downstream consumer (streaming top-1 per
    * purchase would need its own stateful stage).
    */
  def clickPurchaseJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      windowSec: Long = 3600L,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    p.join(c, expr(
        s"""p_user = c_user
           |AND c_ts >= p_ts - INTERVAL $windowSec SECONDS
           |AND c_ts <= p_ts""".stripMargin))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"),
        (unix_timestamp(col("p_ts")) - unix_timestamp(col("c_ts"))).as("gap_sec"))
  }
}
