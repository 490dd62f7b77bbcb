package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Structured-Streaming-ready event aggregation.
  *
  * [[windowedAgg]] is one logical plan that runs in both modes: over a batch
  * DataFrame it's a plain tumbling-window groupBy; over a streaming source
  * (`readStream` + watermark) the identical plan becomes an incremental
  * stateful aggregation. q32 exercises the batch side against the DuckDB
  * oracle; the streaming spec drives the same function through a
  * MemoryStream and asserts it produces the batch answer — the
  * batch-streaming parity Structured Streaming guarantees for windowed aggs.
  *
  * The average accumulates in DECIMAL(18,6) so batch, streaming and oracle
  * all see the same exact sum regardless of row order.
  */
object EventStream {

  /** Tumbling 10-minute windows per event type: count + exact mean value.
    * Works unchanged on batch and streaming inputs.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as("avg_raw"))
      .select(
        unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"),
        (round(col("avg_raw") * 10000) / 10000).as("avg_value"))

  /** Same plan with a watermark, as a streaming pipeline would declare it. */
  def windowedAggStream(events: DataFrame): DataFrame =
    windowedAgg(events.withWatermark("ts", "30 minutes"))

  /** Hopping (sliding) windowed aggregation — each event contributes to
    * FOUR overlapping 1-hour frames via Catalyst's window Expand; with a
    * watermark the state per key is bounded by (watermark / slide) frames.
    * The streaming half of q246's hopping-peak detector: run over a
    * stream, sink the frame aggregates, and the batch top-N over the sink
    * equals the batch q246 plan (HoppingStreamSpec asserts parity).
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1)) * 10000) / lit(10000.0)).as("avg_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("avg_value"))

  def hoppingAggStream(events: DataFrame,
                       watermarkDelay: String = "2 hours"): DataFrame =
    hoppingAgg(events.withWatermark("ts", watermarkDelay))

  /** Streaming exact dedup on a key: state retention is bounded by the
    * watermark (dropDuplicatesWithinWatermark), so duplicate suppression
    * runs forever on an unbounded stream with O(keys-per-watermark-window)
    * state — the streaming counterpart of the batch md5 keep-first dedup.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  def windowedAgg(spark: SparkSession, sfDir: String): DataFrame =
    windowedAgg(Tables.events(spark, sfDir).select(col("ts"), col("event_type"), col("value")))

  /** Live rate-spike monitor — the streaming half of q101: hourly event
    * counts per user (tumbling windows) joined against a FROZEN per-user
    * Poisson baseline (λ from the training period, a static broadcastable
    * table), emitting windows whose z = (c − λ)/√λ clears the bar. The
    * baseline side is stream-static, so no stateful join is needed; the
    * only state is the windowed count aggregation, bounded by the
    * watermark.
    */
  def rateSpikeStream(events: DataFrame, baseline: DataFrame,
                      minZ: Double = 3.0,
                      watermarkDelay: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .join(baseline, "user_id")
      .withColumn("z", (col("c") - col("lambda")) / sqrt(col("lambda")))
      .where(col("z") >= minZ)
      .select(
        unix_timestamp(col("window.start")).as("hour"),
        col("user_id"), col("c"),
        (round(col("z") * 10000) / 10000).as("z"))

  /** Per-user Poisson baseline from a (training) batch: λ = events per
    * active-span hour — the same arithmetic q101 uses.
    */
  def rateBaseline(training: DataFrame): DataFrame =
    training
      .select(col("user_id"),
        (floor(unix_timestamp(col("ts")) / 3600L) * 3600L).cast("long").as("hr"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("total"),
        ((max(col("hr")) - min(col("hr"))) / 3600L + 1L).as("span_hours"))
      .select(col("user_id"),
        (col("total").cast("double") / col("span_hours")).as("lambda"))
}
