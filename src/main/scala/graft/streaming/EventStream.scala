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
}
