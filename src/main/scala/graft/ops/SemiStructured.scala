package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Semi-structured payloads, higher-order array pipelines, and the long
  * tail of SQL window functions — the "everything else a warehouse query
  * surface needs" module.
  */
object SemiStructured {

  private def r6(c: org.apache.spark.sql.Column) =
    round(c * lit(1000000)) / lit(1000000.0)

  /** q230: schema-on-read over the JSON `props` blob — `from_json` with a
    * declared struct (codegen'd Jackson parse, NOT a regex scrape like
    * q09's quick extraction) and per-(series, payload-bucket) profiling of
    * the extracted field against the metric value. The parse happens in
    * the scan projection; the aggregate is the usual decimal-snapped
    * one-pass reduction. At 100 TB schema-on-read beats a pre-flattening
    * ETL hop whenever the payload schema is still evolving.
    */
  def jsonProps(events: DataFrame): DataFrame = {
    val parsed = events
      .select(col("event_type"), col("value"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .withColumn("k_bucket", (col("k") / lit(10)).cast("int") * 10)
    parsed.groupBy(col("event_type"), col("k_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"),
        (round(sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1)) * lit(10000)) / lit(10000.0)).as("avg_value"))
  }

  def jsonProps(spark: SparkSession, sfDir: String): DataFrame =
    jsonProps(Tables.events(spark, sfDir))

  /** q231: per-vector profile via higher-order array functions — L1 norm
    * (an exact-decimal `aggregate` fold, so the result is independent of
    * any evaluation order), L∞ via transform+array_max, and sign census
    * via filter+size. No explode: the whole profile evaluates inside one
    * codegen'd projection per row, which is the point — at 100 TB the
    * explode alternative would 64× the row count through the shuffle-free
    * stage for nothing.
    */
  def vectorProfile(emb: DataFrame): DataFrame = {
    emb.select(col("vec_id"), col("label"),
        expr("size(embedding)").as("dim"),
        expr("CAST(aggregate(embedding, CAST(0 AS DECIMAL(28,12)), " +
          "(acc, x) -> CAST(acc + CAST(abs(CAST(x AS DOUBLE)) " +
          "AS DECIMAL(28,12)) AS DECIMAL(28,12))) AS DOUBLE)").as("l1"),
        expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
          .as("linf"),
        expr("size(filter(embedding, x -> x > 0))").as("n_pos"))
      .select(col("vec_id"), col("label"), col("dim"),
        r6(col("l1")).as("l1"),
        r6(col("linf")).as("linf"),
        col("n_pos"),
        r6(col("l1") / col("dim").cast("double")).as("mean_abs"))
  }

  def vectorProfile(spark: SparkSession, sfDir: String): DataFrame =
    vectorProfile(Tables.embeddings(spark, sfDir))

  /** q232: the window-function long tail — percent_rank, first_value, and
    * nth_value(3) per user over the event-time order, with explicit ROWS
    * frames so both engines bind the identical frame. Completes the q45
    * suite (ntile/lag/lead/cume_dist); together every rank/value window
    * function the engine exposes is oracle-checked.
    */
  def windowTail(events: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("e"), col("event_id"))
    val frame = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_timestamp(col("ts")).as("e"))
      .withColumn("pr", percent_rank().over(ord))
      .withColumn("first_val", first(col("value")).over(frame))
      .withColumn("third_val", nth_value(col("value"), 3).over(frame))
      .select(col("user_id"), col("event_id"),
        r6(col("pr")).as("pr"),
        round(col("first_val"), 4).as("first_val"),
        round(col("third_val"), 4).as("third_val"))
  }

  def windowTail(spark: SparkSession, sfDir: String): DataFrame =
    windowTail(Tables.events(spark, sfDir))
}
