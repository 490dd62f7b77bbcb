package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Inference-output (JSONL) parsing.
  *
  * The reference's scheduler writes one JSON object per line with the shape
  * {{{ {"timestamp": "...", "prediction": 0|1,
  *      "diagnostics": [{"name": "component\sensor", "value": 0.12}, ...]} }}}
  * and `get_predictions` (scheduler.py:598-662) parses those lines, expands
  * the diagnostics name/value list into wide per-sensor columns, and sorts
  * by timestamp.
  *
  * Spark-first: the JSONL is read with an explicit schema (no inference
  * pass over the data), diagnostics explode into long rows — the layout that
  * scales and that the ranking operators consume directly — and the wide
  * view is a pivot whose column set comes from a tiny distinct-names
  * aggregate (bounded by the sensor count, not the row count).
  */
object Predictions {

  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("prediction", IntegerType),
    StructField("diagnostics", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("value", DoubleType)))))))

  /** Schema'd JSONL read — one pass, no sampling job. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Long form: (ts, prediction, sensor, score) — one row per diagnostic. */
  def diagnosticsLong(preds: DataFrame): DataFrame =
    preds.select(
      col("timestamp").as("ts"),
      col("prediction"),
      explode(col("diagnostics")).as("d"))
      .select(col("ts"), col("prediction"),
        col("d.name").as("sensor"), col("d.value").as("score"))

  /** Wide form matching the reference's output frame: one column per sensor
    * name, rows sorted by timestamp. The pivot's column list is collected
    * from a distinct over sensor names (small — it is the sensor inventory).
    */
  def diagnosticsWide(preds: DataFrame): DataFrame =
    diagnosticsLong(preds)
      .groupBy(col("ts"), col("prediction"))
      .pivot("sensor")
      .agg(first(col("score")))
      .orderBy(col("ts"))
}
