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

  /** `anomaly_score` is optional in the wire format: models trained before
    * 2022-03-28 don't emit it (scheduler.py:643-645 checks for the column) —
    * schema'd reads leave it null on score-less lines instead of dropping it.
    */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("prediction", IntegerType),
    StructField("anomaly_score", DoubleType),
    StructField("diagnostics", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("value", DoubleType)))))))

  /** Schema'd JSONL read — one pass, no sampling job. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Long form: (ts, prediction, anomaly_score, sensor, score) — one row per
    * diagnostic. prediction=0 rows carry no diagnostics in the wire format
    * (scheduler.py:647-651 only expands them for prediction=1), so the outer
    * explode keeps them as a single null-sensor row rather than dropping the
    * timestamp from the series.
    */
  def diagnosticsLong(preds: DataFrame): DataFrame =
    preds.select(
      col("timestamp").as("ts"),
      col("prediction"),
      col("anomaly_score"),
      explode_outer(col("diagnostics")).as("d"))
      .select(col("ts"), col("prediction"), col("anomaly_score"),
        col("d.name").as("sensor"), col("d.value").as("score"))

  /** Wide form matching the reference's output frame: one column per sensor
    * name, rows sorted by timestamp; prediction=0 rows keep null sensor
    * columns, and anomaly_score rides along when present. The pivot's column
    * list is collected from a distinct over sensor names (small — it is the
    * sensor inventory).
    */
  def diagnosticsWide(preds: DataFrame): DataFrame =
    diagnosticsLong(preds)
      .groupBy(col("ts"), col("prediction"), col("anomaly_score"))
      .pivot("sensor")
      .agg(first(col("score")))
      .drop("null")
      .orderBy(col("ts"))
}
