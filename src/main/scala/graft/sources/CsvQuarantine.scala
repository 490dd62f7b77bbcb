package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Malformed-row-tolerant CSV ingestion with a quarantine census.
  *
  * The reference's ingestion path assumes clean sensor CSVs (schema.py
  * builds the schema, the service rejects bad files wholesale); a 100 TB
  * lake-side ingest can't — a single truncated line must neither kill the
  * job (FAILFAST) nor silently vanish (DROPMALFORMED with no audit).
  * This source gives the production posture: ONE distributed text scan,
  * `from_csv` per line (codegen'd, map-side — no second pass over the
  * data), good rows out as typed columns, bad rows classified and counted.
  *
  * Built on text + `from_csv` rather than the CSV reader's PERMISSIVE
  * `_corrupt_record` because (a) Spark forbids plans that reference only
  * the corrupt column, forcing a cache of the whole input to audit it, and
  * (b) the raw line is needed anyway to classify WHY a row failed —
  * field-count drift (schema evolution upstream) vs type rot (sensor
  * emitting text into a numeric column), which demand different fixes.
  */
object CsvQuarantine {

  /** Parse one directory of headerless CSV text against `schema`.
    * Returns the raw line, the parsed struct, and a per-row verdict.
    * `requiredCols` must be non-null for a row to count as good (the
    * from_csv PERMISSIVE contract nulls exactly the fields that failed).
    */
  def parse(spark: SparkSession, path: String, schema: StructType,
            requiredCols: Seq[String]): DataFrame = {
    val opts = Map("mode" -> "PERMISSIVE")
    val nCols = schema.fields.length
    val anyRequiredNull: Column = requiredCols
      .map(c => col("p").getField(c).isNull)
      .reduce(_ || _)
    spark.read.textFile(path).toDF("line")
      .withColumn("p", from_csv(col("line"), schema, opts))
      .withColumn("n_fields", size(split(col("line"), ",", -1)))
      // field-count drift FIRST: from_csv silently ignores extra trailing
      // fields, so an "extra_fields" row parses clean — it is still schema
      // drift worth quarantining. (Field counting is a raw comma split:
      // exact for unquoted sensor CSVs, the ComponentSource contract.)
      .withColumn("verdict",
        when(col("n_fields") < nCols, "missing_fields")
          .when(col("n_fields") > nCols, "extra_fields")
          .when(!anyRequiredNull, "ok")
          .otherwise("type_mismatch"))
  }

  /** The typed good rows — exactly what a DROPMALFORMED CSV read keeps
    * (the n_fields check restores the reader's extra-field strictness
    * that bare from_csv PERMISSIVE lacks); parity asserted in the spec.
    */
  def goodRows(parsed: DataFrame): DataFrame =
    parsed.where(col("verdict") === "ok").select(col("p.*"))

  /** Quarantine census: one row per failure class with count and the
    * lexicographically-first offending line as the debug example. Tiny
    * output (≤3 rows), map-side combinable.
    */
  def quarantine(parsed: DataFrame): DataFrame =
    parsed.where(col("verdict") =!= "ok")
      .groupBy(col("verdict").as("reason"))
      .agg(count(lit(1)).as("n_rows"), min(col("line")).as("example"))
}
