package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate sketches — the constant-memory aggregates a 100 TB engine
  * reaches for when exact answers don't justify their shuffle width.
  * Estimates aren't bit-portable across engines, so these queries carry no
  * SQL oracle (rows-only check); the exact counterpart rides along in the
  * same plan to expose the observed error.
  */
object Sketches {

  /** q38: per-type user cardinality — HyperLogLog++ estimate (2% target
    * rsd) beside the exact distinct. The sketch aggregates in fixed space
    * per group and merges associatively, so the shuffle carries one sketch
    * per (partition, group) instead of every distinct key; the exact
    * count_distinct expands to a two-phase distinct aggregate.
    */
  def sketchDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
}
