package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Approximate sketches — the constant-memory aggregates a 100 TB engine
  * reaches for when exact answers don't justify their shuffle width.
  * Estimate VALUES aren't bit-portable across engines, so the query is made
  * self-validating instead: the exact counterpart rides in the same plan and
  * the output asserts the sketch landed within tolerance — a claim the
  * DuckDB oracle CAN check (it expects `true`), so the sketch's accuracy
  * contract is part of the hash compare rather than a blind rows-only count.
  */
object Sketches {

  /** Accept 5× the configured relative standard deviation — far out on the
    * estimator's error distribution, so a pass is meaningful and a failure
    * means the sketch (not luck) is broken.
    */
  val Rsd = 0.02
  val Tolerance = 5 * Rsd

  /** q38: per-type user cardinality — HyperLogLog++ estimate (2% target
    * rsd) validated against the exact distinct riding in the same plan. The
    * sketch aggregates in fixed space per group and merges associatively, so
    * the shuffle carries one sketch per (partition, group) instead of every
    * distinct key; the exact count_distinct expands to a two-phase distinct
    * aggregate.
    */
  def sketchDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"))
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = Rsd).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          / col("exact_users") <= Tolerance).as("sketch_ok"))
}
