package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Shuffle-health observability: the queries an operator of a 100 TB
  * deployment runs BEFORE committing to a join/aggregation strategy.
  */
object Diagnostics {

  /** q62: key-skew census — bucket a prospective shuffle key into
    * `nBuckets` reducer-shaped buckets with a portable salted-md5 hash and
    * report each bucket's load ratio (1.0 = perfectly even). A max ratio
    * near nBuckets means one key owns the shuffle — reach for
    * [[SkewJoin.saltedJoin]], AQE skew handling, or a DF-cap before
    * running the real join. One aggregation, output size = nBuckets
    * regardless of input.
    */
  def keySkew(df: DataFrame, key: String, nBuckets: Int = 32): DataFrame = {
    val bucketed = df
      .select(col(key).cast("string").as("k"))
      .where(col("k").isNotNull)
      .withColumn("h", md5(concat(lit("skew:"), col("k"))))
      .withColumn("u24",
        expr("""CAST(
          (instr('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576 +
          (instr('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536 +
          (instr('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096 +
          (instr('0123456789abcdef', substr(h, 4, 1)) - 1) * 256 +
          (instr('0123456789abcdef', substr(h, 5, 1)) - 1) * 16 +
          (instr('0123456789abcdef', substr(h, 6, 1)) - 1) AS BIGINT)"""))
      .withColumn("bucket", pmod(col("u24"), lit(nBuckets.toLong)).cast("int"))
    val counts = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("total"))
    counts
      .crossJoin(broadcast(total))
      .select(
        col("bucket"), col("n_rows"),
        (round(col("n_rows").cast("double") * nBuckets / col("total") * 10000) / 10000)
          .as("load_ratio"))
  }

  def keySkew(spark: SparkSession, sfDir: String): DataFrame =
    keySkew(Tables.lineitem(spark, sfDir), "l_suppkey")
}
