package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins.
  *
  * Writing both sides of a recurring join bucketed by the join key with the
  * SAME bucket count pre-shuffles the data once at write time: every
  * subsequent join between them satisfies its distribution requirement
  * straight off the scan, so the exchange disappears from the plan — at
  * 100 TB that's the recurring ETL join's shuffle amortized to zero.
  * BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, tableName: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Join two same-bucketing tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
