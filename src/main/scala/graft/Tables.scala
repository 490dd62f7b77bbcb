package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the test star schema (TPC-H-ish + events/documents/embeddings).
  *
  * Plain parquet scans: Catalyst pushes filters and prunes columns into the
  * scan, so callers should select/filter as early as possible and let the
  * optimizer do the rest. At cluster scale these would be partitioned tables;
  * the operators below never assume a physical layout beyond "parquet".
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** The events table's `ts` physical type has varied across testdata
    * generations: nanosecond timestamps (which Spark's parquet reader
    * rejects unless read as raw longs via the legacy conf) and plain
    * microsecond TIMESTAMP/TIMESTAMP_NTZ. Normalize every layout to a
    * session-zone TIMESTAMP so downstream operators see one type. The
    * nanos→micros `div` keeps the arithmetic in exact integer space (a
    * double division would lose precision at 2e18 nanos); the NTZ cast is
    * a wall-clock no-op because every graft session pins UTC.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => // TIMESTAMP_NTZ: reinterpret as UTC instant (session tz is UTC)
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  /** Spread an under-partitioned scan across the cluster. A small parquet
    * file arrives as one split, which would serialize every downstream
    * explode / broadcast-join probe onto one core; at real scale the scan
    * already yields thousands of splits and this is a no-op (no shuffle is
    * added). The check costs only plan construction — no job runs.
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(target / 2, 2)) df.repartition(target) else df
  }

  /** documents/embeddings feed explode- and probe-heavy operators, so they
    * get the spread treatment up front.
    */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spread(spark, load(spark, sfDir, "documents"))
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spread(spark, load(spark, sfDir, "embeddings"))
}
