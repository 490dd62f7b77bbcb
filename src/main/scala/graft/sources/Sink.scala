package graft.sources

import org.apache.spark.sql.DataFrame

/** Output layout helpers — the write side of the engine.
  *
  * The canonical long sensor table lands as parquet partitioned by
  * component: partition pruning then makes every per-component read
  * (inference extraction, per-machine dashboards) touch only its own
  * directory, and the in-file sort by (sensor, ts) gives parquet min/max
  * row-group statistics that prune time-range scans within a partition.
  * At 100 TB this layout — not any operator — is what turns "scan the
  * fleet" into "scan one machine's month".
  */
object Sink {

  /** Write long-format data partitioned by component, sorted within files
    * by (sensor, ts). `sortWithinPartitions` is a local sort — no shuffle
    * beyond what partitionBy itself does.
    */
  def writePartitioned(long: DataFrame, path: String, mode: String = "overwrite"): Unit =
    long
      .sortWithinPartitions("component", "sensor", "ts")
      .write
      .mode(mode)
      .partitionBy("component")
      .parquet(path)

  /** Read back with partition pruning: a component predicate resolves at
    * planning time to a directory listing, not a data scan.
    */
  def readPartitioned(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
