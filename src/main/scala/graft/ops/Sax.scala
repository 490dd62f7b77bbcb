package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SAX symbolization (Lin et al. 2003, "A Symbolic Representation of Time
  * Series") — PAA-reduce a series to per-hour means, z-normalize, bin into
  * a 4-letter alphabet at the standard-normal quartile breakpoints, and
  * census the 3-symbol motif words. Motif frequency is the cheap
  * "recurring shape" detector a 100 TB sensor fleet can actually afford:
  * after the one per-hour aggregation everything runs on |series|×|hours|
  * rows, and the per-series moment pass is the same decimal-snapped
  * one-scan reduction the rest of the repo uses.
  */
object Sax {

  /** Standard-normal quartile breakpoints for alphabet size 4. */
  private val B = 0.6744897501960817

  /** q228: top-5 SAX motif words per series. The word packs three
    * consecutive hourly symbols as s₀·16 + s₁·4 + s₂ (0..63); gaps in the
    * hour grid are documented as adjacency (PAA frames are consecutive
    * OBSERVED hours), which keeps the plan one window pass instead of a
    * grid fill-in.
    */
  def saxMotifs(events: DataFrame, topN: Int = 5): DataFrame = {
    val hourly = events
      .select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)").as("h"),
        col("value"))
      .groupBy(col("event_type"), col("h"))
      .agg((round((sum(col("value").cast("decimal(18,6)")).cast("double")
        / count(lit(1))) * lit(1e12)) / lit(1e12)).as("m"))
    val mom = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"),
        sum(col("m").cast("decimal(28,12)")).cast("double").as("s1"),
        sum((col("m") * col("m")).cast("decimal(28,12)"))
          .cast("double").as("s2"))
      .withColumn("mu", col("s1") / col("nh").cast("double"))
      .withColumn("sd",
        sqrt((col("s2") - col("nh").cast("double") * col("mu") * col("mu"))
          / (col("nh") - 1).cast("double")))
      .select(col("event_type"), col("mu"), col("sd"))
    val sym = hourly.join(broadcast(mom), Seq("event_type"))
      .withColumn("z", (col("m") - col("mu")) / col("sd"))
      .withColumn("s",
        when(col("z") < -B, 0).when(col("z") < 0, 1)
          .when(col("z") < B, 2).otherwise(3))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val words = sym
      .withColumn("s1n", lead(col("s"), 1).over(ord))
      .withColumn("s2n", lead(col("s"), 2).over(ord))
      .where(col("s2n").isNotNull)
      .select(col("event_type"),
        (col("s") * 16 + col("s1n") * 4 + col("s2n")).as("word"))
    val wTop = Window.partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("word"))
    words.groupBy(col("event_type"), col("word"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rnk", row_number().over(wTop))
      .where(col("rnk") <= topN)
      .select(col("event_type"), col("rnk"), col("word"), col("n"))
  }

  def saxMotifs(spark: SparkSession, sfDir: String): DataFrame =
    saxMotifs(Tables.events(spark, sfDir))

  /** q407: SAX discords — the motif census inverted: the RAREST words per
    * series, with the hour each first occurs. A motif says "this shape
    * recurs"; a discord says "this shape happened almost never" — the
    * classic symbolic anomaly-candidate detector (Keogh's HOT SAX
    * insight reduced to the word census already computed for q228: the
    * least frequent word IS the subsequence most unlike the rest at
    * symbol resolution). Same one-window, one-aggregate plan as q228 —
    * the discord list costs nothing beyond an ascending rank and a
    * min(h) rider; first_h is the dispatcher's pointer into the raw
    * series.
    */
  def saxDiscords(events: DataFrame, topN: Int = 5): DataFrame = {
    val hourly = events
      .select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)").as("h"),
        col("value"))
      .groupBy(col("event_type"), col("h"))
      .agg((round((sum(col("value").cast("decimal(18,6)")).cast("double")
        / count(lit(1))) * lit(1e12)) / lit(1e12)).as("m"))
    val mom = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"),
        sum(col("m").cast("decimal(28,12)")).cast("double").as("s1"),
        sum((col("m") * col("m")).cast("decimal(28,12)"))
          .cast("double").as("s2"))
      .withColumn("mu", col("s1") / col("nh").cast("double"))
      .withColumn("sd",
        sqrt((col("s2") - col("nh").cast("double") * col("mu") * col("mu"))
          / (col("nh") - 1).cast("double")))
      .select(col("event_type"), col("mu"), col("sd"))
    val sym = hourly.join(broadcast(mom), Seq("event_type"))
      .withColumn("z", (col("m") - col("mu")) / col("sd"))
      .withColumn("s",
        when(col("z") < -B, 0).when(col("z") < 0, 1)
          .when(col("z") < B, 2).otherwise(3))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val words = sym
      .withColumn("s1n", lead(col("s"), 1).over(ord))
      .withColumn("s2n", lead(col("s"), 2).over(ord))
      .where(col("s2n").isNotNull)
      .select(col("event_type"), col("h"),
        (col("s") * 16 + col("s1n") * 4 + col("s2n")).as("word"))
    val wRare = Window.partitionBy(col("event_type"))
      .orderBy(col("n"), col("word"))
    words.groupBy(col("event_type"), col("word"))
      .agg(count(lit(1)).as("n"), min(col("h")).as("first_h"))
      .withColumn("rnk", row_number().over(wRare))
      .where(col("rnk") <= topN)
      .select(col("event_type"), col("rnk"), col("word"), col("n"),
        col("first_h"))
  }

  def saxDiscords(spark: SparkSession, sfDir: String): DataFrame =
    saxDiscords(Tables.events(spark, sfDir))
}
