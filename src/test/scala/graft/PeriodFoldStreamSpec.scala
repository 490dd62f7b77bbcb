package graft

import graft.ops.TimeSeries
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming epoch-folding period monitor: a complete-mode daily-mean
  * aggregate streams into the same fold-scan stage as batch q381 —
  * parity must be EXACT for every micro-batch slicing, including ones that
  * split a day across batches (the daily mean is only final at snapshot
  * time, which complete mode guarantees by re-emitting full groups).
  */
class PeriodFoldStreamSpec extends SparkSpec {
  import spark.implicits._

  /** "weekly": exact 7-day cycle plus a deterministic intra-day pattern;
    * "drift": a slow ramp with no cycle (low share, scan still ranks).
    */
  private def rows: Seq[(String, Long, Double)] = {
    (0 until 56).flatMap { d =>
      (0 until 4).map { i =>
        ("weekly", d * 86400L + i * 3600L,
          Seq(5.0, 1.0, 2.0, 8.0, 3.0, 9.0, 4.0)(d % 7) + 0.1 * i)
      }
    } ++
    (0 until 56).flatMap { d =>
      (0 until 3).map { i =>
        ("drift", d * 86400L + i * 7200L, 1.0 + 0.05 * d + 0.01 * i)
      }
    }
  }

  private def daily(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("day", floor(col("e") / 86400L))
    .groupBy(col("event_type"), col("day"))
    .agg((sum(col("value").cast("decimal(18,6)")).cast("double")
      / count(lit(1))).as("x"))

  test("streamed daily means yield the same period scan as batch across three slicings") {
    implicit val ctx = spark.sqlContext
    val rs = rows
    val batch = TimeSeries.periodFoldFromDaily(
      daily(rs.toDF("event_type", "e", "value")))
      .select("event_type", "n_days", "best_p", "best_share", "second_p", "second_share")
      .as[(String, Long, Int, Option[Double], Int, Option[Double])]
      .collect().sortBy(_._1).toSeq
    // semantics: the weekly series folds perfectly at p=7 (its 14-day
    // harmonic ties and loses on the smaller-p break)
    val weekly = batch.find(_._1 == "weekly").get
    assert(weekly._3 === 7 && weekly._4.contains(1.0) && weekly._5 === 14)

    val slicings = Seq(
      Seq(rs),
      Seq(rs.take(100), rs.slice(100, 280), rs.drop(280)), // splits inside days
      rs.grouped(150).toSeq)
    for ((slices, i) <- slicings.zipWithIndex) {
      assert(slices.flatten.size == rs.size, s"slicing $i drops rows")
      val mem = MemoryStream[(String, Long, Double)]
      val name = s"pf_daily_${i}_${System.nanoTime()}"
      val q = daily(mem.toDF().toDF("event_type", "e", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
        // snapshot the sink table: the fold stage self-joins its input
        // (per-phase vs totals), and a memory-table plan reused on both
        // sides trips Spark's conflicting-reference resolution; pinning the
        // snapshot is also what a monitor reading a live table would do
        val live = TimeSeries.periodFoldFromDaily(spark.table(name).localCheckpoint())
          .select("event_type", "n_days", "best_p", "best_share", "second_p", "second_share")
          .as[(String, Long, Int, Option[Double], Int, Option[Double])]
          .collect().sortBy(_._1).toSeq
        assert(live === batch, s"slicing $i")
      } finally q.stop()
    }
  }
}
