package graft

import graft.ops.Drift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming quantile-drift monitor: the live deployment streams per-value
  * phase counts (train/eval tagged against a frozen split) into the same
  * counts→quantile-delta stage batch q140 uses — the drift family's last
  * unstreamed axis (PSI/KS/CvM/energy each have a counts-stage twin; this
  * adds the quantile-delta one). Parity must be EXACT for every micro-batch
  * slicing: the streaming aggregate in complete mode re-emits full counts
  * each trigger and [[Drift.quantileDriftFromCounts]] is a pure function of
  * those counts. The quantile stage is the most order-sensitive of the five
  * (R-7 interpolation between located ranks), so the spec doubles as proof
  * that the count-and-locate engine is insensitive to arrival order.
  */
class QuantileDriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val splitE = 800L

  /** "flat" keeps the same value spread in both phases (deltas ~0);
    * "shift" moves its eval mass up by 50 so d50/d90 are large. Values
    * repeat (ties) and include interpolation-forcing counts (odd/even n).
    */
  private def rows: Seq[(String, Long, Double)] = {
    val train = (0 until 800).flatMap { i =>
      Seq(("flat", i.toLong, (i % 100).toDouble),
        ("shift", i.toLong, (i % 100).toDouble))
    }
    val eval_ = (800 until 1001).flatMap { i =>
      Seq(("flat", i.toLong, (i % 100).toDouble),
        ("shift", i.toLong, 50.0 + (i % 100)))
    }
    train ++ eval_
  }

  private def counts(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("tr", (col("e") < splitE).cast("long"))
    .groupBy(col("event_type"), col("value"))
    .agg(sum(col("tr")).as("ca"), sum(lit(1L) - col("tr")).as("cb"))

  test("streamed phase counts yield the same quantile deltas as batch " +
       "across three slicings") {
    implicit val ctx = spark.sqlContext
    val rs = rows
    val batch = Drift.quantileDriftFromCounts(
        counts(rs.toDF("event_type", "e", "value")))
      .select("event_type", "p50_train", "p90_train", "p50_eval",
        "p90_eval", "d50", "d90")
      .as[(String, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    // semantics: the shifted series shows the +50 medians, flat stays ~0
    val sh = batch.find(_._1 == "shift").get
    val fl = batch.find(_._1 == "flat").get
    assert(sh._6 > 40.0, s"shift d50 should be large, got ${sh._6}")
    assert(math.abs(fl._6) < 5.0, s"flat d50 should be small, got ${fl._6}")

    val slicings = Seq(
      Seq(rs),
      Seq(rs.take(400), rs.slice(400, 1600), rs.drop(1600)), // splits inside train AND eval
      rs.grouped(700).toSeq)                                 // uneven tail batch
    for ((slices, i) <- slicings.zipWithIndex) {
      assert(slices.flatten.size == rs.size, s"slicing $i drops rows")
      val mem = MemoryStream[(String, Long, Double)]
      val name = s"qd_counts_${i}_${System.nanoTime()}"
      val q = counts(mem.toDF().toDF("event_type", "e", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try {
        slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
        val live = Drift.quantileDriftFromCounts(spark.table(name))
          .select("event_type", "p50_train", "p90_train", "p50_eval",
            "p90_eval", "d50", "d90")
          .as[(String, Double, Double, Double, Double, Double, Double)]
          .collect().sortBy(_._1).toSeq
        assert(live === batch, s"slicing $i")
      } finally q.stop()
    }
  }

  test("quantile-delta stage is arrival-order independent: reversed and " +
       "shuffled count rows give identical deltas") {
    val rs = rows
    val base = counts(rs.toDF("event_type", "e", "value")).collect().toSeq
    def qd(rows: Seq[org.apache.spark.sql.Row]) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 7),
        base.head.schema)
      Drift.quantileDriftFromCounts(df)
        .select("event_type", "d50", "d90")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    }
    assert(qd(base.reverse) === qd(base))
    assert(qd(scala.util.Random.shuffle(base)) === qd(base))
  }

  test("a series with an empty phase is excluded, never a crash " +
       "(the ksFromCounts contract)") {
    // "late" first appears after the split: no train rows -> no delta row
    val rs = rows ++ (800 until 900).map(i => ("late", i.toLong, 1.0))
    val out = Drift.quantileDriftFromCounts(
      counts(rs.toDF("event_type", "e", "value")))
    assert(!out.select("event_type").as[String].collect().contains("late"))
    assert(out.count() === 2)
  }
}
