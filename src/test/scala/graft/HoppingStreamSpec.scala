package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class HopEv(ts: Timestamp, event_type: String, value: Double)

/** Streaming hopping-window aggregation equals the batch hopping plan on
  * the same rows — every event lands in exactly four overlapping frames
  * and counts agree across micro-batch slicings.
  */
class HoppingStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000L - (1700000000L % 900)
  private def ev(sec: Long, t: String, v: Double) =
    HopEv(new Timestamp((base + sec) * 1000), t, v)

  test("streaming hopping agg matches the batch plan across batches") {
    implicit val ctx = spark.sqlContext
    val r1 = Seq(ev(0, "a", 1.0), ev(600, "a", 3.0), ev(100, "b", 5.0))
    val r2 = Seq(ev(1200, "a", 5.0), ev(1800, "b", 7.0))
    val mem = MemoryStream[HopEv]
    val q = EventStream.hoppingAggStream(mem.toDF()).writeStream
      .format("memory").queryName("hop").outputMode("complete").start()
    try {
      mem.addData(r1: _*); q.processAllAvailable()
      mem.addData(r2: _*); q.processAllAvailable()
      val got = spark.table("hop")
        .orderBy(col("event_type"), col("win_start"))
        .as[(Long, String, Long, Double)].collect().toSeq
        .map { case (w, t, n, a) => (t, w, n, a) }
      val batch = EventStream.hoppingAgg((r1 ++ r2).toDF())
        .orderBy(col("event_type"), col("win_start"))
        .as[(Long, String, Long, Double)].collect().toSeq
        .map { case (w, t, n, a) => (t, w, n, a) }
      assert(got === batch)
      // every event contributes to exactly 4 frames
      val totalMembership = got.map(_._3).sum
      assert(totalMembership == 4L * (r1.size + r2.size))
    } finally q.stop()
  }
}
