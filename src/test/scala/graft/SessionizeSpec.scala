package graft

import java.sql.Timestamp

import graft.streaming.{ClosedSession, SessionEvent, Sessionize}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming sessionization closes ranges after the gap passes the watermark") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = Sessionize.sessionize(mem.toDS(), gapSec = 1800)
    val q = out.writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 60s apart -> one session [00:00, 00:01]
      mem.addData(
        SessionEvent(1L, ts("2024-01-01 00:00:00")),
        SessionEvent(1L, ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      // a later event advances the watermark far past user 1's gap window
      mem.addData(SessionEvent(2L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // one more batch so the fired timeout's output is committed
      mem.addData(SessionEvent(2L, ts("2024-01-01 02:01:00")))
      q.processAllAvailable()

      val got = spark.table("sessions").as[ClosedSession].collect().toSeq
      val t0 = ts("2024-01-01 00:00:00").getTime / 1000
      assert(got.contains(ClosedSession(1L, t0, t0 + 60, 2)))
      // user 2's session is still open — nothing emitted for it
      assert(!got.exists(_.user_id == 2L))
    } finally q.stop()
  }

  test("in-batch gaps close sessions immediately") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = Sessionize.sessionize(mem.toDS(), gapSec = 60)
    val q = out.writeStream
      .format("memory").queryName("sessions2").outputMode("append").start()
    try {
      val t0 = ts("2024-01-01 00:00:00").getTime / 1000
      mem.addData(
        SessionEvent(7L, ts("2024-01-01 00:00:00")),
        SessionEvent(7L, ts("2024-01-01 00:00:30")),
        SessionEvent(7L, ts("2024-01-01 00:10:00"))) // > 60s gap
      q.processAllAvailable()
      val got = spark.table("sessions2").as[ClosedSession].collect().toSeq
      assert(got === Seq(ClosedSession(7L, t0, t0 + 30, 2)))
    } finally q.stop()
  }

  test("batch sessionization (q79) agrees with the streaming sessionizer") {
    implicit val ctx = spark.sqlContext
    import graft.ops.Ranges
    val evs = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:05:00"), // session 1
      (1L, "2024-01-01 01:00:00"), (1L, "2024-01-01 01:05:00"), // session 2
      (2L, "2024-01-01 00:30:00")) // singleton

    val mem = MemoryStream[SessionEvent]
    val out = Sessionize.sessionize(
      mem.toDS(), gapSec = 600, watermarkDelay = "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("sessions3").outputMode("append").start()
    val streamed =
      try {
        mem.addData(evs.map { case (u, t) => SessionEvent(u, ts(t)) }: _*)
        q.processAllAvailable()
        // flush events push the watermark far past every gap window, then one
        // more batch commits the fired timeouts
        mem.addData(SessionEvent(99L, ts("2024-01-01 10:00:00")))
        q.processAllAvailable()
        mem.addData(SessionEvent(99L, ts("2024-01-01 10:01:00")))
        q.processAllAvailable()
        spark.table("sessions3").as[ClosedSession].collect().toSet
          .filter(_.user_id != 99L)
          .map(c => (c.user_id, c.range_start, c.range_end, c.n_events))
      } finally q.stop()

    val batchDf = evs.zipWithIndex
      .map { case ((u, t), i) => (u, ts(t), i.toLong) }
      .toDF("user_id", "ts", "event_id")
    val batch = Ranges.sessionization(batchDf, gapSec = 600)
      .select("user_id", "start_ep", "end_ep", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(batch === streamed)
  }
}
