package graft

import java.sql.Timestamp

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Catalyst's native session_window aggregation: batch answer matches the
  * hand-computed sessions, and the same plan under Structured Streaming
  * (append mode, watermark-closed) emits exactly the closed sessions.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two events 100s apart, then one 2900s later (new session);
  // user 2: a singleton
  private val events = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (1L, ts("2024-01-01 00:01:40")),
    (1L, ts("2024-01-01 00:50:00")),
    (2L, ts("2024-01-01 00:00:50"))
  )

  private val expected = Set(
    (1L, ts("2024-01-01 00:00:00").getTime / 1000, 2L),
    (1L, ts("2024-01-01 00:50:00").getTime / 1000, 1L),
    (2L, ts("2024-01-01 00:00:50").getTime / 1000, 1L)
  )

  test("batch session_window matches hand-computed sessions") {
    val got = Sessionize.sessionWindowAgg(events.toDF("user_id", "ts"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("streaming append-mode emits each closed session exactly once") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = Sessionize.sessionWindowAgg(mem.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("sw_sessions")
      .outputMode("append").start()
    try {
      mem.addData(events.take(2))
      q.processAllAvailable()
      mem.addData(events.drop(2))
      q.processAllAvailable()
      // a far-future sentinel advances the watermark past every session end
      mem.addData(Seq((99L, ts("2024-01-01 06:00:00"))))
      q.processAllAvailable()
      val got = spark.table("sw_sessions")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expected) // sentinel's own session is still open
    } finally q.stop()
  }
}
