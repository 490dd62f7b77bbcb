package graft

import java.sql.Timestamp

import graft.ops.Attribution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lastTouch picks the most recent in-window click per purchase") {
    val events = Seq(
      (0L, ts("2024-01-01 09:00:00"), 1L, "click"), // outside the 1h window
      (1L, ts("2024-01-01 11:30:00"), 1L, "click"),
      (2L, ts("2024-01-01 11:45:00"), 1L, "click"), // most recent in-window
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase"),
      (4L, ts("2024-01-01 11:50:00"), 2L, "click"), // other user
      (5L, ts("2024-01-01 12:00:00"), 3L, "purchase") // no clicks at all
    ).toDF("event_id", "ts", "user_id", "event_type")
    val rows = Attribution.lastTouch(events)
      .select("purchase_id", "user_id", "click_id", "gap_sec")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq((3L, 1L, 2L, 900L)))
  }

  test("stream-stream interval join pairs purchases with in-window clicks") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val out = Attribution.clickPurchaseJoin(
      clicks.toDF().toDF("event_id", "user_id", "ts"),
      purchases.toDF().toDF("event_id", "user_id", "ts"))
    val q = out.writeStream
      .format("memory").queryName("attrib").outputMode("append").start()
    try {
      clicks.addData(
        (10L, 1L, ts("2024-01-01 09:00:00")), // too early for the purchase
        (11L, 1L, ts("2024-01-01 11:30:00")),
        (12L, 2L, ts("2024-01-01 11:40:00"))) // other user
      purchases.addData((20L, 1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val got = spark.table("attrib")
        .select("purchase_id", "user_id", "click_id", "gap_sec")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got === Seq((20L, 1L, 11L, 1800L)))
    } finally q.stop()
  }
}
