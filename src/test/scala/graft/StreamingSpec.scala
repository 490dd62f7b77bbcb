package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Batch–streaming parity: the SAME windowedAgg plan, driven incrementally
  * through a MemoryStream across multiple micro-batches, must produce the
  * batch answer (Structured Streaming's contract for windowed aggregations).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val events = Seq(
    (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
    (Timestamp.valueOf("2024-01-01 00:04:00"), "click", 2.0),
    (Timestamp.valueOf("2024-01-01 00:07:00"), "view", 10.0),
    (Timestamp.valueOf("2024-01-01 00:11:00"), "click", 3.0),
    (Timestamp.valueOf("2024-01-01 00:14:00"), "view", 20.0)
  )

  test("windowedAgg over a MemoryStream equals the batch plan") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamed = EventStream.windowedAggStream(
      mem.toDF().toDF("ts", "event_type", "value"))
    val q = streamed.writeStream
      .format("memory").queryName("win_parity").outputMode("complete").start()
    try {
      mem.addData(events.take(3))
      q.processAllAvailable()
      mem.addData(events.drop(3))
      q.processAllAvailable()
      val got = spark.table("win_parity")
        .orderBy("win_start", "event_type")
        .as[(Long, String, Long, Double)].collect().toSeq
      val want = EventStream.windowedAgg(
        events.toDF("ts", "event_type", "value"))
        .orderBy("win_start", "event_type")
        .as[(Long, String, Long, Double)].collect().toSeq
      assert(got === want)
      assert(want.map(_._3).sum === events.size)
    } finally q.stop()
  }

  test("stream-static join enriches the stream before the windowed agg") {
    implicit val ctx = spark.sqlContext
    val tiers = Seq(("click", "cheap"), ("view", "premium")).toDF("event_type", "tier")
    val mem = MemoryStream[(Timestamp, String, Double)]
    val enriched = EventStream.windowedAgg(
      mem.toDF().toDF("ts", "event_type", "value")
        .join(tiers, "event_type")
        .withColumn("event_type", col("tier")).drop("tier"))
    val q = enriched.writeStream
      .format("memory").queryName("tiered").outputMode("complete").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:02:00"), "view", 2.0),
        (Timestamp.valueOf("2024-01-01 00:03:00"), "click", 3.0))
      q.processAllAvailable()
      val got = spark.table("tiered")
        .select("event_type", "n").as[(String, Long)].collect().toMap
      assert(got === Map("cheap" -> 2L, "premium" -> 1L))
    } finally q.stop()
  }

  test("dedupStream suppresses duplicate keys across micro-batches") {
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val deduped = EventStream.dedupStream(
      mem.toDF().toDF("ts", "event_type", "value"), Seq("event_type"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0), // dup key
        (Timestamp.valueOf("2024-01-01 00:03:00"), "view", 3.0))
      q.processAllAvailable()
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:04:00"), "click", 4.0)) // still within watermark
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
        .select("event_type").as[String].collect().sorted
      assert(got.toSeq === Seq("click", "view"))
    } finally q.stop()
  }

  test("rateSpikeStream flags the burst hour against a frozen baseline") {
    implicit val ctx = spark.sqlContext
    def at(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-02 $h%02d:$m%02d:00")
    // training: 1 event/hour for 48 hours -> lambda = 1
    val training = (0 until 48).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-0${i / 24 + 1} ${i % 24}%02d:00:00"), 7L, "click", 0.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val baseline = EventStream.rateBaseline(training)

    val mem = MemoryStream[(Timestamp, Long)]
    val monitored = EventStream.rateSpikeStream(
      mem.toDF().toDF("ts", "user_id"), baseline)
    val q = monitored.writeStream
      .format("memory").queryName("rate_stream").outputMode("append").start()
    try {
      // quiet hour: one event -> z = 0, no alert
      mem.addData((at(5, 0), 7L))
      q.processAllAvailable()
      // burst hour: 25 events -> z = 24, alert; then advance the watermark
      mem.addData((0 until 25).map(i => (at(6, i), 7L)): _*)
      mem.addData((at(10, 0), 7L))
      q.processAllAvailable()
      val got = spark.table("rate_stream")
        .select("hour", "user_id", "c", "z")
        .as[(Long, Long, Long, Double)].collect().toSeq
      assert(got.size === 1)
      assert(got.head._3 === 25L && got.head._4 === 24.0)
      assert(got.head._1 === at(6, 0).getTime / 1000)
    } finally q.stop()
  }
}
