package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Checkpointed streaming file sink: append-mode parquet output that
  * survives a query stop/restart WITHOUT duplicating batches — Structured
  * Streaming's exactly-once file-sink contract (the sink's transaction log
  * records committed batch ids; a restarted query resumes from the
  * checkpoint and never re-commits a batch). This is the durable landing
  * zone the in-memory test sinks don't exercise.
  */
class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("parquet sink + checkpoint restart is exactly-once") {
    implicit val ctx = spark.sqlContext
    val out = Files.createTempDirectory("graft_sink_out").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString

    val mem = MemoryStream[(Timestamp, Long, Double)]
    def start() = mem.toDF().toDF("ts", "sensor", "value")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val q1 = start()
    try {
      mem.addData((Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 0.5),
                  (Timestamp.valueOf("2024-01-01 00:01:00"), 2L, 1.5))
      q1.processAllAvailable()
    } finally q1.stop()

    assert(spark.read.parquet(out).count() === 2L)

    // restart against the same checkpoint; only NEW data lands
    val q2 = start()
    try {
      mem.addData((Timestamp.valueOf("2024-01-01 00:02:00"), 3L, 2.5))
      q2.processAllAvailable()
    } finally q2.stop()

    val rows = spark.read.parquet(out)
      .as[(Timestamp, Long, Double)].collect().toSeq.sortBy(_._2)
    assert(rows.map(_._2) === Seq(1L, 2L, 3L))
  }
}
