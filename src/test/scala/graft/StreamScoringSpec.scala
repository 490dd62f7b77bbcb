package graft

import java.sql.Timestamp

import graft.ml.AnomalyDetector
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Live inference: the fitted anomaly pipeline scores a STREAM of feature
  * windows with the exact same code path as batch (model.transform + the
  * centroid-distance column are stateless maps, so Structured Streaming
  * accepts the plan in append mode with no watermark). This is the
  * scheduler-loop half of the reference: train once, then score each new
  * inference window as it arrives.
  */
class StreamScoringSpec extends SparkSpec {
  import spark.implicits._

  test("streaming scores equal batch scores for the same feature windows") {
    // train on quiet hours, then score a mix of quiet + pathological windows
    val normal = (0 until 30).map { h =>
      (1L, h * 3600L, 3.0 + h % 3, 10.0 + h % 7, 12.0 + h % 5, 0.0)
    }
    val burst = Seq((1L, 200 * 3600L, 50.0, 500.0, 500.0, 50.0))
    val cols = Seq("user_id", "hour", "n_events", "mean_value", "max_value", "n_errors")
    val train = normal.toDF(cols: _*)
    val toScore = (normal.take(5) ++ burst).toDF(cols: _*)

    val model = AnomalyDetector.fit(train)
    val batch = AnomalyDetector.score(model, toScore)
      .select("user_id", "hour", "anomaly_score")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._2)

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Double, Double, Double)]
    val streamed = AnomalyDetector.score(model, mem.toDF().toDF(cols: _*))
      .select("user_id", "hour", "anomaly_score")
    val q = streamed.writeStream
      .format("memory").queryName("score_parity").outputMode("append").start()
    try {
      mem.addData(normal.take(5))
      q.processAllAvailable()
      mem.addData(burst) // second micro-batch: scoring is stateless per row
      q.processAllAvailable()
      val got = spark.table("score_parity")
        .as[(Long, Long, Double)].collect().toSeq.sortBy(_._2)
      assert(got === batch)
      // the pathological window still tops the ranking on the stream
      assert(got.maxBy(_._3)._2 === 200 * 3600L)
    } finally q.stop()
  }
}
