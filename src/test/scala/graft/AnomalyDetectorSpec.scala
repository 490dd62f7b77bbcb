package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.ml.AnomalyDetector
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._

class AnomalyDetectorSpec extends SparkSpec {
  import spark.implicits._

  // 40 normal hours of quiet activity for user 1, plus one pathological hour
  private def events = {
    val normal = (0 until 40).flatMap { h =>
      (0 until 3 + h % 3).map { i =>
        (h * 10L + i, Timestamp.valueOf(f"2024-01-0${h / 24 + 1} ${h % 24}%02d:${i * 7}%02d:00"),
          1L, "click", 10.0 + (h % 7) + i * 0.5)
      }
    }
    val burst = (0 until 50).map { i =>
      (1000L + i, Timestamp.valueOf(f"2024-01-03 05:${i % 60}%02d:00"), 1L, "error", 500.0)
    }
    (normal ++ burst).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("kmeans pipeline flags the pathological hour with the top anomaly score") {
    val features = AnomalyDetector.featurize(events)
    // train on the normal period only (reference set_time_periods flow)
    val train = features.where(col("hour") < Timestamp.valueOf("2024-01-03 00:00:00").getTime / 1000)
    val model = AnomalyDetector.fit(train)
    val scored = AnomalyDetector.score(model, features)
    val top = scored.orderBy(col("anomaly_score").desc).select("hour").as[Long].head()
    assert(top === Timestamp.valueOf("2024-01-03 05:00:00").getTime / 1000)
  }

  test("fitted pipeline round-trips through save/load") {
    val features = AnomalyDetector.featurize(events)
    val model = AnomalyDetector.fit(features)
    val dir = Files.createTempDirectory("graft-model").resolve("m").toString
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = AnomalyDetector.score(model, features)
      .select("user_id", "hour", "anomaly_score").collect().toSeq
    val b = AnomalyDetector.score(loaded, features)
      .select("user_id", "hour", "anomaly_score").collect().toSeq
    assert(a === b)
  }
}
