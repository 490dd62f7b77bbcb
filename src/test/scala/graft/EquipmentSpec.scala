package graft

import java.sql.Timestamp

import graft.api.Equipment
import org.apache.spark.sql.functions._

class EquipmentSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // one component, two sensors, one reading per minute for 20 minutes;
  // s1 jumps from ~1 to ~100 at minute 10, s2 stays flat
  private def long = (0 until 20).flatMap { i =>
    val t = ts(f"2024-01-01 00:$i%02d:00")
    Seq(
      ("pump", "s1", t, if (i < 10) 1.0 + i * 0.01 else 100.0 + i),
      ("pump", "s2", t, 5.0))
  }.toDF("component", "sensor", "ts", "value")

  test("samplingRateSeconds parses the reference's ISO-8601 vocabulary") {
    assert(Equipment.samplingRateSeconds("PT5M") === 300L)
    assert(Equipment.samplingRateSeconds("PT1H") === 3600L)
    assert(Equipment.samplingRateSeconds("PT30S") === 30L)
  }

  test("resample buckets each series at the target rate") {
    val r = Equipment.resample(long, "PT10M")
    assert(r.count() === 4) // 2 sensors x 2 buckets
    val s2 = r.where($"sensor" === "s2").select("avg_value").as[Double].collect()
    assert(s2.toSeq === Seq(5.0, 5.0))
  }

  test("applyOffCondition drops all sensors at off timestamps") {
    // machine off when s1 < 50 → first 10 minutes are off
    val on = Equipment.applyOffCondition(long, "s1 < 50")
    assert(on.count() === 20) // 10 on-minutes x 2 sensors
    assert(on.agg(min(unix_timestamp($"ts"))).as[Long].head()
      === ts("2024-01-01 00:10:00").getTime / 1000)
  }

  test("timeSplit tags rows by configured periods") {
    val p = Equipment.TimePeriods(
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:09:00"),
      ts("2024-01-01 00:10:00"), ts("2024-01-01 00:19:00"))
    val counts = Equipment.timeSplit(long, p)
      .groupBy("phase").count().as[(String, Long)].collect().toMap
    assert(counts === Map("train" -> 20L, "eval" -> 20L))
  }

  test("prepareInferenceData re-indexes windows onto a relative base") {
    val r = Equipment.prepareInferenceData(
      long, ts("2024-01-01 00:10:00"), numSequences = 2, frequencyMin = 5)
    val seqs = r.groupBy("seq").count().as[(Int, Long)].collect().toMap
    assert(seqs === Map(0 -> 10L, 1 -> 10L)) // 5 min x 2 sensors each
    val rel = r.where($"seq" === 1).select("rel_ts").distinct()
      .as[Long].collect().sorted
    assert(rel.toSeq === Seq(0L, 60L, 120L, 180L, 240L))
  }

  test("rangesToFlags overlays predicted and known ranges, known wins") {
    val t0 = ts("2024-01-01 00:00:00").getTime / 1000
    val predicted = Seq((t0 + 600, t0 + 780)).toDF("range_start", "range_end") // 00:10-00:13
    val known = Seq((t0 + 720, t0 + 900)).toDF("range_start", "range_end")     // 00:12-00:15
    val f = Equipment.rangesToFlags(long.where($"sensor" === "s1"), predicted, known)
    val byTs = f.select("ts_epoch", "flag").as[(Long, Int)].collect().toMap
    assert(byTs(t0 + 540) === 0)
    assert(byTs(t0 + 600) === 1)
    assert(byTs(t0 + 720) === 2) // overlap → known wins
    assert(byTs(t0 + 840) === 2)
    assert(byTs(t0 + 960) === 0)
  }

  test("pointsToRanges inverts rangesToFlags up to the gap") {
    val t0 = ts("2024-01-01 00:00:00").getTime / 1000
    val predicted = Seq((t0 + 600, t0 + 780)).toDF("range_start", "range_end")
    val flagged = Equipment.rangesToFlags(
      long.where($"sensor" === "s1"), predicted,
      Seq.empty[(Long, Long)].toDF("range_start", "range_end"))
    val ranges = Equipment.pointsToRanges(flagged, gapSec = 60)
      .select("range_start", "range_end", "n_points").as[(Long, Long, Long)].collect()
    assert(ranges.toSeq === Seq((t0 + 600, t0 + 780, 4L)))
  }

  test("rankSensors puts the shifted sensor first") {
    val t0 = ts("2024-01-01 00:00:00").getTime / 1000
    val anomalies = Seq((t0 + 600, t0 + 1140)).toDF("range_start", "range_end")
    val ranked = Equipment.rankSensors(long, anomalies)
    val top = Equipment.getRankedList(ranked, 1)
      .select("sensor").as[String].head()
    assert(top === "s1") // s1's distribution shifts inside the anomaly, s2 is flat
  }

  test("generateReplayData shifts a history slice onto a new clock") {
    val replay = Equipment.generateReplayData(
      long, ts("2024-01-01 00:05:00"), ts("2025-06-01 00:00:00"), "PT5M", replayDays = 1)
    // minutes 5..19 of both sensors survive the slice
    assert(replay.count() === 30)
    val t0 = ts("2025-06-01 00:00:00").getTime / 1000
    val buckets = replay.select("split_start").distinct().as[Long].collect().sorted
    assert(buckets.toSeq === Seq(t0, t0 + 300, t0 + 600))
    val firstShift = replay.agg(min($"ts_shifted")).as[Long].head()
    assert(firstShift === t0)

    val empty = Equipment.emptyReplaySequences(replay, ts("2025-06-01 00:00:00"), "PT5M")
    // one day of 5-min buckets = 288; only the first 3 have data
    assert(empty.count() === 285)
  }

  test("nextTimeRange returns the latest fully-elapsed bucket") {
    val (s, e) = Equipment.nextTimeRange(ts("2024-01-01 10:07:30"), 5)
    assert(s === ts("2024-01-01 10:00:00"))
    assert(e === ts("2024-01-01 10:05:00"))
  }
}
