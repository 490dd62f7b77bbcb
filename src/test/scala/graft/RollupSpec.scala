package graft

import java.sql.Timestamp

import graft.ops.{Sketches, TimeSeries}

/** Hand-checkable cases for rolling quantiles and the HLL union rollup. */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  test("rollingQuantiles: full 11-row windows select exact order statistics") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // values 1..15 in time order: at row n the window holds n-10..n, so the
    // median is n-5 and p90 (R-7 rank 9 of 11) is n-1
    val events = (1 to 15).map { i =>
      (i.toLong, ts(i), 1L, "click", i.toDouble, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = TimeSeries.rollingQuantiles(events)
      .orderBy("event_id")
      .select("rn", "roll_med", "roll_p90")
      .as[(Int, Double, Double)].collect().toSeq
    assert(rows === (11 to 15).map(n => (n, n - 5.0, n - 1.0)))
  }

  test("rateSpikes: a burst hour z-scores out, quiet users stay silent") {
    def ts(d: Int, h: Int, m: Int) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:$m%02d:00")
    // user 1: one event per hour for 50 hours, then 40 events in one hour
    val quiet = (0 until 50).map(i => (i.toLong, ts(1 + i / 24, i % 24, 0), 1L, "click", 0.0, ""))
    val burst = (0 until 40).map(i => (100L + i, ts(3, 10, i % 60), 1L, "click", 0.0, ""))
    // user 2: perfectly steady — no spikes at all
    val steady = (0 until 30).map(i => (200L + i, ts(1 + i / 24, i % 24, 0), 2L, "click", 0.0, ""))
    val events = (quiet ++ burst ++ steady)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = TimeSeries.rateSpikes(events)
      .select("user_id", "rn", "c")
      .as[(Long, Int, Long)].collect().toSeq
    assert(rows.map(_._1).distinct === Seq(1L))
    assert(rows.head._3 === 40L) // the burst hour tops user 1's spikes
  }

  test("burstiness: metronome traffic has cv 0, on-off traffic exceeds 1") {
    def at(s: Int) = new Timestamp(1704067200000L + s * 1000L)
    val metronome = (0 until 20).map(i => (i.toLong, at(i * 60), 1L, "c", 0.0, ""))
    // bursts of 5 events 1s apart separated by 1000s silences
    val bursty = (0 until 20).map { i =>
      (100L + i, at(i / 5 * 1000 + i % 5), 2L, "c", 0.0, "")
    }
    val events = (metronome ++ bursty)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = TimeSeries.burstiness(events)
      .orderBy("user_id")
      .select("user_id", "n_gaps", "mean_gap", "cv")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(rows(0) === ((1L, 19L, 60.0, 0.0)))
    assert(rows(1)._4 > 1.5) // on-off arrival is far from Poisson
  }

  test("centroidMargins: nearest centroid and distance are exact on axis clusters") {
    val emb = Seq(
      (0L, Array(0f, 0f), 0), (1L, Array(2f, 0f), 0),   // centroid (1, 0)
      (2L, Array(10f, 0f), 1), (3L, Array(12f, 0f), 1), // centroid (11, 0)
      (4L, Array(0f, 30f), 2)                           // centroid (0, 30)
    ).toDF("vec_id", "embedding", "label")
    val rows = graft.ops.Similarity.centroidMargins(emb)
      .select("label", "nearest_label", "margin")
      .as[(Int, Int, Double)].collect().toSeq.sortBy(_._1)
    assert(rows(0) === ((0, 1, 10.0)))          // (1,0) -> (11,0)
    assert(rows(1) === ((1, 0, 10.0)))
    assert(rows(2)._2 === 0)                    // (0,30) nearest is label 0
    assert(math.abs(rows(2)._3 - math.sqrt(1 + 900)) < 1e-3)
  }

  test("sketchRollup: union of source sketches agrees with corpus distinct") {
    // src0 and src1 share document 'b' — exact per-source distincts are 2+2
    // but the corpus distinct is 3: only a sketch UNION (not a sum) gets it
    val docs = Seq(
      (0L, "doc a", "en", "src0"),
      (1L, "doc b", "en", "src0"),
      (2L, "doc b", "en", "src1"),
      (3L, "doc c", "en", "src1")
    ).toDF("doc_id", "text", "lang", "source")
    val rows = Sketches.sketchRollup(docs)
      .orderBy("source")
      .select("source", "exact_fps", "n_docs", "sketch_ok")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(rows === Seq(
      ("TOTAL", 3L, 4L, true),
      ("src0", 2L, 2L, true),
      ("src1", 2L, 2L, true)))
  }
}
