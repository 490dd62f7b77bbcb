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
