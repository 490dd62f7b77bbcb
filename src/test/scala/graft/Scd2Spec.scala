package graft

import java.sql.Timestamp

import graft.ops.{Curation, Dedup, Ranges}
import org.apache.spark.sql.functions._

/** Hand-checkable cases for the round's interval/histogram/containment ops. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("scd2Intervals: runs collapse, valid_to chains, last interval open") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      (0L, ts(0), 1L, "on", 0.0, ""),
      (1L, ts(1), 1L, "on", 0.0, ""),   // same run as event 0
      (2L, ts(2), 1L, "off", 0.0, ""),  // change
      (3L, ts(3), 1L, "on", 0.0, ""),   // change back: a NEW 'on' interval
      (4L, ts(0), 2L, "on", 0.0, "")    // second user: independent stream
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Ranges.scd2Intervals(events)
      .orderBy("user_id", "seg_n")
      .select("user_id", "seg_n", "event_type", "valid_from", "valid_to", "n_events", "is_current")
      .as[(Long, Long, String, Long, Option[Long], Long, Boolean)].collect().toSeq
    val t0 = ts(0).getTime / 1000
    assert(rows === Seq(
      (1L, 1L, "on", t0, Some(t0 + 120), 2L, false),
      (1L, 2L, "off", t0 + 120, Some(t0 + 180), 1L, false),
      (1L, 3L, "on", t0 + 180, None, 1L, true),
      (2L, 1L, "on", t0, None, 1L, true)))
  }

  test("pointInTimeJoin: a probe near a change resolves to the OLD version") {
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val events = Seq(
      (0L, ts(0), 1L, "v1", 0.0, ""),   // version 1 valid [t0, t0+40min)
      (97L, ts(10), 1L, "v1", 0.0, ""), // probe source: 10min + 30min shift = t0+40min
      (194L, ts(20), 1L, "v1", 0.0, ""), // probe at 20+30 = t0+50min -> v2's window
      (3L, ts(40), 1L, "v2", 0.0, "")   // version 2 from t0+40min, open
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Ranges.pointInTimeJoin(events)
      .orderBy("event_id")
      .select("event_id", "dim_type")
      .as[(Long, String)].collect().toSeq
    // probe 0: t0+30 -> v1 still valid; probe 97: exactly t0+40 -> half-open
    // boundary belongs to v2; probe 194: t0+50 -> v2
    assert(rows === Seq((0L, "v1"), (97L, "v2"), (194L, "v2")))
  }

  test("maintenanceOverlap: range crossing the window counts only inside seconds") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      // user 1: errors 01:30 -> 03:00 (one range, 5400 s; 3600 s in [02,04))
      (0L, ts(1, 30), 1L, "error", 0.0, ""),
      (1L, ts(1, 55), 1L, "error", 0.0, ""),
      (2L, ts(2, 20), 1L, "error", 0.0, ""),
      (3L, ts(2, 45), 1L, "error", 0.0, ""),
      (4L, ts(3, 0), 1L, "error", 0.0, ""),
      // user 2: a range entirely outside maintenance
      (5L, ts(10, 0), 2L, "error", 0.0, ""),
      (6L, ts(10, 10), 2L, "error", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Ranges.maintenanceOverlap(events)
      .orderBy("user_id")
      .select("user_id", "n_ranges", "anom_sec", "maint_sec", "maint_frac")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (1L, 1L, 5400L, 3600L, math.rint(3600.0 / 5400 * 1e4) / 1e4),
      (2L, 1L, 600L, 0L, 0.0)))
  }

  test("lengthHistogram: power-of-2 buckets and cumulative shares") {
    val docs = Seq(
      (0L, "a", "en", "s0"),                    // 1 token  -> bucket 0
      (1L, "a b", "en", "s0"),                  // 2 tokens -> bucket 1
      (2L, "a b c", "en", "s0"),                // 3 tokens -> bucket 1
      (3L, "a b c d e f g h", "en", "s0")       // 8 tokens -> bucket 3
    ).toDF("doc_id", "text", "lang", "source")
    val rows = Curation.lengthHistogram(docs)
      .orderBy("bucket")
      .select("bucket", "bucket_lo", "n_docs", "bucket_tokens", "cum_token_share")
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(rows === Seq(
      (0, 1L, 1L, 1L, math.rint(1.0 / 14 * 1e4) / 1e4),
      (1, 2L, 2L, 5L, math.rint(6.0 / 14 * 1e4) / 1e4),
      (3, 8L, 1L, 8L, 1.0)))
  }

  test("containmentPairs: a short doc inside a long one that Jaccard misses") {
    // A's 3 shingles all appear in B (containment 1.0) but B has 10
    // shingles, so Jaccard is 0.3 — below any sane near-dup threshold.
    val a = "w1 w2 w3 w4 w5"
    val b = "w1 w2 w3 w4 w5 x1 x2 x3 x4 x5 x6 x7"
    val docs = Seq(
      (0L, a, "en", "s0", 0L),
      (1L, b, "en", "s0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.containmentPairs(docs)
      .select("doc_a", "doc_b", "n_sh_a", "n_shared", "containment")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // only the A->B direction survives the 0.8 floor
    assert(rows === Seq((0L, 1L, 3L, 3L, 1.0)))
    // and the symmetric Jaccard path indeed does NOT pair them at 0.5
    assert(Dedup.ngramJaccardPrefix(docs).count() === 0L)
  }

  test("basketLift: session co-membership counts and independence ratio") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      // user 1, session 1: {click, view}; session 2 (gap > 4h): {click}
      (0L, ts(0, 0), 1L, "click", 0.0, ""),
      (1L, ts(0, 30), 1L, "view", 0.0, ""),
      (2L, ts(10, 0), 1L, "click", 0.0, ""),
      // user 2, one session: {view}
      (3L, ts(0, 0), 2L, "view", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Ranges.basketLift(events)
      .select("type_a", "type_b", "c_ab", "c_a", "c_b", "support", "lift")
      .as[(String, String, Long, Long, Long, Double, Double)].collect().toSeq
    // 3 sessions; click in 2, view in 2, together in 1:
    // support 1/3, lift (1*3)/(2*2) = 0.75
    assert(rows === Seq(("click", "view", 1L, 2L, 2L,
      math.rint(1.0 / 3 * 1e4) / 1e4, 0.75)))
  }

  test("sessionPaths: consecutive repeats collapse, paths ranked by frequency") {
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val events = Seq(
      // user 1 session: click,click,view -> "click>view"
      (0L, ts(0, 0), 1L, "click", 0.0, ""),
      (1L, ts(0, 5), 1L, "click", 0.0, ""),
      (2L, ts(0, 10), 1L, "view", 0.0, ""),
      // user 2 session: click,view -> "click>view" (same path)
      (3L, ts(0, 0), 2L, "click", 0.0, ""),
      (4L, ts(0, 5), 2L, "view", 0.0, ""),
      // user 2, second session after the gap: view -> "view"
      (5L, ts(10, 0), 2L, "view", 0.0, "")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Ranges.sessionPaths(events)
      .select("rnk", "path", "n_sessions")
      .as[(Int, String, Long)].collect().toSeq
    assert(rows === Seq((1, "click>view", 2L), (2, "view", 1L)))

    // bot guard: a session alternating forever truncates to maxSteps
    val bot = (0 until 40).map { i =>
      (100L + i, ts(1, i % 60), 9L, if (i % 2 == 0) "click" else "view", 0.0, "")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val capped = Ranges.sessionPaths(bot, maxSteps = 5)
      .select("path").as[String].collect().toSeq
    assert(capped === Seq("click>view>click>view>click"))
  }

  test("containmentPairs: the df cap gates candidates but never the score") {
    // 'h h h' appears in every doc (df 3 > cap 2) so it cannot nominate
    // candidates; docs 0/1 still pair via their rare shared shingles, and
    // the hot shingle still counts in n_shared once they are candidates.
    val docs = Seq(
      (0L, "h h h r1 r2 r3", "en", "s0", 0L),
      (1L, "h h h r1 r2 r3", "en", "s0", 0L),
      (2L, "h h h z1 z2 z3", "en", "s0", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.containmentPairs(docs, maxDf = 2)
      .orderBy("doc_a", "doc_b")
      .select("doc_a", "doc_b", "n_shared")
      .as[(Long, Long, Long)].collect().toSeq
    // 0<->1 pair both directions; 2 shares only hot shingles -> no candidacy
    assert(rows.map(r => (r._1, r._2)) === Seq((0L, 1L), (1L, 0L)))
    // n_shared counts ALL shared shingles including the hot ones
    assert(rows.forall(_._3 === 4L))
  }
}
