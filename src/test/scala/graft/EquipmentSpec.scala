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

  test("rankSensors density divides by bin width (np.histogram density=True parity)") {
    // Two sensors whose value envelopes differ 100×. The narrow sensor's
    // count-shape shift is the LARGER one after density normalization
    // (1/width dominates), while raw count/total ratios would rank the wide
    // sensor first — the reference feeds np.histogram(density=True) into
    // wasserstein_distance, so the narrow sensor must win.
    val t0 = "2024-01-01 00:"
    def rows(sensor: String, minute: Int, v: Double, n: Int) =
      (0 until n).map(i => ("pump", sensor, ts(f"$t0$minute%02d:$i%02d"), v))
    val data = (
      // narrow [0,1]: normal 5×0 + 5×1, anomalous 7×0 + 3×1
      rows("narrow", 0, 0.0, 5) ++ rows("narrow", 1, 1.0, 5) ++
        rows("narrow", 10, 0.0, 7) ++ rows("narrow", 11, 1.0, 3) ++
        // wide [0,100]: normal 5×0 + 5×100, anomalous 10×0 (stronger count shift)
        rows("wide", 0, 0.0, 5) ++ rows("wide", 1, 100.0, 5) ++
        rows("wide", 10, 0.0, 10)
      ).toDF("component", "sensor", "ts", "value")
    val t10 = ts("2024-01-01 00:10:00").getTime / 1000
    val t19 = ts("2024-01-01 00:19:00").getTime / 1000
    val anomalies = Seq((t10, t19)).toDF("range_start", "range_end")
    val ranked = Equipment.rankSensors(data, anomalies)
      .orderBy($"rank").select("sensor").as[String].collect()
    assert(ranked.toSeq === Seq("narrow", "wide"))
  }

  test("histogramComparison: shared envelope, density=True normalization per series") {
    // a in [0,10] (uniform over 10 points), b concentrated at 0 — shared
    // bins must span the COMBINED envelope and each series' densities must
    // integrate to 1 (Σ d·width = 1), the np.histogram(density=True)
    // contract of plot.py:795-857
    val a = (0 until 10).map(i => i.toDouble).toDF("value")
    val b = Seq(0.0, 0.0, 0.0, 0.0).toDF("value")
    val h = Equipment.histogramComparison(a, b, numBins = 9)
    val rows = h.select("bin", "bin_start", "bin_end", "density_a", "density_b")
      .as[(Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.length === 9)
    assert(rows.head._2 === 0.0 && rows.last._3 === 9.0) // combined [0,9]
    val width = 1.0
    assert(math.abs(rows.map(_._4).sum * width - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._5).sum * width - 1.0) < 1e-9)
    // all of b lands in bin 0; a is uniform except the closed last bin
    assert(rows.head._5 === 1.0 && rows.tail.forall(_._5 === 0.0))
    assert(rows.head._4 === 0.1 && rows.last._4 === 0.2)
  }

  test("buildEvaluationReport renders the ranked Wasserstein table (evaluation.py:315-478 content)") {
    val t0 = ts("2024-01-01 00:00:00").getTime / 1000
    val anomalies = Seq((t0 + 600, t0 + 1140)).toDF("range_start", "range_end")
    val md = Equipment.buildEvaluationReport(
      Equipment.rankSensors(long, anomalies), maxPlots = 12)
    assert(md.contains("**SIGNAL RANKING"))
    assert(md.contains("| rank | component | sensor | distance |"))
    // s1 (the shifted sensor) ranks first; s2 present; rank order is the line order
    val tableLines = md.linesIterator.filter(_.startsWith("| 1 |")).toSeq
    assert(tableLines.size === 1 && tableLines.head.contains("| s1 |"))
    assert(md.linesIterator.count(_.matches("\\| \\d+ \\|.*")) === 2)
    // renders through the existing builder to styled HTML
    val html = graft.api.MarkdownHtml.render(md)
    assert(html.contains("<strong>SIGNAL RANKING") && html.contains("<th>distance</th>"))
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

  test("nextTimeRange returns the current bucket with inclusive end (scheduler.py parity)") {
    val (s, e) = Equipment.nextTimeRange(ts("2024-01-01 10:07:30"), 5)
    assert(s === ts("2024-01-01 10:05:00"))
    assert(e === ts("2024-01-01 10:09:59"))
  }

  test("nextTimeRange with a half-hour-offset timezone floors on the LOCAL hour") {
    // 10:47:30 UTC = 16:17:30 IST; hourly schedule must floor to 16:00 IST
    // (= 10:30 UTC) — UTC flooring would wrongly select the 10:00 bucket
    val utc = (s: String) => Timestamp.from(java.time.Instant.parse(s))
    val (s, e) = Equipment.nextTimeRange(utc("2024-01-01T10:47:30Z"), 60,
      java.time.ZoneId.of("Asia/Kolkata"))
    assert(s === utc("2024-01-01T10:30:00Z"))
    assert(e === utc("2024-01-01T11:29:59Z"))
  }

  test("nextTimeRange buckets stay contiguous across a DST spring-forward") {
    val utc = (s: String) => Timestamp.from(java.time.Instant.parse(s))
    val ny = java.time.ZoneId.of("America/New_York")
    // 2024-03-10: 02:00 EST jumps to 03:00 EDT. Last pre-jump bucket:
    val (s1, e1) = Equipment.nextTimeRange(utc("2024-03-10T06:30:00Z"), 60, ny) // 01:30 EST
    assert(s1 === utc("2024-03-10T06:00:00Z")) // 01:00 EST
    assert(e1 === utc("2024-03-10T06:59:59Z")) // 01:59:59 EST
    // First post-jump bucket (02:xx local does not exist):
    val (s2, e2) = Equipment.nextTimeRange(utc("2024-03-10T07:30:00Z"), 60, ny) // 03:30 EDT
    assert(s2 === utc("2024-03-10T07:00:00Z")) // 03:00 EDT
    assert(e2 === utc("2024-03-10T07:59:59Z")) // 03:59:59 EDT
    // together the two buckets cover UTC without gap or overlap
    assert(e1.getTime + 1000L === s2.getTime)
  }

  test("nextTimeRange UTC overload is the zone variant at ZoneOffset.UTC") {
    val (s1, e1) = Equipment.nextTimeRange(ts("2024-01-01 10:07:30"), 5)
    val (s2, e2) = Equipment.nextTimeRange(ts("2024-01-01 10:07:30"), 5,
      java.time.ZoneOffset.UTC)
    assert(s1 === s2 && e1 === e2)
  }

  test("readLabels: headerless CSV -> flags -> rank round-trip (known=2 wins)") {
    // the reference's labels file: two headerless timestamp columns
    val dir = java.nio.file.Files.createTempDirectory("labels").toFile
    val f = new java.io.File(dir, "labels.csv")
    val w = new java.io.PrintWriter(f)
    w.println("2024-01-01 00:12:00,2024-01-01 00:15:00")
    w.println("2024-01-01 00:04:00,2024-01-01 00:06:00")
    w.close()
    val known = Equipment.readLabels(spark, f.getAbsolutePath)
    val got = known.as[(Long, Long)].collect().toSeq
    val e0 = ts("2024-01-01 00:04:00").getTime / 1000
    assert(got.head === ((e0, e0 + 120))) // chronological order
    assert(got.size === 2)

    // flags: predicted overlaps minutes 13..16; known wins inside 12..15
    val predicted = Seq((ts("2024-01-01 00:13:00").getTime / 1000,
      ts("2024-01-01 00:16:00").getTime / 1000)).toDF("range_start", "range_end")
    val flags = Equipment.rangesToFlags(long, predicted, known)
    val byMin = flags.where($"sensor" === "s1")
      .select((($"ts_epoch" - ts("2024-01-01 00:00:00").getTime / 1000) / 60).cast("long"), $"flag")
      .as[(Long, Int)].collect().toMap
    assert(byMin(4) === 2 && byMin(5) === 2 && byMin(6) === 2) // known range
    assert(byMin(13) === 2 && byMin(15) === 2)                 // overlap: known wins
    assert(byMin(16) === 1)                                    // predicted only
    assert(byMin(0) === 0 && byMin(11) === 0)

    // and the ranges feed rankSensors directly
    val ranked = Equipment.rankSensors(long, known)
    assert(ranked.count() === 2)

    // the one-call composition: CSV path -> ranked top-N, same result
    val oneCall = Equipment.evaluateFromLabels(spark, long, f.getAbsolutePath, topN = 2)
    assert(oneCall.count() === 2)
    assert(oneCall.columns.contains("rank"))
  }

  test("setSubsetSchema keeps only the mapped sensors") {
    val sub = Equipment.setSubsetSchema(long,
      Map("pump" -> Seq("Timestamp", "s2"), "ghost" -> Seq("sX")))
    assert(sub.select("sensor").distinct().as[String].collect().toSeq === Seq("s2"))
    assert(sub.count() === 20)
  }

  test("buildInspectionReport renders the scheduler contract (scheduler.py:172-216)") {
    import graft.sources.ComponentSource.{ColumnSpec, ComponentSpec}
    val schema = Seq(
      ComponentSpec("pump", Seq(ColumnSpec("Timestamp", "DATETIME"),
        ColumnSpec("s1", "DOUBLE"), ColumnSpec("s2", "DOUBLE"))),
      ComponentSpec("motor", Seq(ColumnSpec("Timestamp", "DATETIME"),
        ColumnSpec("s3", "DOUBLE"))))
    // 10:17:42 with PT15M cadence -> bucket start 10:15, next wakeup 10:30
    val now = java.sql.Timestamp.valueOf("2020-03-05 10:17:42")
    val report = Equipment.buildInspectionReport(
      "sched-1", 15, 5, "s3://bucket/prefix/", schema, now)
    assert(report.contains("**SCHEDULER: sched-1**"))
    assert(report.contains("every **15 minutes**"))
    assert(report.contains("up to **5 minute(s)**"))
    assert(report.contains("`s3://bucket/prefix/*.csv`"))
    assert(report.contains("will wake up will be **2020-03-05 10:30:00**"))
    assert(report.contains("has **2 components**"))
    // filenames carry the FLOORED bucket timestamp in the configured format
    assert(report.contains("`pump_20200305101500.csv`"))
    assert(report.contains("`motor_20200305101500.csv`"))
    // table template: header, separator, start row, ellipsis, end row
    assert(report.contains(" | Timestamp | s1 | s2|"))
    assert(report.contains("| --- | --- | --- |"))
    assert(report.contains("| 2020-03-05 10:15:00| 0.0 | 0.0 |"))
    assert(report.contains("| 2020-03-05 10:29:59| 0.0 | 0.0 |"))
    assert(report.contains("| ... | ... | ... |"))

    // zero delay offset takes the compact sentence
    val noDelay = Equipment.buildInspectionReport(
      "s2", 15, 0, "s3://b/p/", schema.take(1), now)
    assert(noDelay.contains("every **15 minutes**.\n"))
    assert(!noDelay.contains("minute(s)"))

    // EPOCH format yields epoch-seconds filenames
    val epoch = Equipment.buildInspectionReport(
      "s3", 15, 0, "s3://b/p/", schema.take(1), now,
      timestampFormat = "EPOCH")
    val bucketEpoch = java.sql.Timestamp.valueOf("2020-03-05 10:15:00")
      .toInstant.getEpochSecond
    assert(epoch.contains(s"`pump_$bucketEpoch.csv`"))
  }
}
