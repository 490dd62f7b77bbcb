package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.{Equipment, MarkdownHtml}
import graft.ml.AnomalyDetector
import graft.sources.{ComponentSource, Predictions}

/** The reference's END-TO-END lifecycle as one test — the migration guide a
  * reference user reads top to bottom (dataset.py:559-906 + the examples/
  * notebooks): CSV component tree → schema inference → long-format ingest →
  * off-condition filter → resample → train/eval split → model training →
  * scoring → predicted ranges → evaluation overlay (flags + sensor ranking)
  * → scheduler predictions JSONL round-trip → inspection report (markdown +
  * HTML).
  *
  * Every stage already has its own spec; this one proves they CHAIN — the
  * output schema of each stage is the input schema of the next, with no
  * glue code beyond selecting columns. The fixture is deterministic: two
  * components at a 1-minute cadence with a machine-off window (motor,
  * 02:00–02:59) and an injected anomaly (pump.s2 jumps 1.0 → 10.0,
  * 08:00–08:29) that the pipeline must rediscover.
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def fmt(epochMin: Long): String =
    java.time.Instant.ofEpochSecond(baseEpoch + epochMin * 60)
      .atZone(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  private val baseEpoch = Timestamp.valueOf("2026-01-01 00:00:00").getTime / 1000

  /** 600 minutes of data per sensor; anomaly window minutes [480, 510). */
  private def writeTree(root: Path): Unit = {
    val pump = new StringBuilder("Timestamp,s1,s2\n")
    val motor = new StringBuilder("Timestamp,s3,state\n")
    (0 until 600).foreach { m =>
      // benign sensors are constant so the ranking stage's distribution
      // distance isolates the injected shift (their u/v densities tie at 0)
      val s1 = 1.0
      val s2 =
        if (m >= 480 && m < 510) 10.0 + 0.05 * math.cos(m * 0.07)
        else 1.0 + 0.05 * math.cos(m * 0.07)
      val s3 = 2.0
      val state = if (m >= 120 && m < 180) 0.0 else 1.0 // motor off 02:00-02:59
      pump ++= s"${fmt(m.toLong)},$s1,$s2\n"
      motor ++= s"${fmt(m.toLong)},$s3,$state\n"
    }
    Files.createDirectories(root.resolve("pump"))
    Files.createDirectories(root.resolve("motor"))
    Files.write(root.resolve("pump/data.csv"), pump.toString.getBytes)
    Files.write(root.resolve("motor/data.csv"), motor.toString.getBytes)
  }

  test("reference lifecycle chains end-to-end: ingest → train → evaluate → predict → report") {
    val root = Files.createTempDirectory("lifecycle")
    writeTree(root)

    // ── 1. Schema inference (create_data_schema_from_dir_structure) ──────
    val schema = ComponentSource.inferSchema(spark, root.toString)
    assert(schema.map(_.name) === Seq("motor", "pump"))
    assert(schema.find(_.name == "pump").get.columns.map(_.name) ===
      Seq("Timestamp", "s1", "s2"))
    assert(schema.flatMap(_.columns).forall(c =>
      c.dtype == "DATETIME" || c.dtype == "DOUBLE"))

    // ── 2. Ingest to the canonical long format (ingest_data) ─────────────
    val long = ComponentSource.readLong(spark, root.toString).cache()
    assert(long.columns.toSeq === Seq("component", "sensor", "ts", "value"))
    assert(long.count() === 600L * 4) // 2 components × 2 sensors × 600 min

    // ── 3. Off-condition filter (set_off_condition semantics) ────────────
    // state < 0.5 means OFF; only the motor carries the state tag, so pump
    // rows pass through and the motor's 60 off minutes drop (state rows at
    // off timestamps drop with them — the machine reported nothing usable).
    val on = Equipment.applyOffCondition(long, "state < 0.5")
    assert(on.where($"component" === "pump").count() === 600L * 2)
    assert(on.where($"component" === "motor").count() === (600L - 60) * 2)

    // ── 4. Resample to the target sampling rate (PT5M) ───────────────────
    val res = Equipment.resample(on, "PT5M")
    // 600 min / 5 = 120 buckets per pump sensor, each holding 5 points
    val pumpBuckets = res.where($"component" === "pump" && $"sensor" === "s2")
    assert(pumpBuckets.count() === 120)
    assert(pumpBuckets.agg(min($"n"), max($"n")).as[(Long, Long)].head() === ((5L, 5L)))

    // ── 5. Train/evaluation time split (set_time_periods) ────────────────
    val periods = Equipment.TimePeriods(
      Timestamp.valueOf("2026-01-01 00:00:00"), Timestamp.valueOf("2026-01-01 05:59:59"),
      Timestamp.valueOf("2026-01-01 06:00:00"), Timestamp.valueOf("2026-01-01 09:59:59"))
    val phased = Equipment.timeSplit(on, periods)
    assert(phased.select("phase").distinct().as[String].collect().toSet ===
      Set("train", "eval"))

    // ── 6. Features → model fit on TRAIN only (the service's training) ───
    // Per-(component, hour) activity features from the resampled buckets,
    // named for AnomalyDetector.featureCols; n_errors counts out-of-envelope
    // readings the way the events-table featurizer counts error events.
    def featurize(df: DataFrame): DataFrame =
      Equipment.resample(df, "PT5M")
        .groupBy($"component",
          (floor($"bucket_start" / 3600L) * 3600L).cast("long").as("hour"))
        .agg(
          sum($"n").cast("double").as("n_events"),
          avg($"avg_value").as("mean_value"),
          max($"max_value").as("max_value"),
          sum(when($"max_value" > 5.0, 1.0).otherwise(0.0)).as("n_errors"))
    val trainFeat = featurize(phased.where($"phase" === "train"))
    val evalFeat = featurize(phased.where($"phase" === "eval"))
    val model = AnomalyDetector.fit(trainFeat, k = 2)

    // ── 7. Score the evaluation period; threshold to per-hour flags ──────
    val trainMax = AnomalyDetector.score(model, trainFeat)
      .agg(max($"anomaly_score")).as[Double].head()
    val scored = AnomalyDetector.score(model, evalFeat)
      .withColumn("flag", when($"anomaly_score" > lit(trainMax * 2), 1).otherwise(0))
      .cache()
    val flaggedHours = scored.where($"flag" === 1)
      .select($"component", $"hour").as[(String, Long)].collect().toSet
    // exactly the pump hour containing the injected 08:00-08:29 anomaly
    assert(flaggedHours === Set(("pump", baseEpoch + 8 * 3600)))

    // ── 8. Flagged hours → predicted ranges (pointsToRanges) ─────────────
    val predicted = Equipment.pointsToRanges(
      scored.select($"component", $"hour".as("ts_epoch"), $"flag"),
      gapSec = 3600L)
    val (ps, pe) = predicted.select($"range_start", $"range_end")
      .as[(Long, Long)].head()
    assert(ps === baseEpoch + 8 * 3600 && pe === baseEpoch + 8 * 3600)

    // ── 9. Evaluation overlay: flags vs known labels + sensor ranking ────
    val known = Seq((baseEpoch + 480 * 60, baseEpoch + 509 * 60))
      .toDF("range_start", "range_end")
    val evalLong = phased.where($"phase" === "eval")
      .select($"component", $"sensor", $"ts", $"value")
    // hour-level prediction covers [08:00, 09:00); intersect to the hour
    val predHour = predicted.select(
      $"range_start", ($"range_end" + 3599L).as("range_end"))
    val flags = Equipment.rangesToFlags(evalLong, predHour, known)
    // known (2) outranks predicted (1) inside the label window
    assert(flags.where($"flag" === 2).count() ===
      30L * 4) // 30 labelled minutes × 4 series
    assert(flags.where($"flag" === 1).count() ===
      30L * 4) // predicted-only remainder of the hour
    val ranked = Equipment.getRankedList(
      Equipment.rankSensors(evalLong, predHour), topN = 1)
    assert(ranked.select($"component", $"sensor").as[(String, String)].head() ===
      (("pump", "s2")))

    // ── 10. Scheduler output round-trip (get_predictions) ────────────────
    val jsonl = scored.orderBy($"hour").collect().map { r =>
      val comp = r.getAs[String]("component")
      val hour = r.getAs[Long]("hour")
      val pred = r.getAs[Int]("flag")
      val score = r.getAs[Double]("anomaly_score")
      val ts = java.time.Instant.ofEpochSecond(hour)
        .atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      val diag = if (pred == 1)
        s""","diagnostics":[{"name":"$comp\\\\s2","value":0.8},{"name":"$comp\\\\s1","value":0.2}]"""
      else ""
      s"""{"timestamp":"$ts","prediction":$pred,"anomaly_score":$score$diag}"""
    }
    val predPath = Files.createTempDirectory("preds").resolve("out.jsonl")
    Files.write(predPath, jsonl.mkString("\n").getBytes)
    val preds = Predictions.readJsonl(spark, predPath.toString)
    assert(preds.count() === scored.count())
    val wide = Predictions.diagnosticsWide(preds)
    assert(wide.columns.contains("pump\\s2"))
    assert(wide.where($"prediction" === 1).count() === 1)

    // ── 11. Inspection report: markdown + HTML export ─────────────────────
    val report = Equipment.buildInspectionReport(
      "lifecycle-sched", 30, 0, s"$root/", schema,
      Timestamp.valueOf("2026-01-01 10:05:00"))
    assert(report.contains("**SCHEDULER: lifecycle-sched**"))
    assert(report.contains("`motor_20260101100000.csv`"))
    val html = MarkdownHtml.render(report)
    assert(html.contains("<code>pump_20260101100000.csv</code>"))
    assert("<table>".r.findAllIn(html).size === 2)

    long.unpersist(); scored.unpersist()
  }
}
