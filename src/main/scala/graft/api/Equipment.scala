package graft.api

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-shaped user API over the canonical long format
  * (component, sensor, ts, value) that [[graft.sources.ComponentSource]]
  * produces. Parameter vocabulary follows the reference SDK so a user can
  * switch call-for-call:
  *
  *   - sampling rates are ISO-8601 durations ("PT5M", "PT1H", ...) —
  *     reference model.py:151-164 (set_target_sampling_rate)
  *   - off-conditions are predicate strings like "sensor_17 < 1000.0" —
  *     reference model.py:194-208 (set_off_condition)
  *   - train/eval splits are four timestamps — model.py:166-192
  *     (set_time_periods)
  *   - inference extraction takes (num_sequences, frequency minutes,
  *     start) — dataset.py:242-336 (prepare_inference_data)
  *   - evaluation flags are 0 normal / 1 predicted / 2 known —
  *     evaluation.py:189-226 (_get_time_ranges)
  *   - ranking is shared-bin histogram Wasserstein —
  *     evaluation.py:228-313 (compute_histograms) + 557-572
  *     (get_ranked_list)
  *
  * Every method returns a lazy DataFrame plan; nothing collects. The series
  * key (component, sensor) is the partitioning key throughout, so each
  * operator shuffles at most once on it regardless of data volume.
  */
object Equipment {

  private val seriesKey: Seq[Column] = Seq(col("component"), col("sensor"))

  /** "PT5M" → 300. Accepts any ISO-8601 duration. */
  def samplingRateSeconds(rate: String): Long =
    java.time.Duration.parse(rate).getSeconds

  /** Resample each series to the target rate: mean/min/max/count per bucket
    * (the TargetSamplingRate pre-processing step).
    */
  def resample(long: DataFrame, samplingRate: String): DataFrame = {
    val w = samplingRateSeconds(samplingRate)
    long.groupBy(seriesKey :+
        (floor(unix_timestamp(col("ts")) / w) * w).cast("long").as("bucket_start"): _*)
      .agg(
        avg(col("value")).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("n"))
  }

  /** Parse an off-condition string ("tag < 1000", "tag > 0.5") into
    * (sensor name, predicate-on-value). The reference passes these verbatim
    * to the service; here they compile to a Column predicate.
    */
  private[api] def parseCondition(cond: String): (String, Column) = {
    val m = """^\s*(\S+)\s*([<>])\s*([-0-9.eE]+)\s*$""".r
    cond match {
      case m(tag, "<", v) => (tag, col("value") < v.toDouble)
      case m(tag, ">", v) => (tag, col("value") > v.toDouble)
      case _ => throw new IllegalArgumentException(
        s"off-condition must look like 'tag < 123' or 'tag > 123', got: $cond")
    }
  }

  /** Drop all rows at timestamps where the machine is off. The off-tag's
    * readings define machine state at each timestamp; every series joins to
    * that state on (component, ts). The state side is one sensor's stream —
    * orders of magnitude smaller than the data side at real sensor counts.
    */
  def applyOffCondition(long: DataFrame, offCondition: String): DataFrame = {
    val (tag, offPred) = parseCondition(offCondition)
    val state = long
      .filter(col("sensor") === tag)
      .select(col("component").as("c2"), col("ts").as("t2"),
        offPred.as("is_off"))
    long
      .join(state,
        col("component") === col("c2") && col("ts") === col("t2"), "left_outer")
      .filter(!coalesce(col("is_off"), lit(false)))
      .select(col("component"), col("sensor"), col("ts"), col("value"))
  }

  /** Train/evaluation time periods (both ends inclusive, like the service). */
  case class TimePeriods(
      trainingStart: Timestamp, trainingEnd: Timestamp,
      evaluationStart: Timestamp, evaluationEnd: Timestamp)

  /** Tag each row train / evaluation / excluded per the configured periods. */
  def timeSplit(long: DataFrame, periods: TimePeriods): DataFrame =
    long.withColumn("phase",
      when(col("ts").between(periods.trainingStart, periods.trainingEnd), "train")
        .when(col("ts").between(periods.evaluationStart, periods.evaluationEnd), "eval")
        .otherwise("excluded"))

  /** Extract `numSequences` back-to-back windows of `frequencyMin` minutes
    * starting at `start`, re-indexed onto a relative per-window time base —
    * the scheduler-input extraction of prepare_inference_data, minus the
    * CSV/S3 plumbing (write the result with any Spark sink).
    */
  def prepareInferenceData(long: DataFrame, start: Timestamp,
                           numSequences: Int = 3, frequencyMin: Int = 5): DataFrame = {
    val freqSec = frequencyMin * 60L
    val startE = start.getTime / 1000
    long
      .withColumn("e", unix_timestamp(col("ts")))
      .filter(col("e") >= startE && col("e") < startE + numSequences * freqSec)
      .withColumn("seq", floor((col("e") - startE) / freqSec).cast("int"))
      .withColumn("rel_ts", col("e") - startE - col("seq") * freqSec)
      .select(col("seq"), col("component"), col("sensor"), col("rel_ts"), col("value"))
  }

  /** Replay-data generation (reference dataset.py:420-556,
    * generate_replay_data): slice `replayDays` of history starting at
    * `replayStart`, shift every timestamp by (newStart − replayStart) so the
    * old data plays back as if it were happening now, and tag each row with
    * its upload bucket. The reference then writes one CSV per
    * (component, bucket) — here that's one [[graft.sources.Sink]] write
    * partitioned by (component, split_start). Pure map-side plan: a filter
    * and two column expressions, no shuffle at all.
    */
  def generateReplayData(long: DataFrame, replayStart: Timestamp, newStart: Timestamp,
                         uploadFrequency: String, replayDays: Int = 1): DataFrame = {
    val freqSec = samplingRateSeconds(uploadFrequency)
    val startE = replayStart.getTime / 1000
    val shift = newStart.getTime / 1000 - startE
    long
      .withColumn("e", unix_timestamp(col("ts")))
      .filter(col("e") >= startE && col("e") < startE + replayDays * 86400L)
      .withColumn("ts_shifted", col("e") + shift)
      .withColumn("split_start",
        (floor(col("ts_shifted") / freqSec) * freqSec).cast("long"))
      .select(col("component"), col("sensor"), col("split_start"),
        col("ts_shifted"), col("value"))
  }

  /** The reference returns the list of replay sequences that came out empty
    * (they make a scheduler execution fail). Dense expected buckets per
    * component anti-joined with what [[generateReplayData]] produced.
    */
  def emptyReplaySequences(replay: DataFrame, newStart: Timestamp,
                           uploadFrequency: String, replayDays: Int = 1): DataFrame = {
    val freqSec = samplingRateSeconds(uploadFrequency)
    val startE = newStart.getTime / 1000
    val expected = replay.select(col("component")).distinct()
      .select(col("component"),
        explode(sequence(lit(startE), lit(startE + replayDays * 86400L - freqSec),
          lit(freqSec))).as("split_start"))
    expected.join(replay.select(col("component"), col("split_start")).distinct(),
      Seq("component", "split_start"), "left_anti")
  }

  /** Read a labels CSV — the reference's headerless two-column
    * (start, end) timestamp file (evaluation.py:161-187, get_labels) — into
    * the (range_start, range_end) epoch-second ranges frame that
    * [[rangesToFlags]] / [[rankSensors]] consume, in chronological order.
    */
  def readLabels(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read
      .schema("start TIMESTAMP, end TIMESTAMP")
      .csv(path)
      .select(
        unix_timestamp(col("start")).as("range_start"),
        unix_timestamp(col("end")).as("range_end"))
      .orderBy(col("range_start"))

  /** One-call evaluation: labels CSV → anomaly ranges → distribution-shift
    * sensor ranking → top-N — the reference's whole evaluation workflow
    * (get_labels → compute_histograms → get_ranked_list) as a single lazy
    * plan over the long table.
    */
  def evaluateFromLabels(spark: org.apache.spark.sql.SparkSession,
                         long: DataFrame, labelsCsvPath: String,
                         topN: Int = 10): DataFrame =
    getRankedList(rankSensors(long, readLabels(spark, labelsCsvPath)), topN)

  /** Keep only the sensors named in `fieldMap` (component → sensor names) —
    * the reference's set_subset_schema (model.py:210-223), which trains a
    * model on a subset of the ingested signals. On the long format this is a
    * single predicate the scan can push down; "Timestamp" entries in the map
    * (part of the reference's schema vocabulary) are ignored.
    */
  def setSubsetSchema(long: DataFrame, fieldMap: Map[String, Seq[String]]): DataFrame = {
    val keep = fieldMap.toSeq
      .flatMap { case (comp, fields) =>
        fields.filterNot(_.equalsIgnoreCase("Timestamp")).map(s => (comp, s))
      }
    long.where(
      keep.map { case (c, s) => col("component") === c && col("sensor") === s }
        .reduceOption(_ || _)
        .getOrElse(lit(false)))
  }

  /** Per-point anomaly flags: 0 normal, 1 inside a predicted range, 2 inside
    * a known (labelled) range — known wins, matching the reference's
    * evaluation overlay. Ranges are (range_start, range_end) epoch seconds
    * and are broadcast (they are human-scale small).
    */
  def rangesToFlags(points: DataFrame, predicted: DataFrame, known: DataFrame): DataFrame = {
    val pts = points.withColumn("e", unix_timestamp(col("ts")))
    val pr = predicted.select(col("range_start").as("ps"), col("range_end").as("pe"))
    val kn = known.select(col("range_start").as("ks"), col("range_end").as("ke"))
    pts
      .join(broadcast(pr), col("e").between(col("ps"), col("pe")), "left_outer")
      .groupBy(col("component"), col("sensor"), col("e"), col("value"))
      .agg(max(when(col("ps").isNotNull, 1).otherwise(0)).as("f_pred"))
      .join(broadcast(kn), col("e").between(col("ks"), col("ke")), "left_outer")
      .groupBy(col("component"), col("sensor"), col("e"), col("value"), col("f_pred"))
      .agg(max(when(col("ks").isNotNull, 2).otherwise(0)).as("f_known"))
      .select(col("component"), col("sensor"), col("e").as("ts_epoch"), col("value"),
        greatest(col("f_pred"), col("f_known")).as("flag"))
  }

  /** Contiguous anomaly ranges from flagged points (gaps-and-islands):
    * consecutive flagged points closer than `gapSec` merge; ranges with
    * fewer than `minEvents` points drop. Inverse of [[rangesToFlags]].
    */
  def pointsToRanges(flagged: DataFrame, gapSec: Long, minEvents: Long = 1L): DataFrame = {
    val pts = flagged.filter(col("flag") > 0)
      .select(col("component"), col("ts_epoch").as("e")).distinct()
    val byComp = Window.partitionBy(col("component")).orderBy(col("e"))
    pts
      .withColumn("prev_e", lag(col("e"), 1).over(byComp))
      .withColumn("brk",
        when(col("prev_e").isNull || col("e") - col("prev_e") > gapSec, 1).otherwise(0))
      .withColumn("session", sum(col("brk")).over(byComp.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("component"), col("session"))
      .agg(min(col("e")).as("range_start"), max(col("e")).as("range_end"),
        count(lit(1)).as("n_points"))
      .filter(col("n_points") >= minEvents)
      .drop("session")
  }

  /** Rank sensors by normal-vs-anomalous distribution shift: shared-bin
    * density histograms per sensor (bins from the sensor's global envelope),
    * Wasserstein distance between the two 1-D densities (= mean |sorted u −
    * sorted v| for equal-length vectors), descending rank. `anomalies` is a
    * (range_start, range_end) epoch-second frame, broadcast to phase-tag the
    * points. Two aggregate passes + bin-sized joins — no per-sensor loop.
    */
  def rankSensors(long: DataFrame, anomalies: DataFrame, numBins: Int = 20): DataFrame = {
    val pts = long
      .select(col("component"), col("sensor"), unix_timestamp(col("ts")).as("e"), col("value"))
    val phased = pts
      .join(broadcast(anomalies),
        col("e") >= col("range_start") && col("e") <= col("range_end"), "left_outer")
      .groupBy(col("component"), col("sensor"), col("e"), col("value"))
      .agg(max(when(col("range_start").isNotNull, 1).otherwise(0)).as("an"))
      .withColumn("phase", when(col("an") === 1, "v").otherwise("u"))
    val stats = pts.groupBy(col("component"), col("sensor"))
      .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      .withColumn("width", (col("vmax") - col("vmin")) / numBins)
    val counts = phased
      .join(broadcast(stats), Seq("component", "sensor"))
      // constant sensors have a zero-width envelope: every point lands in
      // bin 0 (identical u/v densities → score 0) instead of NaN bins
      .withColumn("bin",
        when(col("width") === 0, lit(0L)).otherwise(
          least(floor((col("value") - col("vmin")) / col("width")).cast("long"), lit(numBins - 1L))))
      .groupBy(col("component"), col("sensor"), col("phase"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("component"), col("sensor"), col("phase"))
      .agg(sum(col("c")).as("total"))
    val grid = stats
      .select(col("component"), col("sensor"), col("width"),
        explode(sequence(lit(0L), lit(numBins - 1L))).as("bin"))
      .crossJoin(broadcast(
        long.sparkSession.range(1).select(explode(array(lit("u"), lit("v"))).as("phase"))))
    // np.histogram(density=True): count / total / bin width, so scores are
    // comparable across sensors with different value envelopes; a constant
    // sensor (width 0) keeps the plain ratio — its u/v densities are
    // identical either way, giving the intended score 0 instead of NaN
    val dens = grid
      .join(counts, Seq("component", "sensor", "phase", "bin"), "left_outer")
      .join(totals, Seq("component", "sensor", "phase"), "left_outer")
      .select(col("component"), col("sensor"), col("phase"), col("bin"),
        coalesce(col("c").cast("double") / col("total") /
          when(col("width") === 0, lit(1.0)).otherwise(col("width")), lit(0.0)).as("d"))
    val sortW = Window.partitionBy(col("component"), col("sensor"), col("phase"))
      .orderBy(col("d"), col("bin"))
    val ranked = dens.withColumn("pos", row_number().over(sortW))
    val u = ranked.filter(col("phase") === "u")
      .select(col("component"), col("sensor"), col("pos"), col("d").as("du"))
    val v = ranked.filter(col("phase") === "v")
      .select(col("component"), col("sensor"), col("pos"), col("d").as("dv"))
    u.join(v, Seq("component", "sensor", "pos"))
      .groupBy(col("component"), col("sensor"))
      .agg(avg(abs(col("du") - col("dv"))).as("score"))
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("component"), col("sensor"))))
  }

  /** Top-N of [[rankSensors]] — reference get_ranked_list. */
  def getRankedList(ranked: DataFrame, topN: Int): DataFrame =
    ranked.filter(col("rank") <= topN).orderBy(col("rank"))

  /** Shared-bin density comparison of two value series — the DATA behind
    * plot.py:795-857 `plot_histogram_comparison` (and each panel of
    * plot.py:552-617 `plot_histograms`): aligned bin edges over the
    * COMBINED envelope of both series (plot.py:747-793
    * `compute_bin_edges`), per-series density = count / total / bin width
    * (np.histogram density=True), one row per bin carrying both densities
    * so a renderer overlays them. Plan shape: one union scan, a broadcast
    * 2-value envelope, one groupBy — bins the chart needs, never a
    * per-bin loop or a collect of the series.
    */
  def histogramComparison(a: DataFrame, b: DataFrame,
                          valueCol: String = "value",
                          numBins: Int = 10): DataFrame = {
    val all = a.select(col(valueCol).cast("double").as("x"), lit("a").as("s"))
      .unionAll(b.select(col(valueCol).cast("double").as("x"), lit("b").as("s")))
    val env = all.agg(min(col("x")).as("vmin"), max(col("x")).as("vmax"))
      .withColumn("width", (col("vmax") - col("vmin")) / numBins)
    val counts = all.crossJoin(broadcast(env))
      // a flat combined envelope puts everything in bin 0 (densities equal
      // by construction) instead of NaN bins — same guard as rankSensors
      .withColumn("bin", when(col("width") === 0, lit(0L)).otherwise(
        least(floor((col("x") - col("vmin")) / col("width")).cast("long"),
          lit(numBins - 1L))))
      .groupBy(col("s"), col("bin")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("s")).agg(sum(col("c")).as("total"))
    val dens = counts.join(totals, "s")
      .crossJoin(broadcast(env))
      .select(col("s"), col("bin"),
        (col("c").cast("double") / col("total") /
          when(col("width") === 0, lit(1.0)).otherwise(col("width"))).as("d"))
    env.select(col("vmin"), col("width"),
        explode(sequence(lit(0L), lit(numBins - 1L))).as("bin"))
      .join(dens.filter(col("s") === "a").select(col("bin"), col("d").as("density_a")),
        Seq("bin"), "left_outer")
      .join(dens.filter(col("s") === "b").select(col("bin"), col("d").as("density_b")),
        Seq("bin"), "left_outer")
      .select(col("bin"),
        (col("vmin") + col("bin") * col("width")).as("bin_start"),
        (col("vmin") + (col("bin") + 1) * col("width")).as("bin_end"),
        coalesce(col("density_a"), lit(0.0)).as("density_a"),
        coalesce(col("density_b"), lit(0.0)).as("density_b"))
      .orderBy(col("bin"))
  }

  /** The ranking grid of evaluation.py:315-478 (`plot_histograms_v2`) as a
    * report SECTION: the reference draws one histogram panel per signal,
    * titled with the tag and its rank, in decreasing Wasserstein-distance
    * order and capped at `maxPlots` — this renders the same content as a
    * markdown table (rank, component, sensor, score) from [[rankSensors]]'
    * output. The collect is bounded by `maxPlots` rows by construction.
    */
  def buildEvaluationReport(ranked: DataFrame, maxPlots: Int = 12): String = {
    val rows = getRankedList(ranked, maxPlots)
      .select(col("rank"), col("component"), col("sensor"),
        (round(col("score") * 1000000) / 1000000).as("score"))
      .collect()
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += "**SIGNAL RANKING: normal vs anomalous distribution shift**\n"
    lines += s"*Top ${rows.length} signals by Wasserstein distance between the*"
    lines += "*training-period and evaluation-period value densities.*\n"
    lines += "| rank | component | sensor | distance |"
    lines += "| --- | --- | --- | --- |"
    rows.foreach { r =>
      lines += s"| ${r.getAs[Int]("rank")} | ${r.getAs[String]("component")} " +
        s"| ${r.getAs[String]("sensor")} | ${r.getAs[Double]("score")} |"
    }
    lines.mkString("\n")
  }

  /** The per-event top-signal table of plot.py:858-906 (`plot_event_barh`)
    * as a report SECTION: the reference bar-chart shows, for one detected
    * event, each contributing signal's feature importance (formatted
    * `{v*100:.2f}%`), keeps the top `numSignals`, and draws the uniform
    * line at 1/num_values (equal contribution) — signals above it are the
    * diagnosis. Same content, tabular: importance descending, percent
    * formatted exactly as the reference, and an `above_uniform` marker per
    * row. `details` is the already-small (sensor → importance) map for ONE
    * event (q09's diagnostics expansion provides it), so this is a pure
    * function, not a Spark job.
    */
  def buildEventReport(eventTime: String, details: Seq[(String, Double)],
                       numSignals: Int = 10): String = {
    val uniform = 1.0 / details.size
    val top = details.sortBy { case (n, v) => (-v, n) }.take(numSignals)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += s"**Event detected at $eventTime**\n"
    lines += f"*Uniform-contribution line: ${uniform * 100}%.2f%% " +
      s"(1/${details.size} signals); signals above it drive the detection.*\n"
    lines += "| sensor | importance | above_uniform |"
    lines += "| --- | --- | --- |"
    top.foreach { case (name, v) =>
      lines += f"| $name | ${v * 100}%.2f%% | ${if (v > uniform) "yes" else "no"} |"
    }
    lines.mkString("\n")
  }

  /** Scheduler time-bucket arithmetic (scheduler.py:139-170): for a wakeup
    * at `now` with `frequencyMin`-minute scheduling, the inference input
    * window is the CURRENT bucket: start_time = now floored to the bucket,
    * end_time = start_time + frequency − 1 s (scheduler.py start_time /
    * end_time arithmetic, inclusive end).
    */
  def nextTimeRange(now: Timestamp, frequencyMin: Int): (Timestamp, Timestamp) =
    nextTimeRange(now, frequencyMin, java.time.ZoneOffset.UTC)

  /** Timezone-aware variant — the reference scheduler floors the wakeup to a
    * bucket of the LOCAL wall clock (scheduler.py:106-137 `_get_timezone_offset`
    * + 153-164: `datetime.now(tz)` minus `minute % frequency`), so schedule
    * boundaries follow the configured timezone, not UTC. For offsets that are
    * not a multiple of the frequency (e.g. +05:30 with hourly scheduling) and
    * across DST transitions this selects a DIFFERENT set of data rows than
    * UTC flooring; window arithmetic runs in `zone` and converts back to
    * instants at the edges.
    */
  def nextTimeRange(now: Timestamp, frequencyMin: Int,
                    zone: java.time.ZoneId): (Timestamp, Timestamp) = {
    val local = now.toInstant.atZone(zone).withSecond(0).withNano(0)
    val start = local.minusMinutes(local.getMinute % frequencyMin)
    val end = start.plusMinutes(frequencyMin.toLong).minusSeconds(1)
    (Timestamp.from(start.toInstant), Timestamp.from(end.toInstant))
  }

  /** The scheduler's Markdown inspection report — reference
    * scheduler.py:172-216 (`build_inspection_report`) re-expressed as a
    * pure function of the scheduler parameters: what cadence it wakes on,
    * where it looks, which files it expects at the next wakeup, and a
    * per-component table template with the exact filename timestamp. The
    * reference derives all of this from live boto3 describe calls plus
    * `datetime.now`; here the clock is an argument so the report is
    * deterministic and testable, and the schema is the
    * [[graft.sources.ComponentSource.ComponentSpec]] inventory the
    * engine's own ingestion produces.
    *
    * Timestamp formats mirror scheduler.py:146-152: "EPOCH",
    * "yyyy-MM-dd-HH-mm-ss", "yyyyMMddHHmmss".
    */
  def buildInspectionReport(
      schedulerName: String,
      frequencyMin: Int,
      delayOffsetMin: Int,
      inputLocation: String,
      schema: Seq[graft.sources.ComponentSource.ComponentSpec],
      now: Timestamp,
      delimiter: String = "_",
      timestampFormat: String = "yyyyMMddHHmmss",
      zone: java.time.ZoneId = java.time.ZoneOffset.UTC): String = {
    val (start, end) = nextTimeRange(now, frequencyMin, zone)
    val startLocal = start.toInstant.atZone(zone)
    val nextWakeup = startLocal.plusMinutes(frequencyMin.toLong)
    val nextTimestamp = timestampFormat match {
      case "EPOCH" => startLocal.toInstant.getEpochSecond.toString
      case fmt => startLocal.format(
        java.time.format.DateTimeFormatter.ofPattern(fmt))
    }
    val wall = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    lines += s"**SCHEDULER: $schedulerName**\n"
    lines += s"*Scheduler inspection report run at: ${now.toInstant.atZone(zone).format(wall)}*\n"
    lines += "Here is the behavior you can expect from this scheduler:\n"
    if (delayOffsetMin > 0) {
      lines += s"* It will wake up every **$frequencyMin minutes**"
      lines += s"and wait for up to **$delayOffsetMin minute(s)** for the data to be available.\n"
    } else {
      lines += s"* It will wake up every **$frequencyMin minutes**.\n"
    }
    lines += s"* It will look for CSV files in the following location `$inputLocation*.csv`.\n"
    lines += s"* The current time is **${now.toInstant.atZone(zone).format(wall)}** and the next time the scheduler will wake up will be **${nextWakeup.format(wall)}**\n"
    lines += s"* The dataset associated to this scheduler's model has **${schema.size} components** in its schema.\n"
    lines += s"Each time the scheduler wakes up, it expects to find **${schema.size} CSV files** in the input location, one for each component as defined in the dataset schema.\n"
    lines += s"If the scheduler was to wake up at **${nextWakeup.format(wall)}**, it would look for the following files:"
    for (component <- schema) {
      lines += s"\n* `${component.name}$delimiter$nextTimestamp.csv` and this file content would have to follow this template:"
      val cols = component.columns
      val table = new StringBuilder("\n")
      cols.foreach(c => table ++= " | " + c.name)
      table ++= "|"
      table ++= "\n" + "| --- " * cols.length + "|"
      table ++= s"\n| ${startLocal.format(wall)}" + "| 0.0 " * (cols.length - 1) + "|"
      table ++= "\n" + "| ... " * cols.length + "|"
      table ++= s"\n| ${end.toInstant.atZone(zone).format(wall)}" + "| 0.0 " * (cols.length - 1) + "|"
      lines += table.toString
    }
    lines.mkString("\n")
  }
}
