package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TimeSeries.{epochS, exactAvg, r4}

/** Anomaly-range operators: range⇄point conversion, train/test split,
  * off-condition filtering.
  *
  * Reference semantics:
  *   - expanding [start,end] ranges into per-point flags:
  *     evaluation.py:189-226 (`_get_time_ranges`) and plot.py:301-333
  *     (`_convert_ranges`)
  *   - merging point predictions into contiguous ranges (the
  *     predicted_ranges data model of scheduler.py:598-662) — classic
  *     gaps-and-islands sessionization
  *   - train/eval time split: model.py:166-192
  *   - on/off condition predicate: model.py:109-123
  *
  * The range join carries the series key (user_id) so at scale it shuffles
  * both sides once on that key instead of a time cross-product; the ranges
  * side is tiny relative to points and is broadcast.
  */
object Ranges {

  /** Derived "known anomaly" ranges: for each (user, day) that contains
    * error events, the [min ts, max ts] envelope of those errors. Stands in
    * for the reference's labels.csv ranges on the synthetic data.
    */
  private def errorRanges(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .filter(col("event_type") === "error")
      .groupBy(
        col("user_id"),
        (floor(epochS(col("ts")) / 86400L) * 86400L).cast("long").as("day_start")
      )
      .agg(
        min(epochS(col("ts"))).as("range_start"),
        max(epochS(col("ts"))).as("range_end")
      )
  }

  /** q04: expand ranges → per-point 0/1 flags, then summarize flagged vs
    * normal points per event_type (the distributed analog of the dense
    * Prediction column built in evaluation.py:207-216).
    */
  def rangeFlags(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("e", epochS(col("ts")))
    val ranges = errorRanges(spark, sfDir)
      .select(col("user_id").as("r_user"), col("range_start"), col("range_end"))
    val flagged = ev
      .join(
        broadcast(ranges),
        col("user_id") === col("r_user") &&
          col("e") >= col("range_start") && col("e") <= col("range_end"),
        "left_outer"
      )
      .groupBy(col("event_id"), col("event_type"), col("value"))
      .agg(max(when(col("r_user").isNotNull, 1).otherwise(0)).as("in_anomaly"))
    flagged
      .groupBy(col("event_type"), col("in_anomaly"))
      .agg(count(lit(1)).as("n"), r4(exactAvg(col("value"))).as("avg_value"))
  }

  /** q198: point-detector evaluation against the labeled ranges — the
    * reference's evaluation loop closed end to end: a per-user p95
    * threshold detector (the simplest per-asset alarm) scored against the
    * labeled error ranges as TP/FP/FN/TN with micro precision/recall/F1.
    * q04 reports the overlap census; this reports the DETECTOR
    * scorecard, the number a threshold-tuning loop actually optimizes.
    * Thresholds come from the two-pass exact-quantile engine (snapped to
    * 6 dp so both engines compare against the same constant); the range
    * join is the q04 broadcast interval join; everything after is exact
    * integer counting with three final IEEE divisions.
    */
  def detectionF1(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), epochS(col("ts")).as("e"),
        col("value"))
    val thr = Percentiles.exactQuantiles(
        ev.select(col("user_id"), col("value")),
        "user_id", "value", Seq("p" -> 0.95))
      .select(col("user_id"),
        (round(col("qv") * lit(1000000)) / lit(1000000.0)).as("thr"))
    val ranges = errorRanges(spark, sfDir)
      .select(col("user_id").as("r_user"), col("range_start"),
        col("range_end"))
    val pts = ev.join(thr, "user_id")
      .withColumn("pred", col("value") > col("thr"))
      .join(broadcast(ranges),
        col("user_id") === col("r_user") &&
          col("e") >= col("range_start") && col("e") <= col("range_end"),
        "left_outer")
      .groupBy(col("user_id"), col("event_id"), col("pred"))
      .agg(max(when(col("r_user").isNotNull, 1).otherwise(0)).as("truth"))
    val agg = pts.agg(
      sum(when(col("pred") && col("truth") === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col("pred") && col("truth") === 0, 1L).otherwise(0L)).as("fp"),
      sum(when(!col("pred") && col("truth") === 1, 1L).otherwise(0L)).as("fn"),
      sum(when(!col("pred") && col("truth") === 0, 1L).otherwise(0L)).as("tn"))
    val prec = col("tp").cast("double") / (col("tp") + col("fp"))
    val rec = col("tp").cast("double") / (col("tp") + col("fn"))
    agg.select(col("tp"), col("fp"), col("fn"), col("tn"),
      (round(prec * lit(1000000)) / lit(1000000.0)).as("prec"),
      (round(rec * lit(1000000)) / lit(1000000.0)).as("recall"),
      (round(lit(2.0) * prec * rec / (prec + rec) * lit(1000000))
        / lit(1000000.0)).as("f1"))
  }

  /** q06: points → contiguous ranges. Consecutive error events of a user
    * closer than `gapSec` merge into one range (gaps-and-islands via
    * lag + running sum of session breaks).
    */
  def anomalyRanges(spark: SparkSession, sfDir: String, gapSec: Long): DataFrame =
    anomalyRanges(Tables.events(spark, sfDir), gapSec)

  def anomalyRanges(spark: SparkSession, sfDir: String): DataFrame =
    anomalyRanges(spark, sfDir, 1800L)

  def anomalyRanges(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val errs = events
      .filter(col("event_type") === "error")
      .select(col("user_id"), epochS(col("ts")).as("e"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("e"))
    errs
      .withColumn("prev_e", lag(col("e"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_e").isNull || col("e") - col("prev_e") > gapSec, 1).otherwise(0)
      )
      .withColumn(
        "session",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0))
      )
      .groupBy(col("user_id"), col("session"))
      .agg(
        min(col("e")).as("range_start"),
        max(col("e")).as("range_end"),
        count(lit(1)).as("n_events")
      )
      .filter(col("n_events") >= 2)
      .select(col("user_id"), col("range_start"), col("range_end"), col("n_events"))
  }

  /** q07: off-condition (`value < threshold` means the asset is off) —
    * on/off census + on-time statistics per event_type.
    */
  def offCondition(spark: SparkSession, sfDir: String, threshold: Double = 10.0): DataFrame = {
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .withColumn("is_on", when(col("value") >= threshold, 1).otherwise(0))
      .groupBy(col("event_type"))
      .agg(
        sum(col("is_on")).as("n_on"),
        sum(lit(1) - col("is_on")).as("n_off"),
        r4(exactAvg(when(col("is_on") === 1, col("value")))).as("avg_on_value")
      )
  }

  /** q08: train/eval split at 70% of the time span — per (event_type, phase)
    * statistics.
    */
  def trainTestSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"), col("value"))
      .withColumn("e", epochS(col("ts")))
    val bounds = ev
      .agg(min(col("e")).as("mn"), max(col("e")).as("mx"))
      .select(floor(col("mn") + (col("mx") - col("mn")) * 0.7).cast("long").as("split_e"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("phase", when(col("e") < col("split_e"), "train").otherwise("eval"))
      .groupBy(col("event_type"), col("phase"))
      .agg(count(lit(1)).as("n"), r4(exactAvg(col("value"))).as("avg_value"))
  }

  /** q09: diagnostics expansion — pull the numeric payload out of the props
    * key/value blob and aggregate per key bucket (the distributed analog of
    * scheduler.py:636-656's diagnostics widening; extraction is a codegen'd
    * regexp, no driver loop).
    */
  def diagExpand(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("props"), col("value"))
      .withColumn("diag_k", regexp_extract(col("props"), "([0-9]+)", 1).cast("int"))
      .groupBy(col("event_type"))
      .agg(
        r4(exactAvg(col("diag_k"))).as("avg_diag"),
        max(col("diag_k")).as("max_diag"),
        countDistinct(col("diag_k")).as("n_distinct_diag"),
        r4(exactAvg(col("value"))).as("avg_value")
      )
  }

  /** q48: funnel conversion — for each signup, was there a purchase by the
    * same user within the attribution window? The range join carries the
    * user key, so both sides shuffle once on user_id and the time predicate
    * only runs within a user's own partition — never a time cross-product.
    */
  def funnelConversion(spark: SparkSession, sfDir: String, windowSec: Long = 3600L): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), epochS(col("ts")).as("e"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"), col("e"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("e").as("pe"))
    signups
      .join(purchases,
        col("user_id") === col("p_user") &&
          col("pe") >= col("e") && col("pe") <= col("e") + windowSec,
        "left_outer")
      .groupBy(col("user_id"), col("event_id"))
      .agg(max(when(col("p_user").isNotNull, 1).otherwise(0)).as("converted"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_signups"),
        sum(col("converted")).as("n_converted"),
        r4(sum(col("converted")).cast("double") / count(lit(1))).as("conv_rate"))
  }

  /** q171: funnel latency — q48 answers WHETHER a signup converts inside
    * the window; this answers HOW FAST: per signup, the lag to the FIRST
    * qualifying purchase (min over the same user-keyed range join, so
    * the join shape and scale posture are identical to q48 — one shuffle
    * on user_id, the time predicate runs inside each user's partition),
    * then the corpus-wide latency profile. Lags are exact integer
    * seconds: the mean divides a decimal-exact sum and the quantiles
    * interpolate two integers in one IEEE op each — cross-engine clean.
    */
  def funnelLatency(spark: SparkSession, sfDir: String,
                    windowSec: Long = 3600L): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        epochS(col("ts")).as("e"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"), col("e"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("e").as("pe"))
    val lags = signups
      .join(purchases,
        col("user_id") === col("p_user") &&
          col("pe") >= col("e") && col("pe") <= col("e") + windowSec,
        "left_outer")
      .groupBy(col("user_id"), col("event_id"))
      .agg(min(col("pe") - col("e")).as("lag_s"))
    lags.agg(
      count(lit(1)).as("n_signups"),
      sum(when(col("lag_s").isNotNull, 1L).otherwise(0L)).as("n_converted"),
      (round(sum(col("lag_s").cast("decimal(18,2)")).cast("double")
        / sum(when(col("lag_s").isNotNull, 1).otherwise(0)) * 10000) / 10000)
        .as("avg_lag_s"),
      (round(expr("percentile(lag_s, 0.5)") * 10000) / 10000)
        .as("median_lag_s"),
      (round(expr("percentile(lag_s, 0.9)") * 10000) / 10000)
        .as("p90_lag_s"),
      max(col("lag_s")).cast("bigint").as("max_lag_s"))
  }

  /** q49: median absolute deviation per series — the robust dispersion
    * statistic (outlier-insensitive, unlike stddev). Two exact median
    * passes through [[Percentiles.exactQuantiles]] (count-and-locate, so no
    * task buffers a whole group): the per-series median (tiny, broadcast
    * back), then the median of absolute deviations.
    */
  def madPerSeries(spark: SparkSession, sfDir: String): DataFrame = {
    // (a pre-engine spread + DISK pin of the raw event slice was measured
    // SLOWER than letting the two count-and-locate passes re-scan — the
    // checkpointed distinct-value counts inside the engine already bound
    // the repeated work)
    val ev = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val med = Percentiles.exactQuantiles(ev, "event_type", "value", Seq("m" -> 0.5))
      .select(col("event_type"), col("qv").as("m"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("value") - col("m")).as("d"))
    val mad = Percentiles.exactQuantiles(dev, "event_type", "d", Seq("mad" -> 0.5))
      .select(col("event_type"), r4(col("qv")).as("mad"))
    mad.join(
      ev.groupBy(col("event_type")).agg(count(lit(1)).as("n")), "event_type")
  }

  /** q10: dataset schema / component inventory — per-series row counts,
    * cardinalities and value envelopes (schema.py:23-98 infers the schema by
    * scanning files; here it is one aggregate over the data).
    */
  def schemaInfer(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_users"),
        min(epochS(col("ts"))).as("min_ts"),
        max(epochS(col("ts"))).as("max_ts"),
        round(min(col("value")), 4).as("min_value"),
        round(max(col("value")), 4).as("max_value"),
        r4(exactAvg(col("value"))).as("avg_value")
      )
  }

  /** q67: event-type transition matrix — for each ordered pair of event
    * types, how often one follows the other within a user's stream, plus
    * the row-normalized transition probability (a first-order Markov model
    * of user behavior; the sequence-mining counterpart to q48's fixed
    * funnel). The lag window partitions per user — millions of small
    * independent partitions — and everything after it is a
    * |types|²-row aggregate.
    */
  def transitionMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type")).agg(sum(col("n")).as("row_total"))
    trans.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (round(col("n").cast("double") / col("row_total") * 10000) / 10000).as("p"))
  }

  /** q245: entropy rate of the user event-type Markov chain — H =
    * Σᵢ π(i)·Hᵢ with Hᵢ = −Σⱼ p(j|i)·ln p(j|i) over q67's transition
    * counts, plus the per-state conditional entropies. The
    * predictability number behind the transition matrix: H → 0 means
    * journeys are deterministic (prefetchable, compressible), H → ln k
    * means memoryless traffic. Stationary π is estimated as the
    * FROM-state share of observed transitions; all counting is exact and
    * each p·ln p term is decimal-snapped over the k² matrix rows only.
    */
  def entropyRate(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = trans.groupBy(col("from_type")).agg(sum(col("n")).as("rt"))
    val grand = trans.agg(sum(col("n")).as("g"))
    val hRow = trans.join(rowTot, "from_type")
      .withColumn("p", col("n").cast("double") / col("rt").cast("double"))
      .withColumn("t", (-col("p") * log(col("p"))).cast("decimal(28,12)"))
      .groupBy(col("from_type"), col("rt"))
      .agg(sum(col("t")).cast("double").as("h_cond"))
    val total = hRow.crossJoin(broadcast(grand))
      .withColumn("pi", col("rt").cast("double") / col("g").cast("double"))
      .withColumn("term", (col("pi") * col("h_cond")).cast("decimal(28,12)"))
    val hRate = total.agg(sum(col("term")).cast("double").as("h_rate"))
    total.crossJoin(broadcast(hRate))
      .select(col("from_type"), col("rt").as("n_from"),
        (round(col("pi") * lit(1000000)) / lit(1000000.0)).as("pi"),
        (round(col("h_cond") * lit(1000000)) / lit(1000000.0)).as("h_cond"),
        (round(col("h_rate") * lit(1000000)) / lit(1000000.0)).as("h_rate"))
  }

  /** q246: busiest hopping windows — native window(ts, 1h, 15m) hopping
    * aggregation (each event lands in 4 overlapping frames via Catalyst's
    * window Expand, no self-join), then the top-3 windows per series by
    * count. The sliding-peak detector q101's fixed hour buckets miss when
    * a burst straddles a bucket edge; candidate windows aggregate first,
    * so the top-N window runs over (series × frames), never events.
    */
  def hoppingPeaks(spark: SparkSession, sfDir: String, topN: Int = 3): DataFrame = {
    val agg = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        window(col("ts"), "1 hour", "15 minutes").as("win"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(col("value").cast("decimal(18,6)")).cast("double")
          / count(lit(1)) * lit(10000)) / lit(10000.0)).as("avg_value"))
    val rankW = Window.partitionBy(col("event_type"))
      .orderBy(col("n_events").desc, col("win.start"))
    agg
      .withColumn("rnk", row_number().over(rankW))
      .where(col("rnk") <= topN)
      .select(col("event_type"), col("rnk"),
        unix_timestamp(col("win.start")).as("win_start"),
        col("n_events"), col("avg_value"))
  }

  /** q63: weekly cohort retention — users grouped by first-activity week
    * (the cohort), then for each (cohort, week-offset) cell the fraction of
    * the cohort still active. The standard product-analytics triangle, as
    * three aggregations: distinct (user, week) activity, per-user first
    * week (a groupBy-min, not a window over a global sort), cohort sizes.
    * Activity rows join their user's cohort on user_id — at 100 TB that's
    * the natural co-partitioned key — and everything downstream is
    * cohort-cell-sized.
    */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val weeks = Tables.events(spark, sfDir)
      .select(col("user_id"),
        floor(TimeSeries.epochS(col("ts")) / 604800L).cast("long").as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    weeks
      .join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"), col("cohort_size"),
        (round(col("n_active").cast("double") / col("cohort_size") * 10000) / 10000)
          .as("retention"))
  }

  /** q79: gap-based sessionization — the batch analog of the streaming
    * sessionizer (streaming/Sessionize.scala): a new session starts when a
    * user's inter-event gap exceeds `gapSec`. Classic lag + running-sum
    * session ids, then one aggregate per (user, session). Both windows
    * partition per user — millions of small independent partitions at
    * scale, never a global sort — and boundaries compare integer epoch
    * seconds so no float/rounding edge can move a session break between
    * engines.
    */
  def sessionization(events: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("ep", TimeSeries.epochS(col("ts")))
      .withColumn("prev", lag(col("ep"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ep") - col("prev") > gapSec, 1L).otherwise(0L))
      .withColumn("sess_n",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_n"))
      .agg(
        min(col("ep")).as("start_ep"),
        max(col("ep")).as("end_ep"),
        count(lit(1)).as("n_events"),
        (max(col("ep")) - min(col("ep"))).as("duration_sec"))
  }

  def sessionization(spark: SparkSession, sfDir: String, gapSec: Long = 14400L): DataFrame =
    sessionization(Tables.events(spark, sfDir), gapSec)

  /** q335: session-depth distribution — sessions histogrammed into
    * power-of-2 event-count buckets with event mass per bucket (the
    * engagement-shape table: a healthy product shows a fat 2-8 band; a
    * bot problem shows a 256+ tail carrying most of the events). Rides
    * q79's sessionization; the bucket is the integer bit-length idiom
    * (length(bin(n))−1, q277's contract — never a ln ratio).
    */
  def sessionDepth(events: DataFrame, gapSec: Long = 14400L): DataFrame = {
    val sess = sessionization(events, gapSec)
      .withColumn("bkt", (length(bin(col("n_events"))) - 1).cast("int"))
    val tot = sess.agg(count(lit(1)).as("ts"), sum(col("n_events")).as("te"))
    sess.groupBy(col("bkt"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .crossJoin(broadcast(tot))
      .select(col("bkt").as("log2_depth"),
        col("n_sessions"), col("n_events"),
        (round(col("n_sessions").cast("double") / col("ts").cast("double")
          * lit(10000)) / lit(10000.0)).as("session_share"),
        (round(col("n_events").cast("double") / col("te").cast("double")
          * lit(10000)) / lit(10000.0)).as("event_share"))
  }

  def sessionDepth(spark: SparkSession, sfDir: String): DataFrame =
    sessionDepth(Tables.events(spark, sfDir))

  /** q336: user-base overlap between event types — Jaccard of the DISTINCT
    * user sets per type pair ("do the people who error also purchase"),
    * the audience-overlap table feature-flag and funnel work leans on.
    * One distinct (type, user) shuffle; the pair intersection joins on
    * user and is bounded by per-user type combinations (≤ |types|² per
    * user); union sizes from the per-type totals.
    */
  def typeUserOverlap(events: DataFrame): DataFrame = {
    val tu = events.select(col("event_type"), col("user_id")).distinct()
    val sizes = tu.groupBy(col("event_type")).agg(count(lit(1)).as("nu"))
    val inter = tu.toDF("type_a", "user_id")
      .join(tu.toDF("type_b", "user_id"), "user_id")
      .where(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
    inter
      .join(sizes.toDF("type_a", "na"), "type_a")
      .join(sizes.toDF("type_b", "nb"), "type_b")
      .select(col("type_a"), col("type_b"), col("n_both"),
        (round(col("n_both").cast("double")
          / (col("na") + col("nb") - col("n_both")).cast("double")
          * lit(1000000)) / lit(1000000.0)).as("user_jaccard"))
  }

  def typeUserOverlap(spark: SparkSession, sfDir: String): DataFrame =
    typeUserOverlap(Tables.events(spark, sfDir))

  /** q337: Weibull fit of repeat-order gaps per market segment by
    * median-rank regression — ln(−ln(1−F)) regressed on ln(gap) over the
    * ordered gaps gives the SHAPE k (k < 1 ⇒ reorder hazard falls with
    * time: churn risk front-loaded; k > 1 ⇒ wear-out style reordering)
    * and scale λ; the distributional upgrade of q311's two quantile
    * points. Ranks come from a per-segment window; Benard's median rank
    * (i−0.3)/(n+0.4); both ln terms snapped before the decimal moment
    * sums; closed-form OLS per segment.
    */
  def weibullFit(spark: SparkSession, sfDir: String): DataFrame = {
    def s12(c: org.apache.spark.sql.Column) = round(c * lit(1e12)) / lit(1e12)
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"),
      col("o_orderkey"))
    val gaps = Tables.orders(spark, sfDir)
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .where(col("prev").isNotNull)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        datediff(col("o_orderdate"), col("prev")).as("gap"))
      .where(col("gap") > 0)
    // ties in gap get arbitrary ranks, but tied rows share x, so the
    // (x, y) pair SET — and every moment sum — is tie-order invariant
    val ranked = gaps
      .withColumn("i", row_number().over(
        Window.partitionBy(col("segment")).orderBy(col("gap"))))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("segment"))))
      .withColumn("x", s12(log(col("gap").cast("double"))))
      .withColumn("y", s12(log(-log(lit(1.0)
        - (col("i") - lit(0.3)) / (col("n") + lit(0.4))))))
    ranked.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("x").cast("decimal(38,12)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(38,12)")).cast("double").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,10)"))
          .cast("double").as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,10)"))
          .cast("double").as("sxy"))
      .withColumn("nn", col("n_gaps").cast("double"))
      .withColumn("k", (col("sxy") - col("sx") * col("sy") / col("nn"))
        / (col("sxx") - col("sx") * col("sx") / col("nn")))
      .withColumn("lnlam", col("sx") / col("nn")
        - (col("sy") / col("nn")) / col("k"))
      .select(col("segment"), col("n_gaps"),
        (round(col("k") * lit(1000000)) / lit(1000000.0)).as("shape_k"),
        (round(exp(col("lnlam")) * lit(10000)) / lit(10000.0))
          .as("scale_days"),
        (round(col("k") * lit(1000000)) / lit(1000000.0) < 1.0)
          .as("front_loaded"))
  }

  /** q94: SCD type-2 change tracking — collapse each user's event stream
    * into validity intervals of its tracked attribute (event_type standing
    * in for "operating state"): one row per run of equal consecutive
    * values, `[valid_from, valid_to)` half-open with `valid_to` = the next
    * interval's start and NULL on the open current interval. This is the
    * warehouse dimension-history build (and the reference's predicted_ranges
    * in disguise: q06 merges POINTS by time gap, this merges RUNS by value
    * change).
    *
    * Shape: change flag (lag) → running-sum segment id → one aggregate per
    * segment → lead for the closing timestamp. All three windows and the
    * aggregate share the user_id hash partitioning, so the whole plan is
    * ONE shuffle on the series key plus the final output sort; integer
    * epoch-second comparisons throughout (no float boundary drift).
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("e"), col("event_id"))
    val seg = events
      .select(col("user_id"), col("event_type"), col("event_id"),
        TimeSeries.epochS(col("ts")).as("e"))
      .withColumn("prev_t", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev_t").isNull || col("prev_t") =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("seg", sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val byStart = Window.partitionBy(col("user_id")).orderBy(col("seg"))
    seg
      .groupBy(col("user_id"), col("seg"), col("event_type"))
      .agg(min(col("e")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      // seg is the interval ordinal per user — kept in the output as the
      // natural unique key (valid_from alone can tie when two same-second
      // events open adjacent intervals)
      .select(
        col("user_id"), col("seg").as("seg_n"), col("event_type"),
        col("valid_from"), col("valid_to"),
        col("n_events"), col("valid_to").isNull.as("is_current"))
  }

  def scd2Intervals(spark: SparkSession, sfDir: String): DataFrame =
    scd2Intervals(Tables.events(spark, sfDir))

  /** q99: market-basket lift over sessions — for every unordered pair of
    * event types, how much more often they co-occur in one session than
    * independence predicts: lift = P(a,b) / (P(a)·P(b)) with session-level
    * supports. The classic basket statistic, here diagnosing behavioral
    * coupling between event types (errors riding alongside purchases,
    * etc.); q60's PMI is its text-adjacency cousin, this is the SESSION
    * co-membership version.
    *
    * Scale: sessions come from the q79 gap windows (one user_id shuffle);
    * the baskets table collapses to DISTINCT (user, session, type) before
    * any join, so the self-join fans out |types-per-session|² ≤ |type
    * vocabulary|² per session on a co-partitioned key — never a corpus
    * cross product. Supports are ratios of exact longs; the two totals
    * broadcast.
    */
  def basketLift(events: DataFrame, gapSec: Long = 14400L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
    val st = events
      .select(col("user_id"), col("event_type"), col("event_id"),
        TimeSeries.epochS(col("ts")).as("ep"))
      .withColumn("prev", lag(col("ep"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ep") - col("prev") > gapSec, 1L).otherwise(0L))
      .withColumn("sess", sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("sess"), col("event_type"))
      .distinct()
    val nSess = st.select(col("user_id"), col("sess")).distinct()
      .agg(count(lit(1)).as("n_sess"))
    val single = st.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
    val pairs = st.toDF("user_id", "sess", "type_a")
      .join(st.toDF("user_id", "sess", "type_b"), Seq("user_id", "sess"))
      .where(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(broadcast(single.toDF("type_a", "c_a")), "type_a")
      .join(broadcast(single.toDF("type_b", "c_b")), "type_b")
      .crossJoin(broadcast(nSess))
      .select(
        col("type_a"), col("type_b"), col("c_ab"), col("c_a"), col("c_b"),
        (round(col("c_ab").cast("double") / col("n_sess") * 10000) / 10000).as("support"),
        (round(col("c_ab").cast("double") * col("n_sess") / (col("c_a") * col("c_b"))
          * 10000) / 10000).as("lift"))
  }

  def basketLift(spark: SparkSession, sfDir: String): DataFrame =
    basketLift(Tables.events(spark, sfDir))

  /** q100: top session paths — the most common event-type SEQUENCES users
    * walk inside one session (the clickstream-path rollup product teams
    * read; q67's transition matrix is its first-order projection, this
    * keeps whole paths). Consecutive repeats collapse (click,click,view →
    * click>view) so paths describe state changes, not dwell counts.
    *
    * Scale: session assembly is the q79 gap window (one user_id shuffle);
    * each session then folds to ONE path row via an order-embedded
    * aggregate — array_sort(collect_list(struct(ep, event_id, type))) —
    * which is deterministic under any partitioning because the sort key
    * rides inside the collected struct. `maxSteps` truncates each session
    * to its first N type CHANGES before the collect (one more window on
    * the same user_id shuffle), so a bot session with millions of
    * alternations cannot build an unbounded array on one row — the
    * standard path-analysis guard. Path counting is a map-side-combined
    * aggregate over session rows; the top-k is a TakeOrdered over the
    * path table (bounded by distinct paths, Zipf-small), never a global
    * sort of sessions.
    */
  def sessionPaths(events: DataFrame, gapSec: Long = 14400L, k: Int = 20,
                   maxSteps: Int = 512): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
    val paths = events
      .select(col("user_id"), col("event_type"), col("event_id"),
        TimeSeries.epochS(col("ts")).as("ep"))
      .withColumn("prev", lag(col("ep"), 1).over(w))
      .withColumn("prev_t", lag(col("event_type"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ep") - col("prev") > gapSec, 1L).otherwise(0L))
      .withColumn("sess", sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      // consecutive-repeat collapse: keep a row iff it opens a session or
      // changes type (prev_t is same-session by construction when is_new=0)
      .where(col("is_new") === 1L || col("prev_t") =!= col("event_type"))
      .withColumn("step", row_number().over(
        Window.partitionBy(col("user_id"), col("sess"))
          .orderBy(col("ep"), col("event_id"))))
      .where(col("step") <= maxSteps)
      .groupBy(col("user_id"), col("sess"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(ep, event_id, event_type)))," +
          " x -> x.event_type), '>')").as("path"))
    paths
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
      // single-partition window over the already-limited k rows only
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))))
      .select(col("rnk"), col("path"), col("n_sessions"))
  }

  def sessionPaths(spark: SparkSession, sfDir: String): DataFrame =
    sessionPaths(Tables.events(spark, sfDir))

  /** q105: point-in-time join — enrich probes with the dimension version
    * that was valid AT the probe's timestamp, against the q94 SCD-2
    * intervals. This is the feature-store correctness primitive: training
    * examples must see the attribute as it WAS, not as it is — an as-of
    * lookup against a VERSIONED dimension ([valid_from, valid_to)
    * half-open membership), where q33's as-of join finds the latest fact
    * ≤ t against an append-only log. Probes here are the events shifted
    * 30 min forward, so a probe near a state change resolves to the OLD
    * version while it was still valid — the exact case a naive
    * latest-version join gets wrong.
    *
    * Scale: equi-join on the series key with the interval bounds as a
    * residual range predicate — both sides shuffle once on user_id and
    * each probe meets only its own user's intervals (never a time
    * cross-product); intervals partition the timeline, so the residual
    * matches at most one row per probe. `probeMod` thins the oracle
    * output; production passes 1.
    */
  def pointInTimeJoin(events: DataFrame, shiftSec: Long = 1800L,
                      probeMod: Int = 97): DataFrame = {
    val iv = scd2Intervals(events).select(
      col("user_id"), col("event_type").as("dim_type"),
      col("valid_from"), col("valid_to"))
    val probes = events
      .where(col("event_id") % probeMod === 0)
      .select(col("event_id"), col("user_id"),
        (TimeSeries.epochS(col("ts")) + shiftSec).as("probe_e"))
    probes
      .join(iv,
        probes("user_id") === iv("user_id") &&
          col("probe_e") >= col("valid_from") &&
          (col("valid_to").isNull || col("probe_e") < col("valid_to")),
        "left_outer")
      .select(col("event_id"), probes("user_id"), col("probe_e"), col("dim_type"))
  }

  def pointInTimeJoin(spark: SparkSession, sfDir: String): DataFrame =
    pointInTimeJoin(Tables.events(spark, sfDir))

  /** q106: interval-overlap accounting — how much of each user's anomaly
    * time falls inside the daily maintenance window (02:00–04:00 UTC)?
    * Anomaly ranges (q06 gaps-and-islands) interval-join the maintenance
    * calendar and overlap seconds are pure integer arithmetic
    * (`max(0, min(ends) − max(starts))`); the ops question this answers is
    * "are these alarms just the maintenance crew?".
    *
    * Scale: the calendar side is one row per day in the data span —
    * thousands of rows at any horizon — so the interval join is a
    * BROADCAST nested-loop against a tiny side with an integer residual, a
    * deliberate plan (two BIG interval sets would instead bucket on a
    * coarse time key and equi-join the buckets, the q48 pattern). Range
    * totals and overlap totals come from the same ranges subtree (stage
    * reuse); one final slim join per user.
    */
  def maintenanceOverlap(events: DataFrame, startHour: Int = 2,
                         endHour: Int = 4): DataFrame = {
    val ranges = anomalyRanges(events)
    val wins = events
      .agg(min(TimeSeries.epochS(col("ts"))).as("mn"),
        max(TimeSeries.epochS(col("ts"))).as("mx"))
      .select(explode(expr("sequence(mn DIV 86400, mx DIV 86400)")).as("day"))
      .select((col("day") * 86400L + startHour * 3600L).as("w_start"),
        (col("day") * 86400L + endHour * 3600L).as("w_end"))
    val inMaint = ranges
      .join(broadcast(wins),
        col("range_start") < col("w_end") && col("w_start") < col("range_end"))
      .withColumn("ov",
        greatest(lit(0L),
          least(col("range_end"), col("w_end")) -
            greatest(col("range_start"), col("w_start"))))
      .groupBy(col("user_id"))
      .agg(sum(col("ov")).as("maint_sec"))
    ranges
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ranges"),
        sum(col("range_end") - col("range_start")).as("anom_sec"))
      .join(inMaint, Seq("user_id"), "left_outer")
      .na.fill(0L, Seq("maint_sec"))
      .select(col("user_id"), col("n_ranges"), col("anom_sec"), col("maint_sec"),
        when(col("anom_sec") === 0L, lit(0.0))
          .otherwise(round(col("maint_sec").cast("double") / col("anom_sec") * 10000) / 10000)
          .as("maint_frac"))
  }

  def maintenanceOverlap(spark: SparkSession, sfDir: String): DataFrame =
    maintenanceOverlap(Tables.events(spark, sfDir))

  /** q118: weekly engagement stickiness — avg-DAU/WAU per week, the
    * product-analytics ratio ("of the users active this week, what share
    * shows up on a given day"). Everything reduces through the DISTINCT
    * (user, day) pairs first — one dedup shuffle bounded by users×days,
    * never raw events; from those rows, user-days and active days are
    * plain counts and WAU is a distinct-user count per week. The two
    * divides are the only float ops, on exact integers.
    */
  def stickiness(events: DataFrame): DataFrame = {
    val userDays = events
      .select(col("user_id"),
        floor(epochS(col("ts")) / 86400L).cast("long").as("day_num"))
      .distinct()
      .withColumn("wk", floor(col("day_num") / 7L).cast("long"))
    userDays.groupBy(col("wk"))
      .agg(
        count(lit(1)).as("n_user_days"),
        countDistinct(col("user_id")).as("wau"),
        countDistinct(col("day_num")).as("days_active"))
      .select(col("wk"), col("n_user_days"), col("wau"), col("days_active"),
        r4(col("n_user_days").cast("double") / col("days_active")).as("avg_dau"),
        r4(col("n_user_days").cast("double") / col("days_active") / col("wau"))
          .as("stickiness"))
  }

  def stickiness(spark: SparkSession, sfDir: String): DataFrame =
    stickiness(Tables.events(spark, sfDir))

  /** q124: incident coalescing — anomaly ranges padded by a ±guard band
    * and MERGED where the padded intervals overlap (one outage with a
    * 10-minute quiet patch is one incident, not three). The classic
    * interval-union sweep as a declarative plan: per user, order by start
    * and open a new island when the start clears the running max of all
    * previous ends (cumulative-max window) — one shuffle on the series
    * key, all-integer arithmetic end to end. The pad must exceed half the
    * sessionization gap for merging to be reachable (raw ranges are
    * already > gapSec apart), so the default guard band is 2·padSec =
    * 2400 s against the 1800 s session gap.
    */
  def mergedIncidents(events: DataFrame, gapSec: Long = 1800L,
                      padSec: Long = 1200L): DataFrame = {
    val padded = anomalyRanges(events, gapSec)
      .select(col("user_id"),
        (col("range_start") - padSec).as("s"),
        (col("range_end") + padSec).as("e"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
    padded
      .withColumn("pm", max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("pm").isNull || col("s") > col("pm"), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("nr"), min(col("s")).as("ms"), max(col("e")).as("me"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("nr")).as("n_raw"),
        count(lit(1)).as("n_merged"),
        sum(col("me") - col("ms")).as("covered_sec"),
        max(col("me") - col("ms")).as("longest_sec"))
  }

  def mergedIncidents(spark: SparkSession, sfDir: String): DataFrame =
    mergedIncidents(Tables.events(spark, sfDir))

  /** q126: session-duration histogram — gap-sessionized user activity
    * (q79's islands) reduced to a power-of-2 duration histogram (q70's
    * integer-exact bin idiom) with corpus share per bucket. The
    * state-sizing input for the streaming sessionizer: it says what
    * session-timeout state lifetime actually looks like. One shuffle to
    * sessionize, O(log duration) output rows.
    */
  def sessionDurations(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"), epochS(col("ts")).as("e"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("e"), col("event_id"))
    val durs = ev
      .withColumn("prev", lag(col("e"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("e") - col("prev") > gapSec, 1L).otherwise(0L))
      .withColumn("sess",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess"))
      .agg((max(col("e")) - min(col("e"))).as("dur"))
    val hist = durs
      .withColumn("bucket", (length(bin(col("dur") + 1L)) - 1).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("dur")).as("dur_sum"))
    val tot = hist.agg(sum(col("n_sessions")).as("total"))
    hist.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_sessions"),
        r4(col("dur_sum").cast("double") / col("n_sessions")).as("mean_dur"),
        (round(col("n_sessions").cast("double") / col("total") * 1000000)
          / 1000000).as("share"))
  }

  def sessionDurations(spark: SparkSession, sfDir: String): DataFrame =
    sessionDurations(Tables.events(spark, sfDir))

  /** q135: Kaplan–Meier survival curve for signup→first-purchase — the
    * censoring-aware upgrade of q48's fixed-window funnel: a user who
    * signed up yesterday and hasn't purchased is NOT a failure, they're
    * censored at the observation end, and KM is the standard estimator
    * that uses them correctly. Day-granularity: per user, duration to
    * first purchase at-or-after signup (or to the corpus max time when
    * censored); at each event day S multiplies by (1 − d/n_risk).
    *
    * Scale shape: per-user durations reduce through two aggregates on the
    * user key; the KM recursion itself runs on the DAY GRID (bounded rows,
    * q114's idiom) — the cumulative product is exp of a running sum of
    * decimal-snapped ln factors, with an explicit zero flag once any
    * factor hits 0 so ln(0) never enters the sum.
    */
  def survivalCurve(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), epochS(col("ts")).as("e"))
    val tmax = ev.agg(max(col("e")).as("tmax"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("e")).as("s"))
    val pu = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("e").as("pe"))
    val durs = su.join(pu, Seq("user_id"), "left_outer")
      .withColumn("pe2", when(col("pe") >= col("s"), col("pe")))
      .groupBy(col("user_id"), col("s"))
      .agg(min(col("pe2")).as("p"))
      .crossJoin(broadcast(tmax))
      .withColumn("event", col("p").isNotNull)
      .withColumn("t",
        when(col("event"), expr("(p - s) div 86400"))
          .otherwise(expr("(tmax - s) div 86400")))
    val grid = durs.groupBy(col("t")).agg(
      sum(when(col("event"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("event"), 1L).otherwise(0L)).as("c"))
    // single-partition windows over the bounded day grid only
    val w = Window.orderBy(col("t"))
    grid
      .withColumn("total", sum(col("d") + col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("before", coalesce(sum(col("d") + col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("total") - col("before"))
      .withColumn("lnterm",
        when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk")))
          .otherwise(lit(0.0)).cast("decimal(28,20)"))
      .withColumn("zf", when(col("d") >= col("n_risk") && col("d") > 0, 1).otherwise(0))
      .withColumn("lsum", sum(col("lnterm")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("anyzero", max(col("zf")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("d") > 0)
      .select(col("t").as("t_day"), col("n_risk"),
        col("d").as("d_events"), col("c").as("c_censored"),
        when(col("anyzero") === 1, lit(0.0))
          .otherwise(round(exp(col("lsum").cast("double")) * 1000000) / 1000000)
          .as("surv"))
  }

  def survivalCurve(spark: SparkSession, sfDir: String): DataFrame =
    survivalCurve(Tables.events(spark, sfDir))

  /** Per-series Tukey fences (lo = Q1 − 1.5·IQR, hi = Q3 + 1.5·IQR) from
    * one exact-quantile pass, quartiles snapped to 6 dp — the shared
    * input of q261's census and q283's detector comparison.
    */
  private def tukeyFences(ev: DataFrame): DataFrame =
    Percentiles.exactQuantiles(ev, "event_type", "value",
        Seq("q1" -> 0.25, "q3" -> 0.75))
      .groupBy(col("event_type"))
      .agg(
        (round(max(when(col("qname") === "q1", col("qv"))) * lit(1000000))
          / lit(1000000.0)).as("q1"),
        (round(max(when(col("qname") === "q3", col("qv"))) * lit(1000000))
          / lit(1000000.0)).as("q3"))
      .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))

  /** q261: Tukey-fence outlier census per series — the IQR rule
    * (lo = Q1 − 1.5·IQR, hi = Q3 + 1.5·IQR), the third robust-outlier
    * lens beside q41's z-scores (moment-based, masked by the outliers
    * themselves) and q49's MAD (median-based scale): quartile fences are
    * what box plots and most data-quality dashboards actually draw. One
    * exact-quantile pass for Q1/Q3, fences broadcast back, tail counts
    * from one conditional aggregate over the same scan.
    */
  def iqrOutliers(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"), col("value"))
    ev.join(broadcast(tukeyFences(ev)), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("q1")).as("q1"), max(col("q3")).as("q3"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_high"))
      .withColumn("pct_out",
        round((col("n_low") + col("n_high")).cast("double")
          / col("n").cast("double") * lit(10000)) / lit(10000.0))
  }

  def iqrOutliers(spark: SparkSession, sfDir: String): DataFrame =
    iqrOutliers(Tables.events(spark, sfDir))

  /** q271: weekly growth-accounting states — every (user, week) classified
    * as new (first ever week), retained (active the week before) or
    * resurrected (returns after a gap), plus churned counted into the
    * week AFTER the last activity (the standard growth ledger: actives(w)
    * = new + retained + resurrected, and churned(w) balances
    * actives(w−1) − retained(w)). One distinct (user, week) shuffle, one
    * user-keyed lag/lead window over it, bounded |weeks|-row output; the
    * trailing churn week is clipped at the observed max week + 1.
    */
  def lifecycleStates(events: DataFrame): DataFrame = {
    val uw = events.select(col("user_id"),
        (floor(floor(unix_timestamp(col("ts")) / 86400) / 7))
          .cast("bigint").as("wk"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    val mx = uw.agg(max(col("wk")).as("max_wk"))
    val lagged = uw
      .withColumn("pwk", lag(col("wk"), 1).over(w))
      .withColumn("nwk", lead(col("wk"), 1).over(w))
    val states = lagged.groupBy(col("wk")).agg(
      count(lit(1)).as("n_active"),
      sum(when(col("pwk").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("pwk") === col("wk") - 1, 1L).otherwise(0L))
        .as("n_retained"),
      sum(when(col("pwk").isNotNull && col("pwk") < col("wk") - 1, 1L)
        .otherwise(0L)).as("n_resurrected"))
    // churn lands in the week after the last (or gap-preceding) activity
    val churn = lagged.crossJoin(broadcast(mx))
      .where((col("nwk").isNull && col("wk") < col("max_wk"))
        || col("nwk") > col("wk") + 1)
      .select((col("wk") + 1).as("wk"))
      .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
    // FULL join: a week with zero actives can still owe a churn count
    // (everyone's last activity was the week before) — a left join would
    // silently drop it and break actives(w-1) = retained(w) + churned(w)
    states.join(churn, Seq("wk"), "full")
      .select(col("wk"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  def lifecycleStates(spark: SparkSession, sfDir: String): DataFrame =
    lifecycleStates(Tables.events(spark, sfDir))

  /** q290: interval-union coverage per series — each event projects a
    * fixed-length active window [ts, ts+len); the union sweep merges
    * overlaps into segments and reports raw vs merged counts and total
    * covered seconds (sensor uptime, alert-storm compression, on-call
    * load — any "how much wall-clock was actually covered" question that
    * naive n×len double-counts). Classic sweep as two windows on the
    * series-keyed sort: a segment opens where start exceeds the running
    * max end of every earlier interval (exclusive prefix max), segment id
    * = cumulative count of opens; both windows partition by series, and
    * everything after is per-segment aggregation. All integer seconds.
    */
  def intervalCoverage(events: DataFrame, lenSec: Int = 1800): DataFrame = {
    // Duplicate timestamps collapse to one weighted interval BEFORE the
    // sweep: identical intervals can never open a segment, and the distinct
    // start makes the window ORDER tie-free — a ROWS frame over TIED keys
    // has order-dependent frame contents, which the sf1 gate caught as
    // NONDETERMINISTIC DuckDB oracle output (two runs of the same query,
    // different segment counts) once partitions reached ~200k rows. The
    // weighted pre-aggregate is also the better plan: the O(n) window runs
    // over distinct starts, not raw events.
    val iv = events.select(col("event_type"),
        unix_timestamp(col("ts")).as("s"))
      .groupBy(col("event_type"), col("s"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("e", col("s") + lenSec)
    val ord = Window.partitionBy(col("event_type")).orderBy(col("s"))
    val seg = iv
      .withColumn("pmax",
        max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("opens",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L))
      .withColumn("seg",
        sum(col("opens")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    seg.groupBy(col("event_type"), col("seg"))
      .agg(sum(col("cnt")).as("n"), min(col("s")).as("ss"), max(col("e")).as("se"))
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_intervals"),
        count(lit(1)).as("n_merged"),
        sum(col("se") - col("ss")).as("covered_sec"))
      .withColumn("merge_ratio",
        round(col("n_merged").cast("double")
          / col("n_intervals").cast("double") * lit(10000)) / lit(10000.0))
  }

  def intervalCoverage(spark: SparkSession, sfDir: String): DataFrame =
    intervalCoverage(Tables.events(spark, sfDir))

  /** q301: peak concurrency per series — the maximum number of
    * simultaneously-active [ts, ts+len) windows, with the earliest time it
    * is reached (capacity sizing: q290 says how much wall-clock is
    * covered, this says how DEEP the busiest pile-up is). The classic
    * +1/−1 sweep: starts and ends unioned into one delta stream, running
    * sum over the series-keyed sort with ends ordered BEFORE coincident
    * starts (half-open intervals), argmax with earliest-time tie-break.
    * All integers; one window per series, same accepted class as q79.
    */
  def peakConcurrency(events: DataFrame, lenSec: Int = 1800): DataFrame = {
    val starts = events.select(col("event_type"),
      unix_timestamp(col("ts")).as("t"), lit(1L).as("delta"))
    val ends = events.select(col("event_type"),
      (unix_timestamp(col("ts")) + lenSec).as("t"), lit(-1L).as("delta"))
    val ord = Window.partitionBy(col("event_type"))
      .orderBy(col("t"), col("delta")) // -1 sorts first: close before open
    val run = starts.unionByName(ends)
      .withColumn("active",
        sum(col("delta")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    val best = Window.partitionBy(col("event_type"))
      .orderBy(col("active").desc, col("t"))
    run
      .withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .join(events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals")), "event_type")
      .select(col("event_type"), col("n_intervals"),
        col("active").as("peak_concurrency"), col("t").as("peak_at"))
  }

  def peakConcurrency(spark: SparkSession, sfDir: String): DataFrame =
    peakConcurrency(Tables.events(spark, sfDir))

  /** q279: retention half-life — pooled cohort retention by week offset,
    * fitted as exponential decay (ln rate ~ offset OLS ⇒ half-life =
    * −ln 2 / slope). The single number product teams quote from q63's
    * whole triangle. Denominators count every cohort OLD ENOUGH to be
    * observable at the offset (missing cells are real zeros, not gaps);
    * ln terms are 1e-12-snapped before the decimal moment sums so the
    * fitted slope is engine-identical. Everything after the distinct
    * (user, week) shuffle is cohort-cell-sized.
    */
  def retentionHalflife(events: DataFrame): DataFrame = {
    val weeks = events.select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 604800L).cast("long").as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id"))
      .agg(min(col("week")).as("cw"))
    val sizes = cohorts.groupBy(col("cw")).agg(count(lit(1)).as("sz"))
    val mx = weeks.agg(max(col("week")).as("max_wk"))
    val offsets = weeks.join(cohorts, "user_id")
      .where(col("week") > col("cw"))
      .groupBy((col("week") - col("cw")).as("o"))
      .agg(count(lit(1)).as("num"))
    // observable denominator: cohorts with cw + o <= max_wk
    val dens = sizes.crossJoin(broadcast(mx))
      .crossJoin(offsets.select(col("o")))
      .where(col("cw") + col("o") <= col("max_wk"))
      .groupBy(col("o")).agg(sum(col("sz")).as("den"))
    val rates = offsets.join(dens, "o")
      .withColumn("rate", col("num").cast("double") / col("den").cast("double"))
      .where(col("rate") > 0)
      .withColumn("y", round(log(col("rate")) * lit(1e12)) / lit(1e12))
    val fit = rates.agg(
        count(lit(1)).as("n"),
        sum(col("o").cast("decimal(28,12)")).cast("double").as("sx"),
        sum(col("y").cast("decimal(28,12)")).cast("double").as("sy"),
        sum((col("o") * col("o")).cast("decimal(28,12)")).cast("double").as("sxx"),
        sum((col("o").cast("double") * col("y")).cast("decimal(28,12)"))
          .cast("double").as("sxy"))
      .withColumn("nn", col("n").cast("double"))
      .withColumn("slope",
        (col("nn") * col("sxy") - col("sx") * col("sy"))
          / (col("nn") * col("sxx") - col("sx") * col("sx")))
    rates.crossJoin(broadcast(fit.select(col("slope"))))
      .select(col("o").as("week_offset"), col("num"), col("den"),
        (round(col("rate") * lit(10000)) / lit(10000.0)).as("rate"),
        (round(col("slope") * lit(1000000)) / lit(1000000.0)).as("slope"),
        (round(when(col("slope") < 0, -log(lit(2.0)) / col("slope"))
          .otherwise(lit(0.0)) * lit(10000)) / lit(10000.0))
          .as("half_life_weeks"))
  }

  def retentionHalflife(spark: SparkSession, sfDir: String): DataFrame =
    retentionHalflife(Tables.events(spark, sfDir))

  /** q282: conversion rate by session ENTRY type — does the first action
    * of a session predict purchase? (the landing-page question, asked of
    * q79's sessions). Same lag + running-sum sessionization shuffle;
    * entry event via rn = 1 on the session-keyed sort, conversion = any
    * purchase in the session; the census is |entry types| rows.
    */
  def sessionConversion(events: DataFrame, gapSec: Long = 14400): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ep"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, 0)
    val sess = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ep"))
      .withColumn("prev", lag(col("ep"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ep") - col("prev") > gapSec, 1)
          .otherwise(0))
      .withColumn("sess_n", sum(col("is_new")).over(cum))
    val sw = Window.partitionBy(col("user_id"), col("sess_n"))
      .orderBy(col("ep"), col("event_id"))
    val per = sess
      .withColumn("rn", row_number().over(sw))
      .groupBy(col("user_id"), col("sess_n"))
      .agg(max(when(col("rn") === 1, col("event_type"))).as("entry_type"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("converted"),
        count(lit(1)).as("n_events"))
    per.groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted").cast("bigint")).as("n_converted"),
        // exact integer sum / count — a double avg would be
        // partition-order-dependent
        (round(sum(col("n_events")).cast("double") / count(lit(1))
          * lit(10000)) / lit(10000.0)).as("avg_events"))
      .withColumn("conversion_rate",
        round(col("n_converted").cast("double")
          / col("n_sessions").cast("double") * lit(10000)) / lit(10000.0))
  }

  def sessionConversion(spark: SparkSession, sfDir: String): DataFrame =
    sessionConversion(Tables.events(spark, sfDir))

  /** q283: detector-agreement census — the z-score rule (|v−μ| > 3σ,
    * cross-multiplied so no division enters the predicate) vs the Tukey
    * fence rule (q261) flagging the SAME points, scored as pointwise
    * Jaccard and Cohen's kappa per series. The model-governance question
    * ("do my two anomaly detectors even agree?") that decides whether an
    * ensemble adds signal or redundancy. Moments and quantiles each come
    * from one pass; the comparison is a single conditional aggregate.
    */
  def detectorAgreement(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type"), col("value"))
    val mom = ev.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("s1"),
        sum((col("value") * col("value")).cast("decimal(28,6)")).as("s2"))
      // single-reading series have no sample sd: excluded from the panel
      // rather than crashing the (n−1) divide (round-10 fuzz finding;
      // same contract as StatTests.detectorFlags)
      .where(col("n") >= 2)
      .withColumn("m", col("s1").cast("double") / col("n"))
      .withColumn("sd", sqrt(
        (col("s2").cast("double") - col("n") * col("m") * col("m"))
          / (col("n") - 1)))
      .select(col("event_type"), col("m"), col("sd"))
    val qs = tukeyFences(ev).select(col("event_type"), col("lo"), col("hi"))
    val flagged = ev.join(broadcast(mom), "event_type")
      .join(broadcast(qs), "event_type")
      .withColumn("fa", abs(col("value") - col("m")) > lit(3.0) * col("sd"))
      .withColumn("fb", col("value") < col("lo") || col("value") > col("hi"))
    flagged.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        sum(when(col("fa"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("fb"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("fa") && col("fb"), 1L).otherwise(0L)).as("n_both"))
      .withColumn("pa", col("n_a").cast("double") / col("n"))
      .withColumn("pb", col("n_b").cast("double") / col("n"))
      .withColumn("po",
        (col("n_both") + (col("n") - col("n_a") - col("n_b") + col("n_both")))
          .cast("double") / col("n"))
      .withColumn("pe",
        col("pa") * col("pb") + (lit(1.0) - col("pa")) * (lit(1.0) - col("pb")))
      .select(col("event_type"), col("n"), col("n_a"), col("n_b"),
        col("n_both"),
        (round(when(col("n_a") + col("n_b") - col("n_both") > 0,
          col("n_both").cast("double")
            / (col("n_a") + col("n_b") - col("n_both")).cast("double"))
          .otherwise(lit(0.0)) * lit(10000)) / lit(10000.0)).as("jaccard"),
        (round(when(lit(1.0) - col("pe") > 0,
          (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .otherwise(lit(0.0)) * lit(10000)) / lit(10000.0)).as("kappa"))
  }

  def detectorAgreement(spark: SparkSession, sfDir: String): DataFrame =
    detectorAgreement(Tables.events(spark, sfDir))

  /** q418: strict ordered three-step funnel by weekday — the windowFunnel
    * semantics BI engines ship natively: a user reaches level 3 off a
    * given view iff ∃ view → click → purchase with nondecreasing
    * timestamps all inside [view, view + W] (the window anchors at the
    * FIRST step, unlike q48's per-pair window). Greedy earliest-next-step
    * is exact for a first-step-anchored window, so the chain check is two
    * min-aggregated range joins, not a 3-way interval join. Levels roll
    * up by the view's weekday — the "which acquisition day converts"
    * table.
    *
    * Scale: both joins are user-keyed equi-joins with the time predicate
    * evaluated inside each user's partition (q48's shape); per-view
    * chains reduce before the weekday rollup, so output is 7 rows no
    * matter the corpus.
    */
  def funnelSteps(events: DataFrame, windowSec: Long = 3600L): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"),
      col("event_type"), unix_timestamp(col("ts")).as("e"))
    // engine-neutral weekday: integer arithmetic on the epoch day (the
    // q375 idiom), never a calendar function two engines could disagree on
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("e"),
        pmod(floor(col("e") / 86400L) + 4, lit(7)).cast("int").as("dow"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("e").as("ce"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("e").as("pe"))
    val step2 = views
      .join(clicks, col("user_id") === col("c_user")
        && col("ce") >= col("e") && col("ce") <= col("e") + windowSec,
        "left_outer")
      .groupBy(col("user_id"), col("event_id"), col("e"), col("dow"))
      .agg(min(col("ce")).as("cmin"))
    val step3 = step2
      .join(purchases, col("user_id") === col("p_user")
        && col("cmin").isNotNull
        && col("pe") >= col("cmin") && col("pe") <= col("e") + windowSec,
        "left_outer")
      .groupBy(col("user_id"), col("event_id"), col("dow"), col("cmin"))
      .agg(max(when(col("p_user").isNotNull, 1L).otherwise(0L))
        .as("reached3"))
    step3.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_views"),
        sum(when(col("cmin").isNotNull, 1L).otherwise(0L)).as("n_level2"),
        sum(col("reached3")).as("n_level3"))
      .select(col("dow"), col("n_views"), col("n_level2"), col("n_level3"),
        (round(col("n_level2").cast("double")
          / col("n_views").cast("double") * 1000000) / 1000000.0)
          .as("rate2"),
        (round(col("n_level3").cast("double")
          / col("n_views").cast("double") * 1000000) / 1000000.0)
          .as("rate3"))
  }

  def funnelSteps(spark: SparkSession, sfDir: String): DataFrame =
    funnelSteps(Tables.events(spark, sfDir))

  /** q446: tolerance band join — every event of the reference series
    * (the lexicographically first event_type: a deterministic anchor
    * both engines re-derive from the data) matched to every OTHER
    * series' events within ±`bandS` seconds, censused per series. The
    * suite's join ladder so far is equi (q15), asof backward/forward
    * (q33/q169), interval overlap (q106), point-in-time (q105); the
    * band join is the remaining shape — "what fired around this alert".
    *
    * The Spark-first form is the point: the non-reference side
    * replicates to its 3 adjacent band buckets (floor(e/band) ± 1), the
    * join is a plain EQUI join on the bucket id, and the exact
    * |Δt| ≤ band predicate filters residually — never an inequality /
    * nested-loop join, so at 100 TB it shuffles on a dense integer key
    * with map-side-combinable downstream aggregation and AQE-splittable
    * skew. n_ref_matched counts distinct matched reference timestamps.
    */
  /** The q446 band half-width, shared with the oracle SQL (which is
    * generated from this constant) so a non-default invocation can't
    * silently diverge from what correctness gates.
    */
  val BandJoinBandS: Int = 300

  def bandJoin(events: DataFrame, bandS: Int = BandJoinBandS): DataFrame = {
    val ev = events.select(col("event_type"), epochS(col("ts")).as("e"))
    val ref = ev.agg(min(col("event_type")).as("ref_type"))
    val a = ev.join(broadcast(ref), col("event_type") === col("ref_type"))
      .select(col("e").as("ea"), floor(col("e") / bandS).as("bkt"))
    val b = ev.crossJoin(broadcast(ref))
      .where(col("event_type") =!= col("ref_type"))
      .select(col("event_type"), col("e").as("eb"),
        explode(array(lit(-1L), lit(0L), lit(1L))).as("db"))
      .select(col("event_type"), col("eb"),
        (floor(col("eb") / bandS) + col("db")).as("bkt"))
    a.join(b, "bkt")
      .where(abs(col("eb") - col("ea")) <= bandS)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("ea")).as("n_ref_matched"),
        (round(sum(abs(col("eb") - col("ea")).cast("decimal(28,6)"))
          .cast("double") / count(lit(1)) * 10000) / 10000)
          .as("mean_abs_dt"))
  }

  def bandJoin(spark: SparkSession, sfDir: String): DataFrame =
    bandJoin(Tables.events(spark, sfDir))
}
