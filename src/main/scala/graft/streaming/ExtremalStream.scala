package graft.streaming

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** One running extremal-index verdict per key per batch — q368's columns. */
case class ExtremalSnapshot(event_type: String, n_exceed: Long,
                            n_clusters: Long, max_cluster: Long,
                            theta: Double, mean_cluster: Double)

/** O(1) per-key fold state: the runs-declustering counters over closed
  * days plus the open day's exact 6-dp micro-unit accumulator.
  */
case class ExtremalState(lastExcDay: Long, nExceed: Long, nClusters: Long,
                         maxRun: Long, curRun: Long, curDay: Long,
                         svMicros: Long, cnt: Long)

/** Streaming extremal-index monitor — the unbounded-stream twin of q368's
  * runs declustering (ops/ExtremeStats.scala `extremalIndex`). Thresholds
  * are a broadcast input (the batch plan's exact per-series q90 — an
  * unbounded stream cannot know its own quantiles), `sep` the same gap
  * rule. Each closed day's mean compares against the fence; exceedance
  * days extend or open clusters exactly as the batch lag-window does. The
  * end-of-batch snapshot folds the still-open day as if final, so after
  * the same rows under ANY micro-batch slicing the snapshot equals batch
  * `extremalIndex` run with the same fences (ExtremalStreamSpec, 3
  * slicings).
  *
  * This is the monitor a reliability team actually runs: θ collapsing
  * toward 0 means extremes have started arriving in storms — the
  * alert-fatigue regime — and the streaming form sees the collapse the
  * day it happens instead of at the next batch audit.
  */
object ExtremalStream {

  private def snap6Micros(x: Double): Long =
    JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  /** Fold one closed day's mean through the batch declustering rule. */
  private[graft] def foldDay(st: ExtremalState, day: Long, m: Double,
                             thr: Double, sep: Int): ExtremalState = {
    if (!(m > thr)) st
    else {
      val newCluster = st.lastExcDay == Long.MinValue ||
        day - st.lastExcDay > sep
      val run = if (newCluster) 1L else st.curRun + 1L
      st.copy(lastExcDay = day, nExceed = st.nExceed + 1,
        nClusters = if (newCluster) st.nClusters + 1 else st.nClusters,
        maxRun = math.max(st.maxRun, run), curRun = run)
    }
  }

  class ExtremalProcessor(thresholds: Map[String, Double], sep: Int)
      extends StatefulProcessor[String, SensorReading, ExtremalSnapshot] {
    @transient private var st: ValueState[ExtremalState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState("extremal",
        Encoders.product[ExtremalState], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[SensorReading],
        timerValues: TimerValues): Iterator[ExtremalSnapshot] = {
      val thr = thresholds.get(key)
      if (thr.isEmpty) { rows.foreach(_ => ()); return Iterator.empty }
      var s = if (st.exists()) st.get()
        else ExtremalState(Long.MinValue, 0L, 0L, 0L, 0L, Long.MinValue,
          0L, 0L)
      rows.toArray.sortBy(r => (StreamTime.micros(r.ts), r.event_id)).foreach { r =>
        val day = math.floorDiv(StreamTime.micros(r.ts), 86400L * 1000000L)
        if (s.curDay == Long.MinValue) s = s.copy(curDay = day)
        if (day > s.curDay) {
          s = foldDay(s, s.curDay, openDayMean(s), thr.get, sep)
            .copy(curDay = day, svMicros = 0L, cnt = 0L)
        }
        // past-day rows after rollover are dropped (watermark contract)
        if (day == s.curDay) {
          s = s.copy(svMicros = s.svMicros + snap6Micros(r.value),
            cnt = s.cnt + 1)
        }
      }
      st.update(s)
      snapshot(key, s, thr.get)
    }

    private def openDayMean(s: ExtremalState): Double =
      s.svMicros.toDouble / 1e6 / s.cnt

    /** End-of-batch view: fold the open day as if final, report q368's
      * row for this series (nothing until the first exceedance).
      */
    private def snapshot(key: String, s: ExtremalState,
                         thr: Double): Iterator[ExtremalSnapshot] = {
      if (s.cnt == 0) return Iterator.empty
      val fin = foldDay(s, s.curDay, openDayMean(s), thr, sep)
      if (fin.nExceed == 0) return Iterator.empty
      // batch r4 = round(x*10000)/10000 via Spark ROUND (HALF_UP)
      def r4(x: Double) = JBD.valueOf(x * 10000)
        .setScale(0, RoundingMode.HALF_UP).doubleValue() / 10000
      Iterator.single(ExtremalSnapshot(key, fin.nExceed, fin.nClusters,
        fin.maxRun,
        r4(fin.nClusters.toDouble / fin.nExceed),
        r4(fin.nExceed.toDouble / fin.nClusters)))
    }
  }

  def run(readings: Dataset[SensorReading],
          thresholds: Map[String, Double], sep: Int = 2,
          watermarkDelay: String = "10 minutes"): Dataset[ExtremalSnapshot] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .transformWithState(new ExtremalProcessor(thresholds, sep),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
