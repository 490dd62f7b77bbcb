package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** One Holt snapshot per key per batch — the same columns the q251 batch
  * query reports, so the two are directly comparable.
  */
case class HoltSnapshot(event_type: String, n_days: Long, level: Double,
                        trend: Double, forecast_7d: Double, mae: Double)

/** O(1) per-key fold state: Holt (l, b) over CLOSED days, the running
  * absolute-error sum, the first day's mean (needed to initialize b when
  * day 2 closes), and the open day's exact accumulator.
  */
case class HoltState(nClosed: Long, x1: Double, l: Double, b: Double,
                     sae: Double, curDay: Long, svMicros: Long, cnt: Long)

/** Streaming Holt linear-trend smoothing — the unbounded-stream twin of
  * q251's batch fold. State per series is O(1): the smoothed (level, trend)
  * pair over closed days plus one open-day mean accumulator. A day folds
  * into the Holt recursion the moment a later day's first reading arrives
  * (day rollover IS the window close); the end-of-batch snapshot folds the
  * still-open day as if it were final, so after the same rows under ANY
  * micro-batch slicing the snapshot equals the batch q251 result exactly
  * (HoltStreamSpec asserts it).
  *
  * Determinism: day means accumulate 6-dp-snapped micro-units (the exact
  * long-integer image of the batch plan's decimal(18,6) per-term casts) and
  * every recursion step applies the same `round(x·1e12)/1e12` snap the
  * batch Column expression uses — bit-identical state walks.
  */
object HoltStream {

  private[streaming] def snap12(x: Double): Double =
    java.math.BigDecimal.valueOf(x * 1e12)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e12

  private def snap6Micros(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  /** Fold one closed day's mean into the Holt state (q251's recursion). */
  private[graft] def foldDay(s: HoltState, m: Double): HoltState = {
    if (s.nClosed == 0) s.copy(nClosed = 1, x1 = m)
    else if (s.nClosed == 1) s.copy(nClosed = 2, l = m, b = m - s.x1)
    else {
      val lNew = snap12(0.5 * m + 0.5 * (s.l + s.b))
      val bNew = snap12(0.3 * (lNew - s.l) + 0.7 * s.b)
      val err = snap12(math.abs(m - (s.l + s.b)))
      s.copy(nClosed = s.nClosed + 1, l = lNew, b = bNew, sae = s.sae + err)
    }
  }

  class HoltProcessor
      extends StatefulProcessor[String, SensorReading, HoltSnapshot] {
    @transient private var st: ValueState[HoltState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState("holt", Encoders.product[HoltState],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[SensorReading],
        timerValues: TimerValues): Iterator[HoltSnapshot] = {
      var s = if (st.exists()) st.get()
        else HoltState(0L, 0.0, 0.0, 0.0, 0.0, Long.MinValue, 0L, 0L)
      rows.toArray.sortBy(r => (StreamTime.micros(r.ts), r.event_id)).foreach { r =>
        val day = math.floorDiv(StreamTime.micros(r.ts), 86400L * 1000000L)
        if (s.curDay == Long.MinValue) s = s.copy(curDay = day)
        if (day > s.curDay) {
          // rollover: the held day is complete — fold its mean
          s = foldDay(s, openDayMean(s)).copy(curDay = day,
            svMicros = 0L, cnt = 0L)
        }
        // readings for a PAST day after rollover are dropped (watermark
        // bounds this lateness); current-day readings accumulate
        if (day == s.curDay) {
          s = s.copy(svMicros = s.svMicros + snap6Micros(r.value),
            cnt = s.cnt + 1)
        }
      }
      st.update(s)
      snapshot(key, s)
    }

    private def openDayMean(s: HoltState): Double =
      snap12(s.svMicros.toDouble / 1e6 / s.cnt)

    /** End-of-batch view: fold the open day as if final, report q251's
      * columns. Emits nothing until two days of data exist.
      */
    private def snapshot(key: String, s: HoltState): Iterator[HoltSnapshot] = {
      if (s.cnt == 0) return Iterator.empty
      val fin = foldDay(s, openDayMean(s))
      if (fin.nClosed < 2) return Iterator.empty
      def r6(x: Double) =
        java.math.BigDecimal.valueOf(x * 1000000)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1000000.0
      val mae = if (fin.nClosed > 2) fin.sae / (fin.nClosed - 2) else 0.0
      Iterator.single(HoltSnapshot(key, fin.nClosed, r6(fin.l), r6(fin.b),
        r6(fin.l + 7.0 * fin.b), r6(mae)))
    }
  }

  def run(readings: Dataset[SensorReading],
          watermarkDelay: String = "10 minutes"): Dataset[HoltSnapshot] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .transformWithState(new HoltProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
