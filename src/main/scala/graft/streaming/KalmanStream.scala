package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** One Kalman snapshot per key per batch — the same columns the q287 batch
  * query reports, so the two are directly comparable.
  */
case class KalmanSnapshot(event_type: String, n_days: Long, level: Double,
                          p_var: Double, gain: Double,
                          mean_abs_innov: Double)

/** O(1) per-key fold state: the filtered (x, p, k) over closed days, the
  * running absolute-innovation sum, and the open day's exact accumulator.
  */
case class KalmanState(nClosed: Long, x: Double, p: Double, k: Double,
                       sae: Double, curDay: Long, svMicros: Long, cnt: Long)

/** Streaming 1-D Kalman filter (local-level, q=0.1, r=1.0) — the
  * unbounded-stream twin of q287's batch fold and the adaptive-gain member
  * of the streaming smoother family (HoltStream, HoltWintersStream,
  * SavGolStream). State per series is O(1); a day folds through the filter
  * recursion the moment a later day's first reading arrives, and the
  * end-of-batch snapshot folds the still-open day as if final — so after
  * the same rows under ANY micro-batch slicing the snapshot equals the
  * batch q287 result exactly (KalmanStreamSpec asserts it across three
  * slicings). Same micro-unit day means and 1e-12 snaps as the batch plan.
  */
object KalmanStream {

  private def snap12(x: Double): Double = HoltStream.snap12(x)

  private def snap6Micros(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  /** Fold one closed day's mean into the filter (q287's recursion). */
  private[graft] def foldDay(s: KalmanState, m: Double): KalmanState = {
    if (s.nClosed == 0) s.copy(nClosed = 1, x = m, p = 1.0, k = 0.0)
    else {
      val k1 = snap12((s.p + 0.1) / (s.p + 1.1))
      val xNew = snap12(s.x + k1 * (m - s.x))
      val pNew = snap12((1.0 - k1) * (s.p + 0.1))
      val err = snap12(math.abs(m - s.x))
      s.copy(nClosed = s.nClosed + 1, x = xNew, p = pNew, k = k1,
        sae = s.sae + err)
    }
  }

  class KalmanProcessor
      extends StatefulProcessor[String, SensorReading, KalmanSnapshot] {
    @transient private var st: ValueState[KalmanState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState("kalman", Encoders.product[KalmanState],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[SensorReading],
        timerValues: TimerValues): Iterator[KalmanSnapshot] = {
      var s = if (st.exists()) st.get()
        else KalmanState(0L, 0.0, 0.0, 0.0, 0.0, Long.MinValue, 0L, 0L)
      rows.toArray.sortBy(r => (StreamTime.micros(r.ts), r.event_id)).foreach { r =>
        val day = math.floorDiv(StreamTime.micros(r.ts), 86400L * 1000000L)
        if (s.curDay == Long.MinValue) s = s.copy(curDay = day)
        if (day > s.curDay) {
          s = foldDay(s, openDayMean(s)).copy(curDay = day,
            svMicros = 0L, cnt = 0L)
        }
        if (day == s.curDay) {
          s = s.copy(svMicros = s.svMicros + snap6Micros(r.value),
            cnt = s.cnt + 1)
        }
      }
      st.update(s)
      snapshot(key, s)
    }

    private def openDayMean(s: KalmanState): Double =
      snap12(s.svMicros.toDouble / 1e6 / s.cnt)

    /** End-of-batch view: fold the open day as if final, report q287's
      * columns. Emits nothing until two days of data exist.
      */
    private def snapshot(key: String,
                         s: KalmanState): Iterator[KalmanSnapshot] = {
      if (s.cnt == 0) return Iterator.empty
      val fin = foldDay(s, openDayMean(s))
      if (fin.nClosed < 2) return Iterator.empty
      def r6(x: Double) =
        java.math.BigDecimal.valueOf(x * 1000000)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1000000.0
      Iterator.single(KalmanSnapshot(key, fin.nClosed, r6(fin.x), r6(fin.p),
        r6(fin.k), r6(fin.sae / (fin.nClosed - 1))))
    }
  }

  def run(readings: Dataset[SensorReading],
          watermarkDelay: String = "10 minutes"): Dataset[KalmanSnapshot] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .transformWithState(new KalmanProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
