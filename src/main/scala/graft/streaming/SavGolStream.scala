package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** One smoothed point per fully-windowed reading — the same (series,
  * event_id, smooth, resid) the q252 batch filter reports.
  */
case class SavGolPoint(event_type: String, event_id: Long, smooth: Double,
                       resid: Double)

/** Ring of the last four readings per key (epoch-MICROS, id, value), oldest
  * first — exactly the lookback the 5-point filter needs.
  */
case class SavGolState(e: Seq[Long], id: Seq[Long], v: Seq[Double])

/** Streaming Savitzky–Golay smoothing — the bounded-delay stream twin of
  * q252's batch filter. SG(5, quadratic) needs TWO future points, so a
  * reading is emitted exactly two readings late: when x_{t+2} arrives, the
  * window centred on x_t is complete and its smoothed value is final. State
  * per series is the last four readings (O(1)); rows inside a batch are
  * replay-sorted on (full-microsecond ts, event_id) — the batch window's
  * total order down to Timestamp precision — so
  * under any micro-batch slicing of an in-order stream the emitted points
  * equal the batch q252 rows exactly (SavGolStreamSpec asserts it,
  * including windows straddling batch boundaries).
  *
  * Out-of-order arrivals WITHIN the watermark that sort behind the held
  * ring are dropped (the filter's centre would already have been emitted);
  * the watermark bounds how much such lateness exists.
  */
object SavGolStream {

  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x * 1000000)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1000000.0

  class SavGolProcessor
      extends StatefulProcessor[String, SensorReading, SavGolPoint] {
    @transient private var st: ValueState[SavGolState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState("ring", Encoders.product[SavGolState],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[SensorReading],
        timerValues: TimerValues): Iterator[SavGolPoint] = {
      var s = if (st.exists()) st.get() else SavGolState(Nil, Nil, Nil)
      val out = Seq.newBuilder[SavGolPoint]
      rows.toArray.sortBy(r => (StreamTime.micros(r.ts), r.event_id)).foreach { r =>
        val e = StreamTime.micros(r.ts)
        // in-order guard: a reading sorting before the ring's tail arrived
        // after its window was already finalized — drop it
        if (s.e.isEmpty || e > s.e.last
          || (e == s.e.last && r.event_id > s.id.last)) {
          if (s.e.size == 4) {
            // the incoming reading completes the window centred on ring
            // slot 2 (0-based): a=ring(0) b=ring(1) c=ring(2) d=ring(3)
            // e=incoming — q252's exact expression
            val sm = (-3.0 * s.v(0) + 12.0 * s.v(1) + 17.0 * s.v(2)
              + 12.0 * s.v(3) - 3.0 * r.value) / 35.0
            out += SavGolPoint(key, s.id(2),
              r6(sm) + 0.0, r6(s.v(2) - sm) + 0.0)
          }
          s = SavGolState((s.e :+ e).takeRight(4),
            (s.id :+ r.event_id).takeRight(4),
            (s.v :+ r.value).takeRight(4))
        }
      }
      st.update(s)
      out.result().iterator
    }
  }

  def run(readings: Dataset[SensorReading],
          watermarkDelay: String = "10 minutes"): Dataset[SavGolPoint] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .transformWithState(new SavGolProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
