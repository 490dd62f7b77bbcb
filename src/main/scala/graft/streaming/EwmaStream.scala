package graft.streaming

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** One smoothed point per fully-lagged reading — the same (key, event_id,
  * rn, ewma) the q110 batch query reports.
  */
case class EwmaPoint(event_type: String, event_id: Long, rn: Long,
                     ewma: Double)

/** Ring of the last 8 readings per key (epoch-MICROS, id, value), oldest
  * first, plus the 1-based position of the NEXT reading.
  */
case class EwmaState(e: Seq[Long], id: Seq[Long], v: Seq[Double], rn: Long)

/** Streaming truncated EWMA — the unbounded-stream twin of q110's batch
  * 8-lag window. State per key is the last eight readings (O(1)); each
  * arriving reading beyond the eighth emits its smoothed value
  * immediately (zero delay — the window looks BACK only, unlike
  * SavGol's two-ahead). Weights are the exact decimals 0.7^k — computed
  * with the same BigDecimal arithmetic Catalyst's decimal multiply
  * performs on the batch side — so after the same rows under ANY
  * micro-batch slicing the emitted points equal the batch q110 rows
  * exactly (EwmaStreamSpec asserts it, including rings straddling batch
  * boundaries). Rows inside a batch are replay-sorted on
  * (full-microsecond ts, event_id); late arrivals sorting behind the
  * ring's tail are dropped (watermark-bounded), mirroring the batch
  * window's total order.
  */
object EwmaStream {

  private val lags = 8
  // 0.7^k as exact decimals with scale k, and the exact normalizer
  private val weights: IndexedSeq[JBD] =
    (0 to lags).map(k =>
      new JBD(BigDecimal(7).pow(k).toBigInt.bigInteger).movePointLeft(k))
  private val norm: Double = weights.reduce(_.add(_)).doubleValue

  /** The batch plan's exact arithmetic: value cast decimal(18,6), times
    * the scale-8 weight literal, summed exactly, cast to double, r4.
    */
  private[graft] def ewmaOf(newest: Double, ring: Seq[Double]): Double = {
    // ring is oldest-first; lag k = k-th newest
    val vals = (newest +: ring.reverse).toIndexedSeq
    var acc = JBD.ZERO
    var k = 0
    while (k <= lags) {
      val x = JBD.valueOf(vals(k)).setScale(6, RoundingMode.HALF_UP)
      acc = acc.add(x.multiply(weights(k).setScale(lags)))
      k += 1
    }
    val raw = acc.doubleValue / norm
    JBD.valueOf(raw * 10000)
      .setScale(0, RoundingMode.HALF_UP).doubleValue() / 10000
  }

  class EwmaProcessor
      extends StatefulProcessor[String, SensorReading, EwmaPoint] {
    @transient private var st: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState("ewma", Encoders.product[EwmaState],
        TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[SensorReading],
        timerValues: TimerValues): Iterator[EwmaPoint] = {
      var s = if (st.exists()) st.get() else EwmaState(Nil, Nil, Nil, 1L)
      val out = Seq.newBuilder[EwmaPoint]
      rows.toArray.sortBy(r => (StreamTime.micros(r.ts), r.event_id))
        .foreach { r =>
          val e = StreamTime.micros(r.ts)
          if (s.e.isEmpty || e > s.e.last
            || (e == s.e.last && r.event_id > s.id.last)) {
            if (s.e.size == lags)
              out += EwmaPoint(key, r.event_id, s.rn, ewmaOf(r.value, s.v))
            s = EwmaState((s.e :+ e).takeRight(lags),
              (s.id :+ r.event_id).takeRight(lags),
              (s.v :+ r.value).takeRight(lags), s.rn + 1)
          }
        }
      st.update(s)
      out.result().iterator
    }
  }

  def run(readings: Dataset[SensorReading],
          watermarkDelay: String = "10 minutes"): Dataset[EwmaPoint] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .transformWithState(new EwmaProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
