package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

case class SensorReading(event_type: String, event_id: Long, ts: Timestamp,
                         value: Double)

/** Shared time helpers for the stateful processors. */
private[streaming] object StreamTime {
  /** Full-microsecond epoch of a Timestamp — `getTime` alone truncates to
    * milliseconds, so two readings a few microseconds apart would tie and
    * replay-sort by event_id while the batch windows order by the full
    * timestamp first. Used as the replay/guard key wherever a processor
    * must walk rows in the batch plan's (ts, event_id) total order.
    */
  def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
}

/** One running snapshot per key per batch: the time-weighted average so
  * far, the plain mean, and the coverage span in seconds.
  */
case class TwaSnapshot(event_type: String, n: Long, plain_mean: Double,
                       twa: Double, span_sec: Long)

/** O(1) per-key fold state: last held sample + exact micro-unit sums. */
case class TwaState(pe: Long, pv: Double, areaMicros: Long, spanSec: Long,
                    svMicros: Long, n: Long)

/** Streaming time-weighted average — the unbounded-stream twin of q234's
  * batch TWA. State per series is O(1): the last (epoch, value) sample plus
  * four accumulators; each arriving reading closes one trapezoid against
  * the held sample. Every trapezoid increment is snapped to 6-dp via
  * HALF_UP BigDecimal — bit-identical to the batch plan's decimal(28,6)
  * per-term casts — so after the same rows in any batch slicing the
  * streaming TWA equals the batch TWA exactly (TwaStreamSpec asserts it).
  *
  * Rows inside a batch are replay-sorted on (epoch, event_id) before
  * folding, the same total order the batch window uses, making snapshots
  * deterministic under any micro-batch boundary placement.
  */
object TwaStream {

  class TwaProcessor
      extends StatefulProcessor[String, SensorReading, TwaSnapshot] {
    @transient private var st: ValueState[TwaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState("twa", Encoders.product[TwaState],
        TTLConfig.NONE)
    }

    private def snap6(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()

    override def handleInputRows(
        key: String,
        rows: Iterator[SensorReading],
        timerValues: TimerValues): Iterator[TwaSnapshot] = {
      val s0 = if (st.exists()) st.get()
        else TwaState(Long.MinValue, 0.0, 0L, 0L, 0L, 0L)
      var pe = s0.pe; var pv = s0.pv; var area = s0.areaMicros
      var span = s0.spanSec; var sv = s0.svMicros; var n = s0.n
      rows.toArray.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
        val e = r.ts.getTime / 1000
        // a row older than the held sample arrived in a LATER micro-batch:
        // integrating it would produce a negative trapezoid; drop it (the
        // watermark bounds how much such lateness exists at all)
        if (pe == Long.MinValue || e >= pe) {
          if (pe != Long.MinValue) {
            val dt = (e - pe).toDouble
            area += snap6(((pv + r.value) / 2.0) * dt)
            span += e - pe
          }
          pe = e; pv = r.value
          sv += snap6(r.value)
          n += 1
        }
      }
      st.update(TwaState(pe, pv, area, span, sv, n))
      if (n == 0) Iterator.empty
      else Iterator.single(TwaSnapshot(key, n,
        sv.toDouble / 1e6 / n,
        if (span > 0) area.toDouble / 1e6 / span else sv.toDouble / 1e6 / n,
        span))
    }
  }

  def run(readings: Dataset[SensorReading],
          watermarkDelay: String = "10 minutes"): Dataset[TwaSnapshot] = {
    import readings.sparkSession.implicits._
    readings
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.event_type)
      .transformWithState(new TwaProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
