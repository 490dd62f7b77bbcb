package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

case class TypedEvent(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
case class ClosedInterval(user_id: Long, event_type: String,
                          valid_from: Long, valid_to: Long, n_events: Long)
case class IntervalState(tpe: String, from: Long, n: Long)

/** Streaming SCD type-2 maintenance — the incremental twin of the batch
  * q94 interval build: per key, track the current run of the observed
  * attribute value; when the value CHANGES, emit the closed interval
  * `[valid_from, valid_to)` (valid_to = the changing event's time) and open
  * a new run. The open (current) interval lives only in state, exactly like
  * a warehouse dimension's is_current row — so a live pipeline maintains
  * dimension history continuously instead of re-deriving it from the full
  * event log each batch (what q94 does).
  *
  * State per key: one (type, from, n) triple on the RocksDB-backed v2
  * state store. Events sort by (ts, event_id) within each micro-batch;
  * Scd2StreamSpec proves closed intervals match the batch build on the
  * same events across multi-batch arrival.
  */
object Scd2Stream {

  class Scd2Processor extends StatefulProcessor[Long, TypedEvent, ClosedInterval] {
    @transient private var cur: ValueState[IntervalState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[IntervalState](
        "cur", Encoders.product[IntervalState], TTLConfig.NONE)

    override def handleInputRows(
        user: Long,
        rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[ClosedInterval] = {
      val out = Seq.newBuilder[ClosedInterval]
      rows.toArray.sortBy(ev => (ev.ts.getTime, ev.event_id)).foreach { ev =>
        val e = ev.ts.getTime / 1000
        if (!cur.exists()) {
          cur.update(IntervalState(ev.event_type, e, 1L))
        } else {
          val s = cur.get()
          if (s.tpe == ev.event_type) {
            cur.update(s.copy(n = s.n + 1))
          } else {
            out += ClosedInterval(user, s.tpe, s.from, e, s.n)
            cur.update(IntervalState(ev.event_type, e, 1L))
          }
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedInterval] =
      Iterator.empty
  }

  /** Closed intervals only — the open run per key stays in state (it has no
    * valid_to yet, the same reason q94's current row carries NULL).
    */
  def intervals(events: Dataset[TypedEvent],
                watermarkDelay: String = "10 minutes"): Dataset[ClosedInterval] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(
        new Scd2Processor(),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
