package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

case class ScoreEvent(sensor: String, ts: Timestamp, score: Double)
case class ThrottledAlert(sensor: String, ts_epoch: Long, score: Double, n_suppressed: Long)

/** Streaming alert throttling via the arbitrary-state v2 API
  * (transformWithState, Spark 4): a sensor whose anomaly score crosses
  * `threshold` raises at most ONE alert per `cooldownSec` of event time;
  * crossings inside the cooldown are counted, and the count rides on the
  * next raised alert (`n_suppressed`) so downstream consumers see the
  * suppression volume without receiving the flood — the operational layer
  * the reference leaves to the managed service's alarm dedup.
  *
  * State per sensor: two longs (last alert epoch + suppressed-since count),
  * cleared by an event-time TIMER once the watermark passes the cooldown
  * horizon — so state is O(sensors currently in cooldown), not O(sensors
  * ever seen). That timer is the part flatMapGroupsWithState could only
  * fake with its single timeout slot; the v2 API runs it beside normal
  * input handling, on RocksDB-backed state.
  */
object AlertThrottle {

  class ThrottleProcessor(threshold: Double, cooldownSec: Long)
      extends StatefulProcessor[String, ScoreEvent, ThrottledAlert] {
    @transient private var lastAlert: ValueState[Long] = _
    @transient private var suppressed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lastAlert = getHandle.getValueState[Long]("lastAlert", Encoders.scalaLong, TTLConfig.NONE)
      suppressed = getHandle.getValueState[Long]("suppressed", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        sensor: String,
        rows: Iterator[ScoreEvent],
        timerValues: TimerValues): Iterator[ThrottledAlert] = {
      val out = Seq.newBuilder[ThrottledAlert]
      // event-time order within the batch so cooldown accounting is stable
      rows.toArray.sortBy(_.ts.getTime).foreach { ev =>
        if (ev.score >= threshold) {
          val e = ev.ts.getTime / 1000
          if (!lastAlert.exists() || e - lastAlert.get() >= cooldownSec) {
            val n = if (suppressed.exists()) suppressed.get() else 0L
            out += ThrottledAlert(sensor, e, ev.score, n)
            // retire the previous alert's hygiene timer: left pending, it
            // would fire mid-cooldown of THIS alert and wipe live state
            if (lastAlert.exists()) {
              getHandle.deleteTimer((lastAlert.get() + cooldownSec) * 1000)
            }
            lastAlert.update(e)
            suppressed.update(0L)
            // state-hygiene timer: clear once no event can extend the cooldown
            getHandle.registerTimer((e + cooldownSec) * 1000)
          } else {
            suppressed.update((if (suppressed.exists()) suppressed.get() else 0L) + 1L)
          }
        }
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        sensor: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ThrottledAlert] = {
      // the cooldown horizon passed the watermark — drop this key's state.
      // Guard against a STALE timer (registered by an earlier alert, not yet
      // deleted, e.g. restored from a pre-fix checkpoint): only clear when
      // this expiry actually covers the current alert's cooldown horizon —
      // otherwise an old timer firing mid-cooldown would wipe live state and
      // let the next crossing raise a duplicate alert.
      if (lastAlert.exists() &&
          expiredTimerInfo.getExpiryTimeInMs >= (lastAlert.get() + cooldownSec) * 1000) {
        lastAlert.clear()
        suppressed.clear()
      }
      Iterator.empty
    }
  }

  def throttle(
      events: Dataset[ScoreEvent],
      threshold: Double,
      cooldownSec: Long,
      watermarkDelay: String = "10 minutes"): Dataset[ThrottledAlert] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.sensor)
      .transformWithState(
        new ThrottleProcessor(threshold, cooldownSec),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
