package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

case class Escalation(sensor: String, ts_epoch: Long, run_length: Long, score: Double)

/** Consecutive-anomaly escalation: a sensor whose score stays at or above
  * `threshold` for `minRun` CONSECUTIVE samples (one below resets the run)
  * raises an escalation, then again only when a fresh run reaches the bar —
  * the "N anomalous inference windows in a row" alarm policy that turns a
  * noisy per-window score stream into pages worth waking someone for.
  * Complements [[AlertThrottle]] (which rate-limits by time, not by run).
  *
  * State per sensor is one run-length counter + the run's last epoch,
  * cleared by an event-time timer `gapSec` after the last sample so silent
  * sensors cost nothing. A sample gap > `gapSec` also resets the run —
  * consecutive means contiguous in time, not merely in arrival order.
  */
object Escalation {

  class RunProcessor(threshold: Double, minRun: Long, gapSec: Long)
      extends StatefulProcessor[String, ScoreEvent, Escalation] {
    @transient private var run: ValueState[Long] = _
    @transient private var lastEpoch: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      run = getHandle.getValueState[Long]("run", Encoders.scalaLong, TTLConfig.NONE)
      lastEpoch = getHandle.getValueState[Long]("lastEpoch", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        sensor: String,
        rows: Iterator[ScoreEvent],
        timerValues: TimerValues): Iterator[Escalation] = {
      val out = Seq.newBuilder[Escalation]
      rows.toArray.sortBy(_.ts.getTime).foreach { ev =>
        val e = ev.ts.getTime / 1000
        val gapBroken = lastEpoch.exists() && e - lastEpoch.get() > gapSec
        val prev = if (run.exists() && !gapBroken) run.get() else 0L
        if (ev.score >= threshold) {
          val r = prev + 1
          run.update(r)
          if (r == minRun) out += Escalation(sensor, e, r, ev.score)
        } else {
          run.update(0L)
        }
        lastEpoch.update(e)
        getHandle.registerTimer((e + gapSec) * 1000)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(
        sensor: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Escalation] = {
      if (lastEpoch.exists() &&
          expiredTimerInfo.getExpiryTimeInMs >= (lastEpoch.get() + gapSec) * 1000) {
        run.clear(); lastEpoch.clear()
      }
      Iterator.empty
    }
  }

  def escalate(
      events: Dataset[ScoreEvent],
      threshold: Double,
      minRun: Long,
      gapSec: Long = 600L,
      watermarkDelay: String = "10 minutes"): Dataset[Escalation] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.sensor)
      .transformWithState(
        new RunProcessor(threshold, minRun, gapSec),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
