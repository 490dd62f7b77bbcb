package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

case class TokenEvent(bucket: String, token: String, ts: Timestamp)

/** One sketch row: estimated count plus the worst-case overcount the
  * space-saving replacement introduced (0 for tokens that entered an
  * unfull sketch — their counts are exact).
  */
case class HeavyHitter(bucket: String, token: String, est_count: Long,
                       max_overcount: Long, asof_epoch: Long)

/** Streaming heavy hitters via the Space-Saving sketch (Metwally et al.) on
  * transformWithState: per key, at most `capacity` counters; a new token
  * evicts the current minimum and inherits its count (recording that count
  * as its overcount bound). Guarantees: every token with true frequency
  * > n/capacity is IN the sketch, and est − max_overcount ≤ true ≤ est.
  * This is the unbounded-stream answer to q36's exact batch heavy hitters —
  * exact per-token counting over an infinite token stream needs unbounded
  * state; the sketch holds O(capacity) per key forever.
  *
  * After each input batch the processor emits the key's full sketch stamped
  * with the max event epoch it has absorbed, so downstream sees a
  * monotone sequence of sketch snapshots and can pick the latest.
  */
object HeavyHitters {

  class SpaceSavingProcessor(capacity: Int)
      extends StatefulProcessor[String, TokenEvent, HeavyHitter] {
    // token -> (est_count, max_overcount)
    @transient private var counts: MapState[String, (Long, Long)] = _
    @transient private var maxEpoch: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, (Long, Long)]("counts",
        Encoders.STRING, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      maxEpoch = getHandle.getValueState[Long]("maxEpoch", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        bucket: String,
        rows: Iterator[TokenEvent],
        timerValues: TimerValues): Iterator[HeavyHitter] = {
      var asof = if (maxEpoch.exists()) maxEpoch.get() else 0L
      // deterministic replay: process in (epoch, token) order regardless of
      // how the batch delivered the rows
      rows.toArray.sortBy(e => (e.ts.getTime, e.token)).foreach { ev =>
        asof = math.max(asof, ev.ts.getTime / 1000)
        val t = ev.token
        if (counts.containsKey(t)) {
          val (c, o) = counts.getValue(t)
          counts.updateValue(t, (c + 1, o))
        } else {
          val entries = counts.iterator().toArray // <= capacity rows
          if (entries.length < capacity) {
            counts.updateValue(t, (1L, 0L))
          } else {
            // evict the min-count entry (token tiebreak keeps this
            // deterministic); the newcomer inherits its count as the bound
            val (vTok, (vCnt, _)) = entries.minBy { case (tok, (c, _)) => (c, tok) }
            counts.removeKey(vTok)
            counts.updateValue(t, (vCnt + 1L, vCnt))
          }
        }
      }
      maxEpoch.update(asof)
      counts.iterator().toArray
        .sortBy { case (tok, (c, _)) => (-c, tok) }
        .map { case (tok, (c, o)) => HeavyHitter(bucket, tok, c, o, asof) }
        .iterator
    }
  }

  def sketch(
      events: Dataset[TokenEvent],
      capacity: Int,
      watermarkDelay: String = "10 minutes"): Dataset[HeavyHitter] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.bucket)
      .transformWithState(
        new SpaceSavingProcessor(capacity),
        TimeMode.EventTime(),
        OutputMode.Append())
  }
}
