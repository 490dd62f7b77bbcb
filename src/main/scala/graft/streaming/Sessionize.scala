package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionEvent(user_id: Long, ts: Timestamp)
case class OpenSession(start: Long, end: Long, n: Long)
case class ClosedSession(user_id: Long, range_start: Long, range_end: Long, n_events: Long)

/** Streaming gaps-and-islands sessionization — the incremental version of
  * the batch anomaly-range operator (q06): points arriving on a stream
  * collapse into contiguous ranges separated by > `gapSec` of silence.
  *
  * Custom state via KeyValueGroupedDataset.flatMapGroupsWithState: one
  * OpenSession per key, event-time timeout at (session end + gap) so a
  * session closes and emits exactly once the watermark proves no more
  * in-gap events can arrive. State size is O(active keys), independent of
  * stream length — the property that lets this run forever on an unbounded
  * stream where the batch window/lag formulation cannot.
  */
object Sessionize {

  def sessionize(events: Dataset[SessionEvent], gapSec: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.start, s.end, s.n))
          } else {
            val epochs = it.map(_.ts.getTime / 1000).toArray.sorted
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            epochs.foreach { e =>
              cur = cur match {
                case Some(s) if e - s.end <= gapSec =>
                  Some(OpenSession(s.start, math.max(s.end, e), s.n + 1))
                case Some(s) =>
                  closed ::= ClosedSession(user, s.start, s.end, s.n)
                  Some(OpenSession(e, e, 1))
                case None => Some(OpenSession(e, e, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end + gapSec) * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** The same sessionization through Catalyst's NATIVE session_window
    * aggregation — zero custom state code. Spark's built-in session
    * windows merge events closer than `gapSec` and (under a watermark, in
    * append mode) emit each session exactly once when it can no longer
    * grow — the declarative path to prefer when per-session output is
    * just an aggregate of its events; flatMapGroupsWithState above stays
    * for semantics the built-in can't express (mid-session emission,
    * cross-session state). Works identically as a batch plan (watermark
    * is a no-op there), which is what SessionWindowSpec asserts.
    */
  def sessionWindowAgg(events: org.apache.spark.sql.DataFrame,
                       gapSec: Long = 1800L,
                       watermarkDelay: String = "10 minutes"):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapSec seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("range_start"),
        col("n_events"))
  }
}
