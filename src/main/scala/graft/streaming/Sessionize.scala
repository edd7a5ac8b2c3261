package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization with `flatMapGroupsWithState` — the
  * arbitrary-state tier of Structured Streaming (SURVEY.md §2.4), for
  * semantics windowed aggregation can't express: a session closes when a
  * user is idle for `gapMillis`, regardless of wall-clock alignment.
  *
  * State per user is O(1) (current session bounds + count), evicted via
  * event-time timeout — bounded memory at any scale. The same function
  * also runs in batch tests through groupByKey on a static Dataset.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  final case class SessionState(start: Long, lastTs: Long, nEvents: Long)

  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** Emits a Session row each time a user's idle gap exceeds `gapMillis`
    * (and on state timeout for the tail session).
    */
  def updateSessions(gapMillis: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {

    def close(s: SessionState): Session =
      Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastTs), s.nEvents)

    if (state.hasTimedOut) {
      val out = state.getOption.map(close).toSeq
      state.remove()
      out.iterator
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          // Within gap of the session's span (a late cross-batch event may
          // precede the stored start — extend backwards, don't just absorb).
          case Some(s) if t >= s.start - gapMillis && t - s.lastTs <= gapMillis =>
            cur = Some(s.copy(start = math.min(s.start, t),
              lastTs = math.max(s.lastTs, t), nEvents = s.nEvents + 1))
          // More than a gap BEFORE the session: its own earlier session,
          // closed immediately (the watermark has long passed it).
          case Some(s) if t < s.start - gapMillis =>
            closed += Session(userId, new java.sql.Timestamp(t), new java.sql.Timestamp(t), 1)
          case Some(s) =>
            closed += close(s)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // Close the open session once event time passes lastTs + gap.
        state.setTimeoutTimestamp(s.lastTs + gapMillis)
      }
      closed.result().iterator
    }
  }

  /** Streaming form: watermarked event stream → closed sessions. */
  def sessions(events: Dataset[Event], gapMillis: Long = 1800000L,
      watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        updateSessions(gapMillis))
  }
}
