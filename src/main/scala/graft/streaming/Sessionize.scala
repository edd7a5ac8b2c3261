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
      // 1) Gap-scan the batch's sorted events into provisional sessions.
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      val provisional = sorted.foldLeft(List.empty[SessionState]) { (acc, e) =>
        val t = e.ts.getTime
        acc match {
          case head :: tail if t - head.lastTs <= gapMillis =>
            head.copy(lastTs = math.max(head.lastTs, t), nEvents = head.nEvents + 1) :: tail
          case _ => SessionState(t, t, 1) :: acc
        }
      }.reverse
      // 2) Merge with the stored session in time order: adjacent sessions
      //    within the gap fuse (late cross-batch events may both precede the
      //    stored start AND sessionize among themselves).
      val merged = (state.getOption.toList ++ provisional)
        .sortBy(_.start)
        .foldLeft(List.empty[SessionState]) { (acc, s) =>
          acc match {
            case head :: tail if s.start - head.lastTs <= gapMillis =>
              head.copy(start = math.min(head.start, s.start),
                lastTs = math.max(head.lastTs, s.lastTs),
                nEvents = head.nEvents + s.nEvents) :: tail
            case _ => s :: acc
          }
        }.reverse
      // 3) Everything except the newest session is final (a later event can
      //    no longer fall within its gap); the newest stays open as state.
      val closed = merged.dropRight(1).map(close)
      merged.lastOption.foreach { s =>
        state.update(s)
        // Close the open session once event time passes lastTs + gap.
        state.setTimeoutTimestamp(s.lastTs + gapMillis)
      }
      closed.iterator
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
