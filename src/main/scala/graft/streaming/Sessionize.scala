package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization with `flatMapGroupsWithState` — the
  * arbitrary-state tier of Structured Streaming (SURVEY.md §2.4), for
  * semantics windowed aggregation can't express: a session closes when a
  * user is idle for `gapMillis`, regardless of wall-clock alignment.
  *
  * A session is only FINAL once the watermark has passed its close
  * boundary (`lastTs + gapMillis`): while the watermark lags, a late
  * event may still fall inside the gap of an "old" session and fuse it
  * with its neighbours, so all still-extendable sessions stay in state
  * (a short time-ordered list, bounded by watermark delay / gap) and are
  * flushed by the event-time timeout. State per user is O(watermark
  * delay / gap) — bounded memory at any scale. The same function also
  * runs in batch tests through groupByKey on a static Dataset.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  final case class SessionState(start: Long, lastTs: Long, nEvents: Long)

  /** State = all sessions not yet expired by the watermark, ascending by start. */
  final case class OpenSessions(sessions: List[SessionState])

  final case class Session(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Long)

  /** Emits a Session row once the event-time watermark passes a session's
    * idle-gap boundary (so late events above the watermark can still fuse
    * into it); expired sessions flush on data arrival or state timeout.
    */
  def updateSessions(gapMillis: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[OpenSessions]): Iterator[Session] = {

    def close(s: SessionState): Session =
      Session(userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.lastTs), s.nEvents)

    def stored: List[SessionState] = state.getOption.map(_.sessions).getOrElse(Nil)

    // Close sessions the watermark has passed; keep the rest in state with
    // a timeout at the earliest remaining close boundary (> watermark by
    // construction, as EventTimeTimeout requires).
    def flush(sessions: List[SessionState]): Iterator[Session] = {
      // Batch execution has no watermark node (getCurrentWatermarkMs
      // throws there); all data is present, so every session is final.
      val wm =
        try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => Long.MaxValue }
      val (expired, open) = sessions.partition(s => s.lastTs + gapMillis <= wm)
      if (open.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(OpenSessions(open))
        state.setTimeoutTimestamp(open.map(_.lastTs + gapMillis).min)
      }
      expired.map(close).iterator
    }

    if (state.hasTimedOut) flush(stored)
    else {
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
      // 2) Merge with stored sessions in time order: adjacent sessions
      //    within the gap fuse (late cross-batch events may both precede a
      //    stored start AND sessionize among themselves).
      val merged = (stored ++ provisional)
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
      flush(merged)
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
