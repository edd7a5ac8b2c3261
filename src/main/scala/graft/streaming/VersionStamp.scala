package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig}

/** Per-key monotonic version stamping on Spark 4's `transformWithState`
  * API (the arbitrary-state successor of flatMapGroupsWithState, RocksDB
  * state store): every record of a key gets the next version number,
  * contiguous across micro-batches — the ordering primitive a CDC
  * changelog needs when the source doesn't carry sequence numbers.
  *
  * State per key is ONE long (the last version issued) in a `ValueState`;
  * within a batch rows are ordered by event time so replays of the same
  * file produce identical stamps.
  */
object VersionStamp {

  final case class Stamped(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, version: Long)

  private class Proc extends StatefulProcessor[Long, Sessionize.Event, Stamped] {
    @transient private var last: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long]("last", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Sessionize.Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[Stamped] = {
      var n = if (last.exists()) last.get() else 0L
      // Deterministic within-batch order (the iterator's isn't specified).
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_type)).map { e =>
        n += 1
        Stamped(e.user_id, e.ts, e.event_type, n)
      }
      last.update(n)
      out.iterator
    }
  }

  /** Stamp a (possibly streaming) event set; contiguous 1..n per key. */
  def stamp(events: Dataset[Sessionize.Event]): Dataset[Stamped] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Append())
  }
}
