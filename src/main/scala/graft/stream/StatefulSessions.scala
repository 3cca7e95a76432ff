package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom sessionization with explicit keyed state and event-time
  * timeouts — the full `flatMapGroupsWithState` surface (state mutation +
  * `GroupStateTimeout.EventTimeTimeout`): a session CLOSES and is emitted
  * exactly once when the watermark passes its end + gap, which built-in
  * `session_window` can't express in append-with-custom-payload form.
  *
  * State is O(1) per active key (start/end/count), timeout-driven cleanup —
  * the pattern that keeps state bounded over unbounded key cardinality at
  * scale (idle keys evict themselves).
  */
object StatefulSessions {
  case class SessionRow(user: String, ts: java.sql.Timestamp) {
    def tsUs: Long = ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  }
  case class SessionState(start_us: Long, end_us: Long, cnt: Long)
  case class ClosedSession(user: String, start_us: Long, end_us: Long, cnt: Long)

  /** `events` must NOT be watermarked yet — the watermark attaches here,
    * on the projected timestamp that survives into the stateful operator
    * (projecting it away upstream would orphan the event-time column). */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapMinutes: Int, watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(user: String, rows: Iterator[SessionRow],
               state: GroupState[SessionState]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(ClosedSession(user, s.start_us, s.end_us, s.cnt))
      } else {
        val sorted = rows.toSeq.sortBy(_.tsUs)
        var closed = List.empty[ClosedSession]
        var cur = state.getOption
        sorted.foreach { r =>
          val t = r.tsUs
          cur match {
            case Some(s) if t - s.end_us <= gapUs =>
              cur = Some(SessionState(s.start_us, math.max(s.end_us, t), s.cnt + 1))
            case Some(s) =>
              closed ::= ClosedSession(user, s.start_us, s.end_us, s.cnt)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // close when the WATERMARK (not wall clock) passes end + gap
          state.setTimeoutTimestamp(s.end_us / 1000 + gapMinutes * 60L * 1000)
        }
        closed.reverseIterator
      }
    }

    events.select(col(userCol).cast("string").as("user"), col(tsCol).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionRow]
      .groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
