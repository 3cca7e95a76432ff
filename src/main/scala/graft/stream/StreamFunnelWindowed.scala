package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** WINDOWED streaming funnel on `transformWithState` event-time TIMERS:
  * an attempt must march through all steps within `windowMinutes` of its
  * first step, or a terminal `expired` row is emitted the moment the
  * WATERMARK (event time, not the wall clock) passes the deadline — the
  * timer facility the new API adds over `flatMapGroupsWithState`'s single
  * implicit timeout. Per-entity state is one (stage, start, last-reach)
  * triple plus at most one registered timer: O(1) per key.
  *
  * Semantics per entity:
  *  - a `steps.head` event with no attempt in flight opens an attempt and
  *    registers a timer at start + window;
  *  - in-window, in-order step events advance the stage (`advance` rows);
  *  - reaching the last step emits `converted`, deletes the timer, and
  *    clears state — the NEXT `steps.head` event may open a fresh attempt
  *    (restartable funnels, unlike the cumulative lifetime funnel);
  *  - the timer firing — or an event arriving past the deadline, whichever
  *    the stream sees first — emits `expired` with the stage reached and
  *    clears state. An event past the deadline that is itself a
  *    `steps.head` immediately opens the next attempt.
  *
  * Divergence from a batch replay is the usual online-greediness: events
  * are folded in (t, type) order within a batch but batches are folded in
  * arrival order; a cross-batch time-traveler cannot rewind a closed
  * attempt.
  */
object StreamFunnelWindowed {
  import StreamFunnel.TimedEvent

  case class AttemptState(stage: Int, start_us: Long, t_us: Long)
  /** outcome ∈ advance | converted | expired. `stage` is the stage just
    * reached (advance/converted) or the stage held when time ran out. */
  case class WindowedOut(entity: Long, stage: Int, t_us: Long, outcome: String)

  class Processor(steps: Seq[String], windowUs: Long)
      extends StatefulProcessor[Long, TimedEvent, WindowedOut] {
    @transient private var st: ValueState[AttemptState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AttemptState]("attempt",
        Encoders.product[AttemptState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def deadlineMs(s: AttemptState): Long =
      (s.start_us + windowUs) / 1000

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
                                 timerValues: TimerValues): Iterator[WindowedOut] = {
      val out = Seq.newBuilder[WindowedOut]
      var s = if (st.exists()) st.get() else null
      rows.toSeq.sortBy(e => (e.tsUs, e.et)).foreach { e =>
        val t = e.tsUs
        // close an attempt the deadline already passed in event time —
        // the timer may not have fired yet if the watermark lags
        if (s != null && t > s.start_us + windowUs) {
          out += WindowedOut(key, s.stage, s.start_us + windowUs, "expired")
          getHandle.deleteTimer(deadlineMs(s))
          s = null
        }
        if (s == null) {
          if (e.et == steps.head) {
            if (steps.size == 1) {
              // a single-step funnel converts on its opening event — no
              // state, no timer (otherwise the attempt could only expire)
              out += WindowedOut(key, 1, t, "converted")
            } else {
              s = AttemptState(1, t, t)
              getHandle.registerTimer(deadlineMs(s))
              out += WindowedOut(key, 1, t, "advance")
            }
          }
        } else if (s.stage < steps.size && e.et == steps(s.stage) && t > s.t_us) {
          s = AttemptState(s.stage + 1, s.start_us, t)
          if (s.stage == steps.size) {
            out += WindowedOut(key, s.stage, t, "converted")
            getHandle.deleteTimer(deadlineMs(s))
            s = null
          } else out += WindowedOut(key, s.stage, t, "advance")
        }
      }
      if (s == null) st.clear() else st.update(s)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[WindowedOut] =
      if (st.exists()) {
        val s = st.get()
        if (deadlineMs(s) == expiredTimerInfo.getExpiryTimeInMs) {
          st.clear()
          Iterator(WindowedOut(key, s.stage, s.start_us + windowUs, "expired"))
        } else Iterator.empty // stale timer of an attempt closed inline
      } else Iterator.empty
  }

  /** Stateless rollup over [[attempts]] output: terminal outcomes
    * (converted / expired) counted by (outcome, stage reached) — the
    * live conversion dashboard. A plain streaming aggregate (run it in
    * update mode); `advance` rows are progress deltas, not outcomes,
    * and are excluded. */
  def conversionCounts(attempts: Dataset[WindowedOut]): DataFrame =
    attempts.filter(col("outcome") =!= "advance")
      .groupBy(col("outcome"), col("stage"))
      .count()

  /** `events` raw (unwatermarked); the watermark attaches here on `tsCol`
    * — event-time timers only fire as the watermark advances. */
  def attempts(events: DataFrame, entityCol: String, tsCol: String,
               typeCol: String, steps: Seq[String], windowMinutes: Int,
               watermarkDelay: String = "0 seconds"): Dataset[WindowedOut] = {
    require(steps.nonEmpty, "funnel steps must be non-empty")
    require(windowMinutes >= 1, "windowMinutes must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(entityCol).cast("long").as("entity"),
        col(tsCol).as("ts"), col(typeCol).cast("string").as("et"))
      .withWatermark("ts", watermarkDelay)
      .as[TimedEvent]
      .groupByKey(_.entity)
      .transformWithState(new Processor(steps, windowMinutes * 60L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append)
  }
}
