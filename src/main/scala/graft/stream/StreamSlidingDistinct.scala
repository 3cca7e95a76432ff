package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming trailing-window distinct count — the online twin of
  * [[graft.ops.Behavior.slidingDistinct]]: on every event, how many
  * DISTINCT values this key saw in the last `windowUs` of event time.
  *
  * State is a `MapState[value → last-seen ts]` — the new API's map
  * primitive, which the state store backs as individual key-value pairs
  * (point updates, no whole-map rewrite per event like a
  * `flatMapGroupsWithState` case-class blob would cost). Size is
  * O(distinct values in window) per key, the information-theoretic floor
  * for exact sliding distinct; callers needing less switch to a sketch.
  *
  * Events within a batch fold in (t, value) order; each event first
  * evicts entries last seen at or before t − window, then upserts
  * itself, then emits the map size. An event-time TIMER at
  * (batch-max t + window) sweeps idle keys: once the watermark proves no
  * in-window event can arrive, the whole map clears — state for dead
  * keys does not linger (the same boundedness argument as the funnel
  * TTL, but in event time and emitting nothing).
  */
object StreamSlidingDistinct {
  import StreamFunnel.TimedEvent // (entity, ts, et) — et is the value here

  case class DistinctOut(entity: Long, t_us: Long, n_distinct: Long)

  class Processor(windowUs: Long)
      extends StatefulProcessor[Long, TimedEvent, DistinctOut] {
    @transient private var seen: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getMapState[String, Long]("seen",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
                                 timerValues: TimerValues): Iterator[DistinctOut] = {
      val out = Seq.newBuilder[DistinctOut]
      var lastT = Long.MinValue
      rows.toSeq.sortBy(e => (e.tsUs, e.et)).foreach { e =>
        val t = e.tsUs
        lastT = math.max(lastT, t)
        val cutoff = t - windowUs
        val stale = seen.iterator().filter(_._2 <= cutoff).map(_._1).toList
        stale.foreach(seen.removeKey)
        val prev = if (seen.containsKey(e.et)) seen.getValue(e.et) else Long.MinValue
        if (t > prev) seen.updateValue(e.et, t)
        out += DistinctOut(key, t, seen.keys().size.toLong)
      }
      if (lastT != Long.MinValue)
        getHandle.registerTimer((lastT + windowUs) / 1000 + 1)
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[DistinctOut] = {
      // the watermark passed last-activity + window: every entry is stale
      // UNLESS a later batch re-registered (then its timer covers it)
      val cutoffUs = expiredTimerInfo.getExpiryTimeInMs * 1000 - windowUs
      val stale = seen.iterator().filter(_._2 < cutoffUs).map(_._1).toList
      stale.foreach(seen.removeKey)
      if (seen.keys().isEmpty) seen.clear()
      Iterator.empty
    }
  }

  /** `events` raw (unwatermarked): (entity, ts, value). Emits one row per
    * event with the exact trailing-window distinct-value count. */
  def counts(events: DataFrame, entityCol: String, tsCol: String,
             valueCol: String, windowMinutes: Int,
             watermarkDelay: String = "0 seconds"): Dataset[DistinctOut] = {
    require(windowMinutes >= 1, "windowMinutes must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(entityCol).cast("long").as("entity"),
        col(tsCol).as("ts"), col(valueCol).cast("string").as("et"))
      .withWatermark("ts", watermarkDelay)
      .as[TimedEvent]
      .groupByKey(_.entity)
      .transformWithState(new Processor(windowMinutes * 60L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append)
  }
}
