package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming per-key heavy hitters — the Misra–Gries (space-saving)
  * summary as `transformWithState` MapState: at most `capacity` tracked
  * values per key, point-updated in the state store. The classic
  * guarantee holds per key: any value with true frequency
  * > N/(capacity+1) is guaranteed tracked, and each tracked count
  * under-estimates its true count by at most the total decrement debt.
  * O(capacity) state per key — a bounded sketch where the exact
  * [[StreamSlidingDistinct]] map would grow with cardinality.
  *
  * Emits, per input event, the tracked estimate for that event's value
  * after the update (0 if the value fell out by decrement) — a delta
  * stream the sink can keep as "latest estimate per (key, value)".
  * Batch-order determinism: rows fold in (t, value) order.
  */
object StreamTopK {
  import StreamFunnel.TimedEvent // (entity, ts, et) — et is the value

  case class TopKOut(entity: Long, et: String, t_us: Long, est: Long)

  class Processor(capacity: Int)
      extends StatefulProcessor[Long, TimedEvent, TopKOut] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("mg",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
                                 timerValues: TimerValues): Iterator[TopKOut] = {
      val out = Seq.newBuilder[TopKOut]
      rows.toSeq.sortBy(e => (e.tsUs, e.et)).foreach { e =>
        if (counts.containsKey(e.et)) {
          counts.updateValue(e.et, counts.getValue(e.et) + 1)
        } else if (counts.keys().size < capacity) {
          counts.updateValue(e.et, 1L)
        } else {
          // Misra–Gries decrement: every tracked count pays one; zeros
          // evict. The arriving value stays untracked this round.
          val entries = counts.iterator().map(kv => (kv._1, kv._2)).toList
          entries.foreach { case (v, c) =>
            if (c <= 1L) counts.removeKey(v) else counts.updateValue(v, c - 1)
          }
        }
        val est = if (counts.containsKey(e.et)) counts.getValue(e.et) else 0L
        out += TopKOut(key, e.et, e.tsUs, est)
      }
      out.result().iterator
    }
  }

  /** `events` raw: (entity, ts, value). `capacity` bounds tracked values
    * per key (the k of "top-k"). */
  def estimates(events: DataFrame, entityCol: String, tsCol: String,
                valueCol: String, capacity: Int,
                watermarkDelay: String = "0 seconds"): Dataset[TopKOut] = {
    require(capacity >= 1, "capacity must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col(entityCol).cast("long").as("entity"),
        col(tsCol).as("ts"), col(valueCol).cast("string").as("et"))
      .withWatermark("ts", watermarkDelay)
      .as[TimedEvent]
      .groupByKey(_.entity)
      .transformWithState(new Processor(capacity),
        TimeMode.None(), OutputMode.Append)
  }
}
