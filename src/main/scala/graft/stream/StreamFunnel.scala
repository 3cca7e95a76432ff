package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel progression — the stateful twin of
  * [[graft.ops.Behavior.funnelStages]]. Per-entity state is just
  * (stage, time-of-reach): O(1) per key regardless of event volume, so a
  * billion-entity funnel fits the state store (RocksDB-backed at scale).
  * Emits one row per stage ADVANCE (delta semantics, like the latest-key
  * sink — ship the change, not the world).
  *
  * Ordering: rows within a micro-batch are folded in (t, type) order,
  * matching the batch fold. A cross-batch late event can still advance
  * the funnel if it lands strictly after the last reach time; a late
  * event that time-travels BEFORE the current reach point is ignored
  * (the batch fold would have consumed it — streaming greediness is the
  * documented divergence, same trade as any online funnel).
  */
object StreamFunnel {
  case class FunnelEvent(entity: Long, t_us: Long, et: String)
  case class FunnelState(stage: Int, t_us: Long)
  case class StageAdvance(entity: Long, stage: Int, t_us: Long)

  def stages(events: Dataset[FunnelEvent], steps: Seq[String]): Dataset[StageAdvance] = {
    require(steps.nonEmpty, "funnel steps must be non-empty")
    val spark = events.sparkSession
    import spark.implicits._

    def update(key: Long, rows: Iterator[FunnelEvent],
               state: GroupState[FunnelState]): Iterator[StageAdvance] = {
      var st = state.getOption.getOrElse(FunnelState(0, -1L))
      val out = Seq.newBuilder[StageAdvance]
      rows.toSeq.sortBy(e => (e.t_us, e.et)).foreach { e =>
        if (st.stage < steps.size && e.et == steps(st.stage) && e.t_us > st.t_us) {
          st = FunnelState(st.stage + 1, e.t_us)
          out += StageAdvance(key, st.stage, e.t_us)
        }
      }
      val advances = out.result()
      if (advances.nonEmpty) state.update(st)
      advances.iterator
    }

    events.groupByKey(_.entity)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
