package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** positions_latest as explicit keyed state — the
  * `KeyValueGroupedDataset.flatMapGroupsWithState` surface (SURVEY.md §1.4
  * mapping). Equivalent semantics to the sink-side W5 guard, but the
  * monotonic latest-position lives in Spark's state store (per-key O(1),
  * RocksDB-backed at scale) and only CHANGED keys are emitted per batch —
  * at 100 TB this is the difference between shipping a delta and
  * re-upserting the world.
  */
object StatefulLatest {
  case class KeyedPos(provider: String, vehicleId: String, ts_us: Long,
                      event_id: Long, lat: Double, lon: Double)

  private def newer(a: KeyedPos, b: KeyedPos): KeyedPos =
    if (b.ts_us > a.ts_us || (b.ts_us == a.ts_us && b.event_id > a.event_id)) b else a

  private def updateKey(
      key: (String, String), rows: Iterator[KeyedPos],
      state: GroupState[KeyedPos]): Iterator[KeyedPos] = {
    val prev = state.getOption
    val incoming = rows.reduceOption(newer)
    (prev, incoming) match {
      case (_, None) => Iterator.empty
      case (None, Some(b)) => state.update(b); Iterator(b)
      case (Some(a), Some(b)) =>
        val best = newer(a, b)
        if (best == a) Iterator.empty // stale updates emit nothing
        else { state.update(best); Iterator(best) }
    }
  }

  /** `clean` must carry provider/vehicleId/eventTs/event-ish id/lat/lon.
    * Works on both batch and streaming frames. */
  def latest(clean: DataFrame, idCol: String = "event_id"): Dataset[KeyedPos] = {
    val spark = clean.sparkSession
    import spark.implicits._
    val idExpr = if (clean.columns.contains(idCol)) col(idCol) else lit(0L)
    clean.select(col("provider"), col("vehicleId"),
        unix_micros(col("eventTs")).as("ts_us"), idExpr.cast("long").as("event_id"),
        col("lat"), col("lon")).as[KeyedPos]
      .groupByKey(r => (r.provider, r.vehicleId))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateKey)
  }
}
