package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** W5 — idempotent keyed upsert with a monotonic event-time guard, the
  * reference's correctness cornerstone (`heatmap_stream.py:188,217-228`):
  * `UpdateOne({_id, $or:[ts missing, ts < new]}, {$set:…}, upsert)`.
  *
  * Re-expressed relationally: the merged table is the per-key argmax over
  * (existing ∪ batch) by (ts, tieCols…). This is replay-safe — merging the
  * same batch twice is a no-op — which is exactly the property the
  * reference leans on for at-least-once `foreachBatch` delivery.
  *
  * Scale: one hash-aggregate shuffle on the key; no join, no driver
  * round-trip (unlike the reference's driver-side toLocalIterator loop,
  * SURVEY.md §7.3).
  */
object Upsert {
  def merge(existing: DataFrame, batch: DataFrame, keys: Seq[String],
            orderCols: Seq[String], payload: Seq[String]): DataFrame = {
    val all = existing.unionByName(batch, allowMissingColumns = true)
    val ord = struct((orderCols ++ payload).map(col): _*)
    all.groupBy(keys.map(col): _*)
      .agg(max_by(ord, ord).as("m"))
      .select(keys.map(col) ++ (orderCols ++ payload).map(c => col(s"m.$c").as(c)): _*)
  }
}
