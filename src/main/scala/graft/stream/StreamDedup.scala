package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the stream-side leg of the dedup suite
  * ([[graft.ops.Dedup]] covers the batch corpus). Two semantics, both
  * backed by Spark's keyed state store:
  *
  *  - [[firstPerKey]] (`dropDuplicates`): exactly-one-ever per key — state
  *    grows with distinct-key cardinality FOREVER unless the key embeds a
  *    window. The reference's upsert guard is the complement (last-write-
  *    wins); this is first-write-wins.
  *  - [[withinWatermark]] (`dropDuplicatesWithinWatermark`, Spark 3.5+):
  *    exactly-one per key within the watermark horizon — state is PRUNED
  *    as the watermark passes, so it runs forever at bounded state. The
  *    right default for at-least-once sources (Kafka redeliveries,
  *    producer retries) where duplicates arrive close together: dedup
  *    correctness degrades gracefully (a dup later than the horizon
  *    passes through) instead of state growing without bound.
  *
  * Scale: both shuffle once on the dedup keys; state per partition is the
  * keys seen (ever / within horizon). At 100 TB-class streams ALWAYS
  * prefer the watermarked form + RocksDB state store.
  */
object StreamDedup {

  /** First event ever per `keys` (unbounded state — bound your keys). */
  def firstPerKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** First event per `keys` within the `delay` watermark horizon;
    * `tsCol` is the event-time column the watermark rides on. */
  def withinWatermark(df: DataFrame, keys: Seq[String], tsCol: String,
                      delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
