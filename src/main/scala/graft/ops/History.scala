package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (SCD type 2) history building: turn a keyed
  * event stream into validity intervals, keeping only rows where the
  * tracked attribute actually changed. This is the batch twin of the
  * reference's latest-value upsert (`heatmap_stream.py:198-235` keeps only
  * the newest row per key; SCD2 keeps the full change history with
  * `valid_from`/`valid_to` bounds — the standard warehouse layout for
  * "what was the value at time t" queries via an as-of join).
  */
object History {

  /** Change-capture intervals per key: one row per run of equal `attrCol`
    * values (in `tsCol` order), with `valid_from_us`/`valid_to_us` bounds
    * and an `is_current` flag on each key's open-ended last run.
    *
    * Scale: a single hash shuffle on the key; both windows (the
    * change-detection lag and the interval lead) share that partitioning,
    * so Spark plans one Exchange and two in-partition sorts. State per
    * key is O(1) — nothing is collected.
    */
  def scd2(df: DataFrame, keyCol: String, tsMicrosCol: String,
           attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from_us"))
    df.select(col(keyCol), col(tsMicrosCol).as("valid_from_us"),
        col(attrCol).as("attr"))
      .withColumn("prev", lag(col("attr"), 1).over(w))
      .withColumn("prev_t", lag(col("valid_from_us"), 1).over(w))
      // first row per key, or the attribute changed (null-safe compare so
      // a real null attr value is not mistaken for "no previous row")
      .filter(col("prev_t").isNull || !(col("prev") <=> col("attr")))
      .drop("prev", "prev_t")
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col("valid_from_us"))))
      .withColumn("is_current", col("valid_to_us").isNull)
  }
}
