package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream to fixed buckets,
  * then densify per-key gaps and forward-fill — the step between raw
  * events and anything that assumes a regular grid (charting, windowed
  * models, downstream joins on bucket). The reference's tile pipeline
  * leaves gaps where no events landed; a serving layer then has to
  * special-case missing windows. This materializes the dense grid instead.
  *
  * Scale shape: resample is one partial-aggregable groupBy. The spine is
  * built from a per-key (min,max) aggregate — tiny — then exploded, so
  * spine size is output size, never input size. Fill is one window per
  * key ordered by bucket. No driver-side loops, no global windows.
  */
object TimeSeries {

  /** Aggregate `valueCol` into `everySec`-second epoch buckets per `key`:
    * (key, bucket_es, cnt, avg_value·4dp). Only occupied buckets appear —
    * feed [[fillGaps]] for the dense grid. */
  def resample(df: DataFrame, key: String, tsCol: String, valueCol: String,
               everySec: Long = 300L): DataFrame =
    df.groupBy(col(key),
        expr(s"(unix_timestamp($tsCol) div $everySec) * $everySec").as("bucket_es"))
      .agg(count(lit(1)).as("cnt"), round(avg(col(valueCol)), 4).as("avg_value"))

  /** Densify [[resample]] output to every `everySec` bucket between each
    * key's first and last observation; absent buckets get cnt=0 and the
    * last seen `avg_value` (forward fill). */
  def fillGaps(resampled: DataFrame, key: String, everySec: Long = 300L): DataFrame = {
    val span = resampled.groupBy(col(key))
      .agg(min(col("bucket_es")).as("b0"), max(col("bucket_es")).as("b1"))
    val spine = span.select(col(key),
      explode(sequence(col("b0"), col("b1"), lit(everySec))).as("bucket_es"))
    val w = Window.partitionBy(col(key)).orderBy(col("bucket_es"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(resampled, Seq(key, "bucket_es"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("avg_filled", last(col("avg_value"), ignoreNulls = true).over(w))
      .drop("avg_value")
  }
}
