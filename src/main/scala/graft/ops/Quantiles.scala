package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-sketch quantiles — the scale path for percentiles. Exact
  * `percentile()` buffers every value per group (full sort at eval);
  * a fixed-width histogram is a mergeable O(bins) sketch: one
  * partial-aggregable count per (group, bin), then quantiles read off the
  * cumulative histogram with linear interpolation inside the landing bin.
  * Error is bounded by bin width; every step is integer counting plus a
  * couple of IEEE double ops, so results are engine-portable (unlike
  * t-digest/KLL, whose centroid layouts are implementation-defined).
  */
object Quantiles {

  /** Per-(group, bin) histogram of `valueCol` with `bins` fixed-width
    * buckets over [0, bins·width); values beyond clamp into the last bin. */
  def histogram(df: DataFrame, group: String, valueCol: String,
                bins: Int = 256, width: Double = 2.0): DataFrame =
    df.groupBy(col(group),
        least(floor(col(valueCol) / width), lit((bins - 1).toLong)).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimates at probabilities `ps` from a [[histogram]]:
    * cumulative counts locate the landing bin, linear interpolation
    * positions the estimate inside it. */
  def fromHistogram(hist: DataFrame, group: String, ps: Seq[Double],
                    width: Double = 2.0): DataFrame = {
    val wCum = Window.partitionBy(col(group)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(group))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val pDf = hist.sparkSession.createDataFrame(
      ps.map(Tuple1.apply)).toDF("p")
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("total", sum(col("cnt")).over(wAll))
    val wPick = Window.partitionBy(col(group), col("p")).orderBy(col("bin"))
    cum.crossJoin(broadcast(pDf))
      .withColumn("target", col("p") * col("total"))
      .filter(col("cum") >= col("target"))
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col(group), col("p"),
        round(col("bin") * width +
          lit(width) * (col("target") - (col("cum") - col("cnt"))) / col("cnt"), 4)
          .as("q_est"))
  }
}
