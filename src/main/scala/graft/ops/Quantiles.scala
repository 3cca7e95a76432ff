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

  /** EXACT percentiles of an integer column WITHOUT a total sort —
    * distributed selection by histogram refinement. For each requested
    * probability p (e6-scaled), the target rank is k = ⌈p·n⌉ (1-indexed,
    * "smallest value with at least k values ≤ it" — the discrete lower
    * quantile), and the k-th order statistic is located in three scans:
    *
    *  1. bounds: one (min, max, count) aggregate;
    *  2. histogram: one pass counting 4096 equal-width integer buckets —
    *     the cumulative histogram pins the bucket containing rank k and
    *     the residual rank within it;
    *  3. selection: sort ONLY the landing bucket's values (`orderBy` +
    *     `limit(residual)`, a TakeOrdered — top-k heap per partition,
    *     never a full shuffle sort) and take the max.
    *
    * At 100 TB this is the standard exact-percentile plan: total-sorting
    * n rows for one rank is O(n log n) shuffle; this is 3 narrow scans
    * and a top-k of ≈ n/4096 rows. Repeated buckets (heavy skew) only
    * grow the limit() bound, never break correctness. All ps share the
    * SAME bounds and histogram passes.
    *
    * Driver-side: only the 4096-row histogram and the scalar bounds —
    * the data never collects. Returns one row per p:
    * (p_e6, k, n_rows, value).
    */
  def exactPercentiles(df: DataFrame, valueCol: String,
                       psE6: Seq[Long]): DataFrame = {
    require(psE6.nonEmpty && psE6.forall(p => p > 0L && p <= 1000000L),
      "each p_e6 must be in (0, 1e6]")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("long").as("v"))
    val bounds = v.agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
      count(lit(1)).as("n")).first()
    require(!bounds.isNullAt(2) && bounds.getLong(2) > 0L, "empty input")
    val (lo, hi, n) = (bounds.getLong(0), bounds.getLong(1), bounds.getLong(2))
    val bins = 4096L
    // ceil so bins·width covers the closed domain; width ≥ 1 keeps the
    // bucket→range inversion exact in integers
    val width = math.max(1L, (hi - lo + bins) / bins)
    val hist = v.groupBy(expr(s"(v - ${lo}L) div ${width}L").as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val cum = hist.scanLeft((0L, 0L)) { case ((_, c), (b, cnt)) => (b, c + cnt) }.tail
    val rows = psE6.map { p =>
      val k = (n * p + 999999L) / 1000000L
      val i = cum.indexWhere(_._2 >= k)
      val (bin, cumAt) = cum(i)
      val before = if (i == 0) 0L else cum(i - 1)._2
      val residual = (k - before).toInt
      require(cumAt >= k && residual >= 1)
      val bLo = lo + bin * width
      val bHi = bLo + width - 1
      val value = v.filter(col("v") >= bLo && col("v") <= bHi)
        .orderBy(col("v")).limit(residual)
        .agg(max(col("v"))).first().getLong(0)
      (p, k, n, value)
    }
    rows.toDF("p_e6", "k", "n_rows", "value")
  }
}
