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

  /** GROUPED exact percentile — the per-key k-th order statistic, fully
    * distributed (no driver-side loop over groups, unlike
    * [[exactPercentiles]]' scalar histogram): every stage is a
    * group-keyed aggregate, window, or join, so a million groups cost
    * the same plan as five.
    *
    *  1. per-group (lo, hi, n) stats → target rank k = ⌈p·n⌉ and an
    *     integer bucket width covering the group's own domain;
    *  2. per-(group, bin) histogram; a cumulative window per group pins
    *     each group's landing bin and residual rank;
    *  3. rows of the landing bin only (equi-join on group + bin-range
    *     filter) get a per-group row_number; rn = residual selects the
    *     value. Ranking only orders by value, so ties pick a
    *     deterministic VALUE even though row order among equals isn't.
    *
    * ~4 exchanges, all hash-partitioned by group; the quadratic risk of
    * percentile-buffering UDAFs (full per-group value lists in memory)
    * never appears — per-group state is `bins` counters.
    */
  def groupedPercentile(df: DataFrame, groupCol: String, valueCol: String,
                        pE6: Long, bins: Long = 1024L): DataFrame = {
    require(pE6 > 0L && pE6 <= 1000000L, "pE6 must be in (0, 1e6]")
    require(bins >= 2L, "bins must be >= 2")
    val v = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val stats = v.groupBy(col("g"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
      .withColumn("k", expr(s"(n * ${pE6}L + 999999) div 1000000"))
      .withColumn("width", greatest(lit(1L), expr(s"(hi - lo + ${bins}L) div ${bins}L")))
    val joined = v.join(stats, "g")
    val hist = joined
      .groupBy(col("g"), expr("(v - lo) div width").as("bin"))
      .agg(count(lit(1)).as("cnt"),
        first(col("k")).as("k"), first(col("lo")).as("lo"),
        first(col("width")).as("width"), first(col("n")).as("n"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val landing = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .filter(col("cum") >= col("k"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("bin"))))
      .filter(col("rn") === 1)
      .select(col("g"), col("k"), col("n"),
        (col("k") - (col("cum") - col("cnt"))).as("residual"),
        (col("lo") + col("bin") * col("width")).as("b_lo"),
        (col("lo") + (col("bin") + 1) * col("width") - 1).as("b_hi"))
    v.join(landing, "g")
      .filter(col("v") >= col("b_lo") && col("v") <= col("b_hi"))
      .withColumn("vrn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
      .filter(col("vrn") === col("residual"))
      .select(col("g"), lit(pE6).as("p_e6"), col("k"), col("n").as("n_rows"),
        col("v").as("value"))
  }

  /** Percentile BANDS per group — p25/p50/p75-style multi-percentile in
    * ONE histogram pass: [[groupedPercentile]] generalized so the
    * per-group stats fan out over the requested percentiles (a literal
    * explode — broadcast-sized) while the expensive parts, the histogram
    * and the landing-bin row selection, are built and scanned ONCE and
    * shared by every percentile. Asking for 5 percentiles costs the same
    * shuffles as asking for 1 — the point of the histogram formulation
    * at scale. Output: (g, p_e6, k, n_rows, value). */
  def groupedPercentileBands(df: DataFrame, groupCol: String,
                             valueCol: String, psE6: Seq[Long],
                             bins: Long = 1024L): DataFrame = {
    require(psE6.nonEmpty && psE6.forall(p => p > 0L && p <= 1000000L),
      "each pE6 must be in (0, 1e6]")
    require(psE6.distinct.size == psE6.size, "duplicate percentiles")
    require(bins >= 2L, "bins must be >= 2")
    val v = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val stats = v.groupBy(col("g"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
      .withColumn("width", greatest(lit(1L), expr(s"(hi - lo + ${bins}L) div ${bins}L")))
      .withColumn("p_e6", explode(array(psE6.map(lit(_)): _*)))
      .withColumn("k", expr("(n * p_e6 + 999999) div 1000000"))
    val hist = v.join(stats.select(col("g"), col("lo"), col("width")).distinct(), "g")
      .groupBy(col("g"), expr("(v - lo) div width").as("bin"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wCum))
    val landing = cum.join(stats, "g")
      .filter(col("cum") >= col("k") && col("cum") - col("cnt") < col("k"))
      .select(col("g"), col("p_e6"), col("k"), col("n"),
        (col("k") - (col("cum") - col("cnt"))).as("residual"),
        (col("lo") + col("bin") * col("width")).as("b_lo"),
        (col("lo") + (col("bin") + 1) * col("width") - 1).as("b_hi"))
    v.join(landing, "g")
      .filter(col("v") >= col("b_lo") && col("v") <= col("b_hi"))
      .withColumn("vrn", row_number().over(
        Window.partitionBy(col("g"), col("p_e6")).orderBy(col("v"))))
      .filter(col("vrn") === col("residual"))
      .select(col("g"), col("p_e6"), col("k"), col("n").as("n_rows"),
        col("v").as("value"))
  }

  /** Gini coefficient per group over non-negative integer values, e6:
    *   G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx),  x₍ᵢ₎ ascending —
    * the standard concentration metric (0 = perfectly even, →1e6 = one
    * row owns everything). Tie order cannot matter: within a block of
    * equal x the rank-weighted sum is x·Σi whatever the permutation, so
    * the result is deterministic even though row_number among ties is
    * not. Sums are exact DECIMAL(38,0); the final ratio is truncating
    * integer. Groups with zero total emit NULL. One rank window + one
    * keyed aggregate. */
  def gini(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .filter(col("v") >= 0)
    v.withColumn("i", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
      .selectExpr("g", "CAST(v AS DECIMAL(38,0)) AS v",
        "CAST(i AS DECIMAL(38,0)) AS i")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("i") * col("v")).as("siv"))
      .selectExpr("g", "CAST(n AS BIGINT) AS n_rows",
        """CASE WHEN s = 0 THEN NULL
          |     ELSE CAST((2 * siv - (n + 1) * s) * 1000000
          |               div (n * s) AS BIGINT)
          |END AS gini_e6""".stripMargin)
  }

  /** Winsorized mean per group: values clamped to the group's own
    * [pLo, pHi] percentiles before averaging — the robust mean that
    * survives fat tails without dropping rows (clamping keeps n stable,
    * unlike trimming). Percentile cutpoints come from ONE shared
    * histogram pass ([[groupedPercentileBands]]); the clamp + means are
    * a join-back and one aggregate. All integer (truncating div means).
    * Output: (g, n_rows, p_lo, p_hi, raw_mean, win_mean). */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
                     pLoE6: Long, pHiE6: Long): DataFrame = {
    require(pLoE6 < pHiE6, "pLo must be below pHi")
    val v = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
    val cuts = groupedPercentileBands(v, "g", "v", Seq(pLoE6, pHiE6))
      .groupBy(col("g"))
      .agg(max(when(col("p_e6") === pLoE6, col("value"))).as("p_lo"),
        max(when(col("p_e6") === pHiE6, col("value"))).as("p_hi"))
    v.join(cuts, "g")
      .withColumn("w", greatest(col("p_lo"), least(col("p_hi"), col("v"))))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"), first(col("p_lo")).as("p_lo"),
        first(col("p_hi")).as("p_hi"),
        expr("sum(v) div count(*)").as("raw_mean"),
        expr("sum(w) div count(*)").as("win_mean"))
  }

  /** WEIGHTED median per group: the smallest value v whose cumulative
    * weight reaches half the group's total — e.g. "the price at which
    * half the shipped QUANTITY sits below" rather than half the rows.
    * Integer weights, integer compare (2·cum ≥ total — no division), so
    * cross-engine exact; ties in v are impossible after pre-aggregation.
    *
    * Scale: a keyed pre-aggregate by (group, value) first — map-side
    * combinable, so the window that follows orders DISTINCT values per
    * group, not raw rows (for bounded domains like cents this caps the
    * window input regardless of corpus size). Then one window pass +
    * one keyed min. Output: (group, wmedian, total_w). */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .groupBy(col("g"), col("v")).agg(sum(col("w")).as("w"))
    val ord = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("g"))
    g.withColumn("cw", sum(col("w")).over(ord))
      .withColumn("tw", sum(col("w")).over(all))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("wmedian"), max(col("tw")).as("total_w"))
  }

  /** Lorenz curve at decile cuts, per group — the curve behind [[gini]]:
    * for decile d, the share of total value held by the poorest
    * ⌊n·d/10⌋ rows, as an exact e6 integer. Prefix sums of SORTED
    * values are tie-insensitive (any order among equal values yields
    * the same prefix sum at any cut), so row_number ranking is
    * deterministic where it matters. Requires non-negative values.
    * Output: (g, decile, k_rows, share_e6) — share_e6 non-decreasing
    * and ≤ its decile's 1e6·d/10 iff inequality exists.
    *
    * Scale: one keyed rank window + one keyed totals aggregate; the
    * 10-way decile fan-out multiplies ROWS ONLY by the bounded decile
    * count before the final keyed aggregate. */
  def lorenz(df: DataFrame, groupCol: String, centsCol: String): DataFrame = {
    val ranked = df
      .select(col(groupCol).as("g"), col(centsCol).as("v"))
      .withColumn("i", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("v"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .withColumn("tot", sum(col("v")).over(Window.partitionBy(col("g"))))
    ranked
      .select(col("g"), col("v"), col("i"), col("n"), col("tot"),
        explode(expr("sequence(1, 10)")).as("decile"))
      .filter(col("i") <= expr("(n * decile) div 10"))
      .groupBy(col("g"), col("decile"))
      .agg(max(expr("(n * decile) div 10")).as("k_rows"),
        sum(col("v")).as("cum_v"), max(col("tot")).as("tot"))
      .selectExpr("g", "CAST(decile AS BIGINT) AS decile", "k_rows",
        "CAST(cum_v * 1000000 div tot AS BIGINT) AS share_e6")
  }
}
