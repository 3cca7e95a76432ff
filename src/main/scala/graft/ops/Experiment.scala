package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B experiment readout with an EXACT integer significance decision.
  * The two-proportion pooled z-test
  *   z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b)),  p̂ = (c_a+c_b)/(n_a+n_b)
  * squares and cross-multiplies into pure integers:
  *   z² > α  ⟺  10⁴·n·(c_a·n_b − c_b·n_a)² > α₄·n_a·n_b·c·(n−c)
  * with n = n_a+n_b, c = c_a+c_b and α₄ the critical z² in 1e-4 units
  * (38416 = 1.96²). Wide products ride decimal(38,0) (HUGEINT in the
  * oracle), so the verdict cannot flip on floating-point rounding — the
  * same exactness trick as [[Anomaly.zscoreProfile]].
  *
  * Scale: one shuffle to collapse events per unit, then a single
  * partial-aggregated global reduction to the 2×2 table. Nothing about
  * the test statistic ever touches a double.
  */
object Experiment {

  /** `units` must carry one row per experimental unit with an integer
    * `variantCol` ∈ {0, 1} and integer `convertedCol` ∈ {0, 1}. Returns
    * one row: per-variant sizes/conversions and the significance flag. */
  def twoProportionTest(units: DataFrame, variantCol: String,
                        convertedCol: String,
                        alphaZ2e4: Long = 38416L): DataFrame = {
    val v = col(variantCol)
    val c = col(convertedCol)
    val agg = units.agg(
      sum(when(v === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(v === 0, c).otherwise(lit(0L))).as("conv_a"),
      sum(when(v === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(v === 1, c).otherwise(lit(0L))).as("conv_b"))
    val dec = "decimal(38,0)"
    val n = (col("n_a") + col("n_b")).cast(dec)
    val cc = (col("conv_a") + col("conv_b")).cast(dec)
    val diff = (col("conv_a").cast(dec) * col("n_b").cast(dec)
      - col("conv_b").cast(dec) * col("n_a").cast(dec))
    val lhs = lit(10000L).cast(dec) * n * diff * diff
    val rhs = lit(alphaZ2e4).cast(dec) * col("n_a").cast(dec) *
      col("n_b").cast(dec) * cc * (n - cc)
    agg.withColumn("significant", lhs > rhs)
  }
}
