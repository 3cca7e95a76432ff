package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two cohorts of the same keyed
  * data — the train/serve skew and data-freshness check every production
  * pipeline runs before trusting a model or a new ingest batch.
  */
object Drift {

  /** Population Stability Index per group between cohorts `half` 0 and 1
    * over integer `bucket` ∈ [0, maxBucket]:
    *   PSI = Σ_buckets (p − q)·log(p/q)
    * in e6 fixed point with the shared fixed-point log₂
    * ([[Bm25.log2E6]]) — log₂ units scale PSI by 1/ln 2, a constant, so
    * the conventional 0.1/0.25 alert thresholds just rescale. Shares are
    * add-one smoothed over the FULL bucket grid, (n+1)·1e6 div
    * (n_total + maxBucket + 1), so empty buckets contribute a finite
    * penalty instead of an infinite log — and every step is integer, so
    * the oracle replays it exactly.
    *
    * Scale: one count aggregate on (group, half, bucket), a broadcast-
    * sized grid join (groups × buckets × 2), and a per-group reduce.
    * Output: (group, psi_e6, n_buckets). */
  def psi(df: DataFrame, groupCol: String, halfCol: String,
          bucketCol: String, maxBucket: Int): DataFrame = {
    require(maxBucket >= 1, "need at least 2 buckets")
    val cnt = df.select(col(groupCol).as("g"), col(halfCol).as("half"),
        col(bucketCol).as("bucket"))
      .groupBy(col("g"), col("half"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("g"), col("half")).agg(sum(col("n")).as("nt"))
    val grid = cnt.select(col("g")).distinct()
      .withColumn("bucket", explode(expr(s"sequence(0L, ${maxBucket}L)")))
      .withColumn("half", explode(array(lit(0L), lit(1L))))
    val shares = grid
      .join(cnt, Seq("g", "half", "bucket"), "left")
      .join(tot, Seq("g", "half"))
      .select(col("g"), col("bucket"), col("half"),
        expr(s"(coalesce(n, 0L) + 1L) * 1000000L div (nt + ${maxBucket + 1}L)")
          .as("share_e6"))
    shares.groupBy(col("g"), col("bucket"))
      .agg(max(when(col("half") === 0, col("share_e6"))).as("p_e6"),
        max(when(col("half") === 1, col("share_e6"))).as("q_e6"))
      .withColumn("term",
        (col("p_e6") - col("q_e6")) *
          (Bm25.log2E6(col("p_e6")) - Bm25.log2E6(col("q_e6"))))
      .groupBy(col("g"))
      .agg(expr("sum(term) div 1000000L").as("psi_e6"),
        count(lit(1)).as("n_buckets"))
  }
}
