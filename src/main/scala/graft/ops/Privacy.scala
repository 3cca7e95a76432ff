package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** t-closeness audit (Li, Li, Venkatasubramanian 2007) — the third leg
  * of the privacy trio after k-anonymity (group sizes) and l-diversity
  * (distinct sensitive values): a group is unsafe when the DISTRIBUTION
  * of its sensitive attribute strays from the corpus-wide one, measured
  * by Earth Mover's Distance over the ordered sensitive buckets.
  *
  * For a 1-D ordered attribute with m equally-spaced buckets the EMD has
  * the closed form  (1/(m−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|  — a cumulative
  * window over the FULL bucket grid (zero-filled, same pattern as
  * [[Drift.psi]]). Shares are e6 fixed point (cnt·10⁶ div n), so every
  * step is integer and the oracle replays it exactly.
  *
  * Scale: one count aggregate on (group, bucket), a broadcast-sized grid
  * join (groups × global buckets), one per-group window + reduce.
  */
object Privacy {

  /** Per-group t in e6: (group cols…, n, m_buckets, t_e6). Buckets are
    * ranked by value over the GLOBAL distinct set, so groups missing a
    * bucket still pay its full |cum| term. */
  def tCloseness(df: DataFrame, groupCols: Seq[String],
                 bucketCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val cnt = df.groupBy(gs :+ col(bucketCol).as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // groups × buckets cells: tiny; ONE raw scan
    val globalBuckets = cnt.select(col("bucket")).distinct()
    val global = cnt.groupBy(col("bucket")).agg(sum(col("n")).as("gn"))
      .crossJoin(broadcast(cnt.agg(sum(col("n")).as("gtot"))))
      .select(col("bucket"), expr("gn * 1000000L div gtot").as("q_e6"))
    val groups = cnt.groupBy(gs: _*).agg(sum(col("n")).as("ntot"))
    val grid = groups.crossJoin(broadcast(globalBuckets))
    val shares = grid
      .join(cnt, groupCols :+ "bucket", "left")
      .join(broadcast(global), Seq("bucket"))
      .select(gs ++ Seq(col("bucket"), col("ntot"),
        (expr("coalesce(n, 0L) * 1000000L div ntot") - col("q_e6")).as("d_e6")): _*)
    val wCum = Window.partitionBy(gs: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    shares.withColumn("cum", sum(col("d_e6")).over(wCum))
      .groupBy(gs: _*)
      .agg(max(col("ntot")).as("n"), count(lit(1)).as("m_buckets"),
        expr("sum(abs(cum))").as("emd_sum"))
      .filter(col("m_buckets") > 1)
      .withColumn("t_e6", expr("emd_sum div (m_buckets - 1L)"))
      .drop("emd_sum")
  }
}
