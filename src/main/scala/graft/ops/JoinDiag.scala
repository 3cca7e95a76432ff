package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight join diagnostics: predict an equi-join's output size and
  * find the keys that dominate it — BEFORE paying for the join. At
  * 100 TB the difference between a join that finishes and one that
  * doesn't is usually a handful of hot keys whose per-key cross product
  * explodes; this is the scan that tells you to salt, filter, or
  * broadcast first.
  *
  * Scale: each side collapses to per-key counts (partial-aggregated —
  * the scan output is |distinct keys|, not rows), the count frames join
  * on the key, and the per-key products top-k via TakeOrdered. Cost is
  * two aggregates + one tiny join, independent of the would-be join's
  * output size.
  */
object JoinDiag {

  /** Top-`k` join keys by predicted output rows (n_left × n_right),
    * ties broken on key for determinism. Inner-join semantics: keys
    * present on both sides only. */
  def topJoinKeys(left: DataFrame, leftKey: String,
                  right: DataFrame, rightKey: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val lc = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("n_right"))
    lc.join(rc, "k")
      .withColumn("out_rows", col("n_left") * col("n_right"))
      .orderBy(col("out_rows").desc, col("k"))
      .limit(k)
  }
}
