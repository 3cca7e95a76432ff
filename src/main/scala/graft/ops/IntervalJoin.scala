package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch interval (band) self-join via bucket blocking — the batch twin of
  * [[graft.stream.StreamJoins.joinWithin]]. A naive |tsA − tsB| ≤ tol
  * theta join is a per-key cross join; bucketing time into tol-wide cells
  * and exploding ONE side to its three candidate cells turns it into an
  * equi-join on (key, bucket) — the classic band-join reduction. A pair
  * within tolerance always lands in adjacent-or-equal buckets, so recall
  * is exact; the residual |Δt| ≤ tol filter runs post-join on candidates
  * only.
  *
  * Scale shape: the 3× explode is map-side; the join shuffles on
  * (key, bucket) — bounded fan-in per cell instead of per key, which is
  * what keeps a hot key (one customer with millions of rows) from going
  * quadratic in a single task. Each qualifying pair matches in EXACTLY
  * one exploded bucket (the probe's own), so no post-join dedup is needed.
  */
object IntervalJoin {

  /** All same-`key` pairs of `df` rows whose `tsCol` (epoch seconds)
    * differ by ≤ `tolSec`, with `idCol` ordering the pair (id_a < id_b).
    * Output: (key, id_a, id_b, ts_a, ts_b). */
  def selfPairsWithin(df: DataFrame, key: String, idCol: String, tsCol: String,
                      tolSec: Long): DataFrame = {
    require(tolSec > 0, "tolerance must be positive")
    val t = df.select(col(key), col(idCol).as("id"), col(tsCol).as("ts"))
    val probe = t.withColumn("bkt", expr(s"ts div $tolSec"))
      .select(col(key), col("id").as("id_a"), col("ts").as("ts_a"), col("bkt"))
    val build = t.withColumn("bkt0", expr(s"ts div $tolSec"))
      .select(col(key), col("id").as("id_b"), col("ts").as("ts_b"),
        explode(array(col("bkt0") - 1, col("bkt0"), col("bkt0") + 1)).as("bkt"))
    probe.join(build, Seq(key, "bkt"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("ts_a") - col("ts_b")) <= tolSec)
      .drop("bkt")
  }
}
