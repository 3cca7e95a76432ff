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
  /** Per-key interval-UNION coverage: merge overlapping-or-touching
    * [start, end) intervals into maximal segments and report how much of
    * the line each key actually covers — machine uptime from session
    * logs, validity coverage from SCD2 ranges, ad exposure from
    * impression windows. The sweep is the classic one-pass identity:
    * order by start, a segment BREAKS where start exceeds the running
    * max end of all earlier intervals; a running sum of break flags
    * numbers the segments. Equal intervals merge under either tie
    * order, so no tie column is needed — the output is deterministic.
    *
    * Scale: both windows and the final aggregate partition by `key` —
    * ONE exchange, no self-join (the naive overlap join is quadratic
    * per key; the sweep is linear).
    */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
               endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(col("key")).orderBy(col("s"), col("e"))
    val prior = ord.rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(keyCol).as("key"), col(startCol).as("s"), col(endCol).as("e"))
      .withColumn("prev_max", max(col("e")).over(prior))
      .withColumn("brk",
        when(col("prev_max").isNull || col("s") > col("prev_max"), 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("brk")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("key"), col("seg"))
      .agg(min(col("s")).as("seg_s"), max(col("e")).as("seg_e"),
        count(lit(1)).as("n_intervals"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("n_intervals")).as("n_intervals"),
        sum(col("seg_e") - col("seg_s")).as("covered"))
  }

  /** Peak concurrency per key — "max simultaneous sessions": the classic
    * sweep line. Each half-open interval [s, e) emits (+1 at s, −1 at e);
    * the running sum over (t, delta) order peaks at the answer. Ties:
    * delta −1 sorts before +1, so an interval ending exactly where
    * another starts never counts as overlap; among equal (t, delta) rows
    * the row order is arbitrary but the MAX of the running sum is
    * permutation-invariant (the sum walks through every permutation to
    * the same extremes). Output: (key, n_intervals, peak).
    *
    * Scale: one key-partitioned sort window + one keyed aggregate —
    * linear, never the quadratic per-key overlap self-join. */
  def peakConcurrency(df: DataFrame, keyCol: String, startCol: String,
                      endCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = df.select(col(keyCol).as("key"), col(startCol).as("s"),
        col(endCol).as("e"))
      .select(col("key"), explode(array(
        struct(col("s").as("t"), lit(1L).as("delta")),
        struct(col("e").as("t"), lit(-1L).as("delta")))).as("ev"))
      .select(col("key"), col("ev.t").as("t"), col("ev.delta").as("delta"))
    val run = Window.partitionBy(col("key")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("c", sum(col("delta")).over(run))
      .groupBy(col("key"))
      .agg((count(lit(1)) / 2).cast("long").as("n_intervals"),
        max(col("c")).as("peak"))
  }

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
