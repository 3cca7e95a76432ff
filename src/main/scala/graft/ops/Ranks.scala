package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering — the scale-correct replacement for an
  * unpartitioned `row_number().over(Window.orderBy(...))`, which moves
  * EVERY row to one partition (WindowExec's single-partition warning;
  * catastrophic at 100 TB even though results are identical).
  *
  * Mechanism: `repartitionByRange` on the sort key (Spark samples split
  * points; explicit numPartitions, so AQE never coalesces them) +
  * `sortWithinPartitions` (local sort only), then the LOCAL row index is
  * read straight off `monotonically_increasing_id` — its documented
  * layout is (partitionId << 33) | localIndex, and the projection runs
  * over the sorted iterator, so the low 33 bits ARE the 0-based sorted
  * position within the partition with NO window and NO extra shuffle.
  * Global rank = local index + the partition's offset, computed from
  * per-partition counts (a #partitions-row aggregate that broadcasts).
  *
  * The total order is exact and identical to the single-partition window
  * as long as `sortCols` is a total order (pass tie-breaker columns!);
  * only the plan shape changes. Cost: ONE data-sized range exchange + a
  * tiny count aggregate + a broadcast join — vs "ship everything to one
  * task". Bound: < 2^33 rows per range partition (size `parts` to the
  * cluster).
  */
object Ranks {

  /** `df` plus column `rankCol` = exact 1-based global rank by
    * `sortCols` (must be a total order — include a unique tie-break).
    * `parts` bounds the range partitions (pass the real cluster width
    * in production; the default matches the suite's loop width). */
  /** Global exact nearest-rank (type-1) percentiles via the rank layout:
    * value at rank ceil(p·n/100) for each integer p. Cost shape = ONE
    * data-sized range exchange (the [[globalRowNumber]] layout, which is
    * checkpointed — the total count and the offset aggregate both ride
    * the materialized layout) + a broadcast of the #ps target ranks.
    *
    * This is the selection facade promised in SURVEY §7.4m: it answers
    * "k-th smallest" without [[Quantiles.exactPercentiles]]'s
    * histogram-refine machinery. Trade-off, measured not guessed:
    * histogram-refine does two LIGHT scans (bucket counts, then residual
    * scan) and never moves the data; this facade pays one FULL range
    * shuffle but leaves behind a reusable totally-ordered layout. Use
    * this form when the ranked layout is also needed downstream (top-k
    * pages, ntiles, rank joins); use the histogram when only the
    * quantile values matter.
    *
    * `tieBreaks` must complete a total order over `valueCol` — the
    * returned VALUE at a target rank is tie-break-invariant (ranks
    * within a tied value run all carry the same value), so any unique
    * id works.
    */
  def globalExactPercentiles(df: DataFrame, valueCol: Column,
                             tieBreaks: Seq[Column], ps: Seq[Int],
                             valueName: String = "value",
                             parts: Int = 8): DataFrame = {
    val ranked = globalRowNumber(
      df.select((valueCol.as("__v") +: tieBreaks): _*),
      col("__v") +: tieBreaks, "__rk", parts)
    val total = ranked.agg(count(lit(1)).as("__n"))
    val spark = df.sparkSession
    import spark.implicits._
    val targets = ps.toDF("p").crossJoin(total)
      .select(col("p").cast("long").as("p"),
        expr("(p * __n + 99) div 100").as("__target"))
    ranked.join(broadcast(targets), col("__rk") === col("__target"))
      .select(col("p"), col("__v").as(valueName))
  }

  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
                      rankCol: String, parts: Int = 8): DataFrame = {
    // Materialize the partitioned+sorted+locally-indexed layout ONCE
    // (eager checkpoint): both downstream consumers — the offset
    // aggregate and the join back — must see the SAME physical
    // partition boundaries. Without this they re-execute the range
    // exchange independently, and range boundaries come from SAMPLING,
    // so the two executions can split differently — offsets then
    // disagree with the join-back's layout and ranks silently collide
    // or skip (observed at sf0.1 as an 11th ntile decile).
    val keyed = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lr",
        (monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))) + 1L)
      .localCheckpoint(false)
    val offs = keyed.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", sum(col("__c")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        - col("__c"))
      .select(col("__pid"), col("__off")) // one row per partition: tiny
    keyed.join(broadcast(offs), "__pid")
      .withColumn(rankCol, col("__lr") + col("__off"))
      .drop("__pid", "__lr")
  }
}
