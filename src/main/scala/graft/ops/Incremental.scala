package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view delta path.
  * At 100 TB you do not recompute a grouped aggregate because a day of
  * changes arrived; you fold the CHANGE FEED into the standing result:
  * count/sum are Abelian-group aggregates, so deletions are just
  * negative contributions and `agg′ = agg ⊕ Δagg` needs one pass over
  * the (small) delta plus an outer join on the (pre-aggregated) state —
  * never the base data.
  */
object Incremental {

  /** Fold a change feed into a standing (group, cnt, total) aggregate.
    *
    * `base`: columns (g, cnt, total) — the materialized aggregate.
    * `changes`: columns (g, v, op) with op ∈ {+1 insert, −1 delete}.
    * Returns the maintained (g, cnt, total), groups whose count reaches
    * zero dropped (a delete for a row the base never counted is the
    * caller's bug — counts going negative raise no error here, they
    * just stay negative and visible).
    *
    * Scale: the delta pre-aggregates map-side (one exchange over the
    * CHANGES only), then a full-outer equi-join against base state that
    * a sensible layout co-partitions; base is never re-scanned beyond
    * the join.
    */
  def maintainAgg(base: DataFrame, changes: DataFrame): DataFrame = {
    val delta = changes.groupBy(col("g"))
      .agg(sum(col("op")).as("d_cnt"),
        sum(col("v") * col("op")).as("d_total"))
    base.join(delta, Seq("g"), "full_outer")
      .select(col("g"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("d_total"), lit(0L))).as("total"))
      .filter(col("cnt") =!= 0L)
  }
}
