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
  /** Maintain per-group MIN/MAX under a change feed — the classic
    * non-invertible aggregate: inserts merge in O(delta) (min of mins),
    * but a delete that hits the current extreme invalidates it, and the
    * only sound recovery is a per-group rebuild from the current raw
    * rows. The scalable move is rebuilding ONLY the touched groups:
    *
    *  - `changes` (g, v, op ±1): inserts fold into candidate extremes;
    *  - groups where some deleted v equals the standing min or max are
    *    flagged (a tiny semi-join), and ONLY those groups re-aggregate
    *    from `raw` (the caller's post-change ground truth, e.g. the
    *    base table with the changelog applied) — at 100 TB that is a
    *    partition-pruned rescan of the hot groups, not the world;
    *  - untouched groups never read raw at all.
    *
    * Returns (g, mn, mx). Groups that vanish entirely disappear (their
    * rebuild finds no rows); brand-new groups arrive via inserts.
    */
  def maintainMinMax(base: DataFrame, changes: DataFrame,
                     raw: DataFrame): DataFrame = {
    val ins = changes.filter(col("op") > 0).groupBy(col("g"))
      .agg(min(col("v")).as("i_mn"), max(col("v")).as("i_mx"))
    val touched = changes.filter(col("op") < 0)
      .join(base, Seq("g"))
      .filter(col("v") === col("mn") || col("v") === col("mx"))
      .select(col("g")).distinct()
    // least/greatest skip NULLs, so new groups (no base row) and
    // insert-free groups fall out of the same expressions; the trailing
    // anti-join drops ins rows of touched groups — rebuilds are
    // authoritative for those
    val fastPath = base.join(touched, Seq("g"), "left_anti")
      .join(ins, Seq("g"), "full_outer")
      .select(col("g"), least(col("mn"), col("i_mn")).as("mn"),
        greatest(col("mx"), col("i_mx")).as("mx"))
      .join(touched, Seq("g"), "left_anti")
    val rebuilt = raw.join(touched, Seq("g"), "left_semi")
      .groupBy(col("g")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    fastPath.unionByName(rebuilt)
  }

  /** Maintain per-group KMV distinct SKETCHES under a VALUE-level change
    * feed — same touched-group shape as [[maintainMinMax]], because a
    * KMV sketch is just "the k smallest hashes": inserts merge in
    * O(delta) (union, re-sort, keep k), while deleting a value whose
    * hash IS among the k minima invalidates the sketch and rebuilds
    * that group from `raw`. Deleting a value whose hash is above the
    * sketch's horizon never touches it — most deletes are free.
    *
    * `base`: (g, sketch array<long> — ascending k-minima of the 48-bit
    * value hashes). `changes`: (g, v, op ±1) at VALUE grain (a delete
    * means the value left the group's distinct set). `raw`: post-change
    * distinct (g, v). Returns (g, sketch, est) with the integer KMV
    * estimator ((k−1)·2⁴⁸ div kth-min when saturated, exact size
    * below k) — the same estimator as [[graft.functions.KmvDistinct]].
    */
  def maintainKmv(base: DataFrame, changes: DataFrame, raw: DataFrame,
                  k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val h = Dedup.hash48(col("v").cast("string"), lit("kmv"))
    val ins = changes.filter(col("op") > 0)
      .select(col("g"), h.as("h")).distinct()
      .groupBy(col("g")).agg(collect_set(col("h")).as("ins_hs"))
    val touched = changes.filter(col("op") < 0)
      .withColumn("h", h)
      .join(base, Seq("g"))
      .filter(array_contains(col("sketch"), col("h")))
      .select(col("g")).distinct()
    val fastPath = base.join(touched, Seq("g"), "left_anti")
      .join(ins, Seq("g"), "full_outer")
      .select(col("g"),
        slice(array_sort(array_union(
          coalesce(col("sketch"), array().cast("array<long>")),
          coalesce(col("ins_hs"), array().cast("array<long>")))), 1, k)
          .as("sketch"))
      .join(touched, Seq("g"), "left_anti")
    val rebuilt = raw.join(touched, Seq("g"), "left_semi")
      .select(col("g"), h.as("h")).distinct()
      .groupBy(col("g"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("sketch"))
    fastPath.unionByName(rebuilt)
      .withColumn("est",
        when(size(col("sketch")) < k, size(col("sketch")).cast("long"))
          .otherwise(expr(s"${(k - 1).toLong}L * 281474976710656L div element_at(sketch, $k)")))
  }

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
