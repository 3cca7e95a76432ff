package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-table consistency audits — the checks a pipeline runs before
  * promoting a snapshot (the reference's Mongo sink trusts upstream keys
  * blindly, `heatmap_stream.py:173,217`; at warehouse scale you audit).
  */
object Audit {

  /** Orphan count for one foreign-key relation: child rows whose non-null
    * `childKey` has no match in `parent(parentKey)`. Null child keys are
    * excluded (three-valued SQL semantics: a null FK is "unknown", not an
    * orphan).
    *
    * Scale: LEFT ANTI join on the key — Spark broadcasts the parent key
    * set when small, else hash-shuffles both sides; either way the count
    * is partial-aggregated map-side. Always returns exactly one row. */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String,
              relation: String): DataFrame =
    child.select(col(childKey).as("k")).filter(col("k").isNotNull)
      .join(parent.select(col(parentKey).as("k")).distinct(), Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit(relation).as("relation"), col("n_orphans"))

  /** One audit row per relation, unioned. */
  def referentialIntegrity(
      relations: Seq[(DataFrame, String, DataFrame, String, String)]): DataFrame =
    relations.map { case (c, ck, p, pk, name) => orphans(c, ck, p, pk, name) }
      .reduce(_ unionByName _)

  /** Declarative single-table constraint audit: every row-level rule is a
    * boolean VIOLATION predicate, all counted in ONE pass over the table
    * (one partial-aggregated scan however many rules there are), then
    * pivoted to a (rule, n_violations) row each via an exploded map.
    * Uniqueness rules need the distinct aggregate and ride the same agg.
    * Write rules so nulls land where the policy wants them — e.g. a range
    * rule that must reject nulls is `coalesce(NOT (x > 0), true)`. */
  def constraints(df: DataFrame, rowRules: Seq[(String, Column)],
                  uniqueKeys: Seq[(String, String)] = Nil): DataFrame = {
    require(rowRules.nonEmpty || uniqueKeys.nonEmpty, "no rules given")
    val rowAggs = rowRules.map { case (n, c) =>
      sum(when(c, 1L).otherwise(0L)).as(n) }
    val uniqAggs = uniqueKeys.map { case (n, k) =>
      (count(col(k)) - countDistinct(col(k))).as(n) }
    val aggs = rowAggs ++ uniqAggs
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val names = rowRules.map(_._1) ++ uniqueKeys.map(_._1)
    wide.select(explode(map(
        names.flatMap(n => Seq(lit(n), col(n))): _*)).as(Seq("rule", "n_violations")))
  }
}
