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

  /** Benford's-law expected first-digit shares, e6 (round(log₁₀(1+1/d)
    * ·10⁶), d = 1..9) — fixed literals so plan and oracle agree by
    * construction. */
  val benfordE6: IndexedSeq[Long] =
    (1 to 9).map(d => math.round(math.log10(1.0 + 1.0 / d) * 1e6))

  /** Benford first-digit screening per group — the classic fabricated-
    * numbers audit: naturally occurring multi-magnitude amounts follow
    * log₁₀(1+1/d); invented ones usually don't. Emits per (group, digit):
    * count, observed e6 share, expected e6 share, absolute deviation.
    * The first digit comes from the value's decimal string (codegen'd,
    * engine-portable for positive integers); non-positive values are
    * excluded (no leading digit). One keyed count + a broadcast-sized
    * share projection. */
  def benford(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val expected = benfordE6.zipWithIndex
      .foldLeft(when(lit(false), 0L)) { case (acc, (e, i)) =>
        acc.when(col("digit") === (i + 1).toLong, e)
      }.otherwise(0L)
    val d = df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .filter(col("v") > 0)
      .withColumn("digit", expr("CAST(substring(CAST(v AS STRING), 1, 1) AS BIGINT)"))
      .groupBy(col("g"), col("digit")).agg(count(lit(1)).as("n"))
    val tot = d.groupBy(col("g")).agg(sum(col("n")).as("nt"))
    d.join(tot, "g")
      .withColumn("share_e6", expr("n * 1000000L div nt"))
      .withColumn("expected_e6", expected)
      .withColumn("dev_e6", abs(col("share_e6") - col("expected_e6")))
      .select(col("g"), col("digit"), col("n"), col("share_e6"),
        col("expected_e6"), col("dev_e6"))
  }
}
