package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points not dominated by any other,
  * where `q` dominates `p` iff q.x ≥ p.x ∧ q.y ≤ p.y with at least one
  * strict (maximize x, minimize y — flip signs at the call site for other
  * orientations). Classic multi-criteria "best tradeoff" query (best
  * price-vs-quantity suppliers, fastest-vs-cheapest routes).
  *
  * Algorithm: reduce to x-levels first — within one x, only the min-y
  * points can survive — then a strict-prefix running min over the
  * x-level table ordered by x descending decides survival. The quadratic
  * NOT-EXISTS dominance check never materializes.
  *
  * Scale: one groupBy(x) shuffle over the data; the running-min window is
  * global-ordered but runs over the DISTINCT-x table, which is bounded by
  * the x domain (quantities, bucketed scores), not the row count. For
  * continuous high-cardinality x, bucket x first (the frontier of bucket
  * minima is a superset filter) or range-partition and merge per-partition
  * frontiers — both keep the global sweep off the raw data.
  */
object Skyline {

  /** Skyline x-levels: (x, min_y) pairs on the frontier. A point survives
    * iff its y is strictly below every strictly-greater x-level's min y
    * (ties on both coordinates survive together — no strict coordinate). */
  def frontierLevels(points: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = points.groupBy(col(xCol).as("x")).agg(min(col(yCol)).as("min_y"))
    val strictPrefix = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    perX.withColumn("better_min", min(col("min_y")).over(strictPrefix))
      .filter(col("better_min").isNull || col("min_y") < col("better_min"))
      .select(col("x"), col("min_y"))
  }

  /** Full skyline rows: every input point lying on a frontier level
    * (duplicates on a level all survive — none dominates its twin). */
  def skyline2D(points: DataFrame, xCol: String, yCol: String): DataFrame =
    points.join(
      broadcast(frontierLevels(points, xCol, yCol)),
      points(xCol) === col("x") && points(yCol) === col("min_y"))
      .drop("x", "min_y")
}
