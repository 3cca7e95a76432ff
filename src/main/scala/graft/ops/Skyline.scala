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

  /** 3-D skyline (maximize x, minimize y, minimize z). The 2-D x-level
    * sweep does not generalize — a point with a dominated (x, y) can still
    * survive on z — so the shape is reduce-then-verify:
    *
    *  1. Level reduction: per (x, y), only the min-z points can survive
    *     (anything above min z is strictly dominated by its own level).
    *     One groupBy shuffle over the data; levels are bounded by the
    *     (x, y) domain, not the row count.
    *  2. Per-x 2-D prefilter: within one x, dominance needs no strict x,
    *     so the (y, z) levels of each x group form an ordinary 2-D
    *     frontier — the strict-prefix running-min sweep from
    *     [[frontierLevels]], partitioned by x. Kills most levels cheaply.
    *  3. Dominance verification on the survivors: a broadcast non-equi
    *     self-join (l2.x ≥ l1.x ∧ l2.y ≤ l1.y ∧ l2.z ≤ l1.z, one strict)
    *     as a LEFT ANTI. Quadratic — but only over the twice-reduced
    *     level table, which is why callers bucket continuous dims first.
    *
    * Full rows come back by an equi-join of the input against surviving
    * levels on (x, y, z): coordinate-tied duplicates all survive together.
    */
  def skyline3D(points: DataFrame, xCol: String, yCol: String,
                zCol: String): DataFrame = {
    // internal names prefixed so inputs named x/y/z don't become ambiguous
    val levels = points
      .groupBy(col(xCol).as("_sk_x"), col(yCol).as("_sk_y"))
      .agg(min(col(zCol)).as("_sk_z"))
    val perX = Window.partitionBy(col("_sk_x")).orderBy(col("_sk_y").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // Materialize the (small) prefiltered level table once: it feeds BOTH
    // sides of the anti-join, and aliased branches would otherwise
    // re-execute the aggregate + window from the source (ReuseExchange
    // does not unify them — the round-1 minhash lesson). The input frame
    // itself still gets two passes (level build + row join-back): at
    // scale, re-scanning a pruned source beats materializing it, and
    // callers holding an expensive `points` can cache it themselves.
    val pre = levels
      .withColumn("_sk_better", min(col("_sk_z")).over(perX))
      .filter(col("_sk_better").isNull || col("_sk_z") < col("_sk_better"))
      .drop("_sk_better")
      .localCheckpoint(true)
    val surviving = pre.as("l1").join(broadcast(pre.as("l2")),
        col("l2._sk_x") >= col("l1._sk_x") && col("l2._sk_y") <= col("l1._sk_y") &&
          col("l2._sk_z") <= col("l1._sk_z") &&
          (col("l2._sk_x") > col("l1._sk_x") || col("l2._sk_y") < col("l1._sk_y") ||
            col("l2._sk_z") < col("l1._sk_z")),
        "left_anti")
      .select(col("_sk_x"), col("_sk_y"), col("_sk_z"))
    points.join(broadcast(surviving),
      points(xCol) === col("_sk_x") && points(yCol) === col("_sk_y") &&
        points(zCol) === col("_sk_z"))
      .drop("_sk_x", "_sk_y", "_sk_z")
  }
}
