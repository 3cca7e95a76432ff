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
  /** Arbitrary-dimension skyline, ALL dimensions minimized (negate a
    * column at the call site to maximize it — integer negation is exact).
    * Same reduce-then-verify shape as [[skyline3D]], generalized through
    * an array column:
    *
    *  1. Level reduction: per prefix (d₁..d_{k−1}), keep min(d_k) — one
    *     groupBy shuffle; levels are bounded by the prefix domain.
    *  2. Fixed-prefix sweep: within levels sharing d₁..d_{k−2} (every dim
    *     but the last two), dominance needs no strict coordinate there,
    *     so a strict-prefix running min over (d_{k−1} asc → min d_k)
    *     kills most levels before anything quadratic — the exact
    *     per-x sweep of [[skyline3D]], generalized to the full prefix.
    *  3. Verification: broadcast LEFT ANTI self-join where dominance is a
    *     fold over the dim array — `q` dominates `p` iff ∀i q[i] ≤ p[i]
    *     and ∃i q[i] < p[i] — via `zip_with` + `forall`/`exists` (codegen
    *     array ops, no UDF). Quadratic only on the twice-reduced levels.
    *
    * Rows come back by equi-joining the input on the full dim vector, so
    * coordinate-tied duplicates survive together. Callers bucket
    * continuous dims first, exactly as in 2-D/3-D.
    */
  def skylineND(points: DataFrame, dimCols: Seq[String]): DataFrame = {
    require(dimCols.size >= 2, "need at least 2 dimensions")
    val k = dimCols.size
    val dims = array(dimCols.map(c => col(c).cast("long")): _*)
    val pts = points.withColumn("_sk_dims", dims)
    val prefixCols = (0 until k - 1).map(i => col("_sk_dims")(i).as(s"_sk_p$i"))
    val levels = pts
      .groupBy(prefixCols: _*)
      .agg(min(col("_sk_dims")(k - 1)).as("_sk_last"))
      .select(array((0 until k - 1).map(i => col(s"_sk_p$i")) :+ col("_sk_last"): _*)
        .as("_sk_dims"))
    val sweepPrefix =
      if (k == 2) Seq(lit(0)) // single global sweep — degenerates to 2-D
      else (0 until k - 2).map(i => col("_sk_dims")(i))
    val perFirst = Window.partitionBy(sweepPrefix: _*)
      .orderBy(col("_sk_dims")(k - 2).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = levels
      .withColumn("_sk_better", min(col("_sk_dims")(k - 1)).over(perFirst))
      .filter(col("_sk_better").isNull || col("_sk_dims")(k - 1) < col("_sk_better"))
      .drop("_sk_better")
      .localCheckpoint(false)
    val dominated = expr(
      """forall(zip_with(_sk_q, _sk_p, (q, p) -> q <= p), x -> x)
        | AND exists(zip_with(_sk_q, _sk_p, (q, p) -> q < p), x -> x)""".stripMargin)
    val surviving = pre.select(col("_sk_dims").as("_sk_p"))
      .join(broadcast(pre.select(col("_sk_dims").as("_sk_q"))), dominated, "left_anti")
    pts.join(broadcast(surviving), pts("_sk_dims") === col("_sk_p"))
      .drop("_sk_dims", "_sk_p")
  }

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
      .localCheckpoint(false)
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
