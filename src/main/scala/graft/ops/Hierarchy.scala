package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bill-of-materials-style hierarchy rollup — the classic recursive
  * workload Spark SQL lacks (no WITH RECURSIVE): effective per-unit
  * quantities down an assembly DAG, i.e. the PRODUCT of edge quantities
  * along the root path. BFS-style level iteration like
  * [[Graph.bfsLevels]], but the frontier carries an accumulated product
  * instead of a hop count — each level is one join + one aggregate
  * (min-product tie-break keeps DAG diamonds deterministic), with
  * lineage truncated per round. Rounds = hierarchy depth (log-bounded
  * for balanced assemblies), never data size. */
object Hierarchy {

  /** Effective quantity of every node reachable from the root(s):
    * eff(root) = 1, eff(child) = eff(parent) · qty(parent→child); on
    * DAG diamonds (several parents) the MINIMUM product wins (a
    * deterministic, associative choice — sum-over-paths is the other
    * common convention; min keeps the integer bounded). Edges:
    * (src, dst, qty). Output: (id, depth, eff_qty). */
  def pathProductRollup(nodes: DataFrame, edges: DataFrame, rootCol: String,
                        maxDepth: Int): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 32, "maxDepth must be in [1, 32]")
    val e = edges.select(col("src"), col("dst"), col("qty"))
      .distinct().localCheckpoint(false)
    var acc = nodes.filter(col(rootCol))
      .select(col("id"), lit(0L).as("depth"), lit(1L).as("eff_qty"))
      .localCheckpoint(false)
    var frontier = acc
    var depth = 0
    var done = false
    while (depth < maxDepth && !done) {
      depth += 1
      val next = frontier.join(e, frontier("id") === e("src"))
        .select(e("dst").as("id"), (col("eff_qty") * col("qty")).as("p"))
        .groupBy(col("id")).agg(min(col("p")).as("eff_qty"))
        .join(acc.select(col("id")), Seq("id"), "left_anti")
        .withColumn("depth", lit(depth.toLong))
        .select(col("id"), col("depth"), col("eff_qty"))
        .localCheckpoint(false)
      if (next.count() == 0L) done = true
      else {
        acc = acc.unionByName(next).localCheckpoint(false)
        frontier = next
      }
    }
    acc
  }
}
