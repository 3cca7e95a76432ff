package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-density clustering (DBSCAN-lite): snap points to an integer
  * grid, keep cells at least 2× the mean occupancy, connect dense cells
  * that are 8-neighbors, and label the connected components. The
  * classic two-phase scalable DBSCAN shape — the expensive
  * neighborhood query becomes an EQUI-join on offset cell coordinates
  * (never a distance cross-join), and the transitive closure runs on
  * the dense-cell graph (≪ points), via [[StarComponents]].
  */
object GridCluster {

  /** Cluster dense grid cells of `pts` (integer cell coords `cxCol`,
    * `cyCol`). Density threshold is RELATIVE — n ≥ (2·points) div
    * occupied-cells — so the query is scale-free across SFs. The
    * 8-neighbor adjacency explodes 3×3 offsets and equi-joins on the
    * shifted coordinates; components get min-cell-key labels. Output:
    * (cluster_id, n_cells, n_points) — cluster_id = min (cx·1000 + cy)
    * over the component (valid for cy < 1000).
    *
    * Scale: one cell-count aggregate (map-side combinable), a
    * broadcast one-row threshold, a 9×dense-cells equi-join, and the
    * O(log n) star-contraction rounds — nothing touches raw points
    * twice. */
  def denseCellClusters(pts: DataFrame, cxCol: String,
                        cyCol: String): DataFrame = {
    val cells = pts.groupBy(col(cxCol).as("cx"), col(cyCol).as("cy"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // occupied-cell axis: small; ONE raw scan
    val tot = cells.agg(sum(col("n")).as("pts_all"), count(lit(1)).as("nc"))
    val dense = cells.crossJoin(broadcast(tot))
      .filter(col("n") >= expr("(2 * pts_all) div nc"))
      .select(col("cx"), col("cy"), col("n"),
        (col("cx") * 1000L + col("cy")).as("k"))
      .localCheckpoint(false)
    val neigh = dense.select(col("k").as("ka"), col("cx"), col("cy"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("ka"), (col("cx") + col("dx")).as("nx"),
        (col("cy") + col("dy")).as("ny"))
    val edges = neigh
      .join(dense.select(col("k").as("kb"), col("cx").as("nx"),
        col("cy").as("ny")), Seq("nx", "ny"))
      .filter(col("ka") < col("kb"))
      .select(col("ka").as("a"), col("kb").as("b"))
    StarComponents.connectedComponents(dense.select(col("k").as("id")), edges)
      .join(dense.withColumnRenamed("k", "id"), Seq("id"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"))
  }
}
