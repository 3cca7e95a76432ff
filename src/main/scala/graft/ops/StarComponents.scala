package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via alternating large-star / small-star rounds
  * (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
  * O(log n)-round alternative to [[Dedup.connectedComponents]]'s min-label
  * propagation, whose round count equals the graph DIAMETER. Near-dup
  * clusters are shallow so min-label wins there; long chains (session
  * graphs, reference chains, linked records) have diameter ≫ 20 and need
  * this variant — a 500-node chain converges in ~6 star rounds vs 500
  * label rounds.
  *
  * Each round is two groupBy-join passes over the edge list:
  *  - large-star: every node points its LARGER neighbors at the minimum of
  *    its neighborhood (incl. itself) — flattens long tails in one hop;
  *  - small-star: every node points its smaller-or-equal neighbors (and
  *    itself) at that minimum — collapses local stars onto their roots.
  * Both emit strictly-decreasing parent links, so Σ(parent) is monotone
  * non-increasing and serves as the convergence check (one tiny aggregate
  * per round — the same trick as min-label's label-sum; no
  * join-and-compare). Each round's edge set is eagerly local-checkpointed
  * to cut lineage (plan depth would double per round otherwise; on a
  * cluster, swap for `checkpoint()` against durable storage).
  *
  * Scale shape per round: one bidirectional explode (map-side), one
  * partial-aggregable min per node, one co-partitioned join back — all
  * shuffle on the node id, no driver-side state beyond the convergence
  * sum. Skewed hubs (one node with millions of neighbors) partial-aggregate
  * map-side in the min step; the join fan-out is bounded by the node's
  * degree, which large-star halves each round.
  *
  * @param nodes single column `id`; @param edges columns `a`, `b`.
  * @return (id, cluster_id) with cluster_id = min node id in component —
  *         identical labeling contract to [[Dedup.connectedComponents]].
  */
object StarComponents {

  /** Loop shuffle width: the per-round frames are edge lists that SHRINK
    * toward star form, so a narrow fixed width beats the session's batch
    * width — per-partition task overhead × exchanges/round dominates at
    * the small end (same finding as the stream state-store width,
    * BASELINE.md). Each star pass repartitions ONCE by its grouping key;
    * the groupBy and the join back both reuse that partitioning, so a
    * pass costs one exchange instead of three. */
  private val loopPartitions = 8

  /** One large-star round: for each node, larger neighbors re-point at the
    * neighborhood minimum. Input/output: undirected edge list (a, b);
    * output may carry duplicates — deduped once per round in the driver
    * loop. */
  private[ops] def largeStar(edges: DataFrame): DataFrame = {
    val bi = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .repartition(loopPartitions, col("a"))
    val m = bi.groupBy(col("a")).agg(least(min(col("b")), col("a")).as("m"))
    bi.join(m, "a").filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .filter(col("a") =!= col("b"))
  }

  /** One small-star round: orient edges high→low, then each high node and
    * its low neighbors all re-point at the neighborhood minimum. */
  private[ops] def smallStar(edges: DataFrame): DataFrame = {
    val hiLo = edges.select(
      greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      .repartition(loopPartitions, col("a"))
    val m = hiLo.groupBy(col("a")).agg(least(min(col("b")), col("a")).as("m"))
    val lows = hiLo.join(m, "a").select(col("b").as("a"), col("m").as("b"))
    val his = m.select(col("a"), col("m").as("b"))
    lows.unionByName(his).filter(col("a") =!= col("b"))
  }

  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 30): DataFrame = {
    // Lazy localCheckpoint + the stats aggregate as its materializing
    // action: ONE job per round does the two star passes, truncates
    // lineage, and reads off the convergence stats — vs three jobs/round
    // with an eager checkpoint followed by a separate aggregate (measured
    // ~2x on the bench chain graph, where per-round fixed job overhead
    // dominates at test scale).
    def checkpointWithStats(df: DataFrame): (DataFrame, (Long, java.math.BigDecimal)) = {
      val cp = df.localCheckpoint(false)
      val r = cp.agg(count(lit(1)),
        sum((col("a") + col("b")).cast("decimal(38,0)"))).head()
      (cp, (r.getLong(0), r.getDecimal(1)))
    }
    var (e, prev) = checkpointWithStats(
      edges.select(col("a"), col("b")).filter(col("a") =!= col("b")).distinct())
    var converged = prev._1 == 0
    var iter = 0
    while (!converged && iter < maxIter) {
      val (ne, cur) = checkpointWithStats(smallStar(largeStar(e)).distinct())
      e = ne
      // Fixpoint: both passes emit the same (child→root) star two rounds
      // running — count and endpoint-sum together pin the edge multiset.
      converged = cur == prev
      prev = cur
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"StarComponents exited at maxIter=$maxIter without a stable edge set " +
          "— labels may be non-final. Raise maxIter (rounds needed is " +
          "O(log n), so this indicates a pathological input).")
    // Star edges are (node → component root); roots and isolated nodes
    // label themselves.
    nodes.select(col("id"))
      .join(e.select(col("a").as("id"), col("b").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster_id"))
  }

  /** Adaptive facade: min-label propagation first (cheapest per round —
    * one join + one min, and near-dup graphs are almost always shallow),
    * falling back to the star algorithm on the COLLAPSED graph when the
    * probe budget runs out. The fallback operates on label-space edges
    * (each partially-propagated label already names a ≤`probeRounds`-hop
    * neighborhood), so the star phase starts from a graph whose diameter
    * is already divided by the probe depth — the two algorithms compose
    * rather than restart. Callers get one entry point that is optimal on
    * shallow graphs and never hits min-label's unbounded-diameter trap.
    */
  def auto(nodes: DataFrame, edges: DataFrame, probeRounds: Int = 8,
           maxStarIter: Int = 30): DataFrame = {
    val probe = Dedup.connectedComponentsProbe(nodes, edges, probeRounds)
    if (probe.converged) probe.labels.withColumnRenamed("label", "cluster_id")
    else {
      val l = probe.labels.localCheckpoint(true)
      // collapse: original edges mapped through partial labels
      val collapsed = edges
        .join(l.select(col("id").as("a"), col("label").as("la")), Seq("a"))
        .join(l.select(col("id").as("b"), col("label").as("lb")), Seq("b"))
        .select(col("la").as("a"), col("lb").as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val roots = connectedComponents(
        l.select(col("label").as("id")).distinct(), collapsed, maxStarIter)
      l.join(roots.withColumnRenamed("id", "label"), Seq("label"))
        .select(col("id"), col("cluster_id"))
    }
  }
}
