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
  * Each round FUSES the two star operators into one groupBy-join pass
  * over the edge list (see [[fusedStar]]):
  *  - large-star: every node points its LARGER neighbors at the minimum of
  *    its neighborhood (incl. itself) — flattens long tails in one hop;
  *  - small-star: every node points its smaller neighbors (and itself) at
  *    the minimum of its LOW neighborhood — collapses local stars onto
  *    their roots.
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

  /** One FUSED star round: large-star and small-star applied to the SAME
    * edge set and emitted from ONE groupBy+join (the §7.4d tagged-union
    * fusion the bench tail asked for). Per node `a` over the
    * bidirectional neighborhood, the aggregate computes BOTH minima the
    * two stars need —
    *   mAll = min(N(a) ∪ {a})        (large-star's re-point target)
    *   mLo  = min(lows(a) ∪ {a})     (small-star's, lows = neighbors < a)
    * — then a single co-partitioned join back emits the union of the two
    * operators' edges: larger neighbors → mAll (large-star), smaller
    * neighbors and self → mLo (small-star). Both operators preserve
    * components and both fix disjoint min-rooted stars, so the union
    * converges to the same fixpoint as the sequential
    * smallStar(largeStar(e)) alternation; the convergence stats + maxIter
    * guard in [[connectedComponents]] pin it per run.
    *
    * Plan shape: ONE repartition per round (the groupBy and the join
    * back both reuse it) + the loop's distinct — 2 exchanges/round vs the
    * sequential form's 3, and one groupBy+join pair instead of two. Every
    * emitted edge is strictly decreasing (mAll ≤ a < b on the large leg;
    * mLo ≤ b < a and mLo < a on the small legs), so the Σ(endpoint)
    * convergence monotone still holds. */
  private[ops] def fusedStar(edges: DataFrame): DataFrame = {
    val bi = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .repartition(loopPartitions, col("a"))
    val m = bi.groupBy(col("a")).agg(
      least(min(col("b")), col("a")).as("mAll"),
      least(min(when(col("b") < col("a"), col("b"))), col("a")).as("mLo"))
    // Both star legs come out of ONE conditional projection over ONE
    // join — NOT a union of filtered branches. With per-leg filters the
    // optimizer pushes each filter below the neighborhood repartition,
    // the three exchange subtrees stop being canonically equal, and the
    // "shared" shuffle silently becomes three (caught by the round gate).
    val pairs = bi.join(m, "a").select(col("b").as("a"),
      when(col("b") > col("a"), col("mAll")).otherwise(col("mLo")).as("b"))
    val self = m.select(col("a"), col("mLo").as("b"))
    pairs.unionByName(self).filter(col("a") =!= col("b"))
  }

  /** Instrumentation (spec/bench only): cumulative round count and
    * per-round planned exchange count across every
    * [[connectedComponents]] call in this JVM. Total rounds are
    * data-dependent (that's why the CC-family queries are exempt from
    * PlanShapeSpec's absolute gates); these counters let the round-gate
    * spec assert the ROUND-NORMALIZED shape instead — exchanges ≤
    * k·rounds — so a regression inside the loop body still fails CI. */
  val roundsCounter = new java.util.concurrent.atomic.AtomicLong
  val roundExchangesCounter = new java.util.concurrent.atomic.AtomicLong

  /** DISTINCT shuffles a plan will actually run: canonicalized
    * ShuffleExchangeLike nodes, deduped. The fused round's plan TEXT
    * repeats the neighborhood-repartition subtree under all three union
    * legs, but AQE's stage cache (keyed on the canonicalized plan)
    * materializes identical exchanges once — counting raw occurrences
    * would triple-count what executes as one shuffle. */
  private def distinctPlannedExchanges(df: DataFrame): Long =
    df.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        e.canonicalized
    }.distinct.size.toLong

  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 30): DataFrame = {
    // Lazy localCheckpoint + the stats aggregate as its materializing
    // action: ONE job per round does the two star passes, truncates
    // lineage, and reads off the convergence stats — vs three jobs/round
    // with an eager checkpoint followed by a separate aggregate (measured
    // ~2x on the bench chain graph, where per-round fixed job overhead
    // dominates at test scale).
    def checkpointWithStats(df: DataFrame): (DataFrame, (Long, java.math.BigDecimal)) = {
      val cp = graft.PlanTap.tap(df, "starcc.round_pre_checkpoint")
        .localCheckpoint(false)
      val r = cp.agg(count(lit(1)),
        sum((col("a") + col("b")).cast("decimal(38,0)"))).head()
      (cp, (r.getLong(0), r.getDecimal(1)))
    }
    var (e, prev) = checkpointWithStats(
      edges.select(col("a"), col("b")).filter(col("a") =!= col("b")).distinct())
    var converged = prev._1 == 0
    var iter = 0
    while (!converged && iter < maxIter) {
      val round = fusedStar(e).distinct()
      roundsCounter.incrementAndGet()
      roundExchangesCounter.addAndGet(distinctPlannedExchanges(round))
      val (ne, cur) = checkpointWithStats(round)
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
      val l = probe.labels.localCheckpoint(false)
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

  /** Incremental CC under EDGE INSERTS: given the existing labeling
    * `labels` (id, cluster_id — roots are component minima, as every
    * producer in this file emits) and a batch of `newEdges`, recompute
    * WITHOUT touching the original edge set. Each existing cluster is a
    * super-node; each new edge collapses to an edge between its
    * endpoints' cluster roots; star-CC runs on THAT graph — whose size
    * is O(|delta|), not O(|V|+|E|) — and the resulting root merges map
    * back over the labeling with one broadcast-friendly join. Exact:
    * merging clusters by any path through new edges is precisely
    * connectivity on the super-node graph, and the new root is the min
    * of the merged roots = the global component min. At 100 TB this is
    * the difference between re-clustering the corpus nightly and
    * absorbing a crawl increment in minutes. */
  def incrementalConnectedComponents(labels: DataFrame,
                                     newEdges: DataFrame,
                                     maxIter: Int = 30): DataFrame = {
    val la = labels.select(col("id").as("a"), col("cluster_id").as("ca"))
    val lb = labels.select(col("id").as("b"), col("cluster_id").as("cb"))
    val ce = newEdges.select(col("a"), col("b"))
      .join(la, Seq("a")).join(lb, Seq("b"))
      .select(col("ca").as("a"), col("cb").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val cn = ce.select(explode(array(col("a"), col("b"))).as("id")).distinct()
    val merged = connectedComponents(cn, ce, maxIter)
      .select(col("id").as("cluster_id"), col("cluster_id").as("new_root"))
    labels.join(merged, Seq("cluster_id"), "left")
      .select(col("id"),
        coalesce(col("new_root"), col("cluster_id")).as("cluster_id"))
  }

  /** Incremental CC under EDGE DELETES — the hard direction: a removal
    * can SPLIT a component, which no super-node shortcut can detect, so
    * the affected clusters must re-run CC on their own subgraph. The
    * point is the blast radius: `labels` + `edges` (current, pre-delete)
    * + `removed` → only clusters CONTAINING a removed edge rebuild
    * (their nodes + surviving internal edges re-cluster from scratch,
    * with labels re-minimized per new sub-component); every untouched
    * cluster keeps its label. The edge set is scanned ONCE (the
    * surviving-filter + membership joins — cheap linear passes); the
    * expensive part, iterative CC rounds, runs only on the affected
    * subgraph. Deletes are usually rare and local (a retracted crawl,
    * a takedown), so this is the difference between a surgical fix and
    * a nightly re-cluster. */
  def incrementalDeleteConnectedComponents(labels: DataFrame,
                                           edges: DataFrame,
                                           removed: DataFrame,
                                           maxIter: Int = 30): DataFrame = {
    val norm = (df: DataFrame) => df.select(
      least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val surviving = norm(edges).join(norm(removed), Seq("a", "b"), "left_anti")
    // blast radius: every cluster owning a removed-edge endpoint
    val hit = removed.select(explode(array(col("a"), col("b"))).as("id"))
      .distinct()
      .join(labels, "id")
      .select(col("cluster_id")).distinct()
    val affectedNodes = labels.join(hit, "cluster_id")
      .select(col("id"), col("cluster_id"))
    // surviving edges INTERNAL to affected clusters (both endpoints
    // affected — an edge never crosses clusters by CC invariant)
    val aIds = affectedNodes.select(col("id"))
    val subEdges = surviving
      .join(aIds.withColumnRenamed("id", "a"), Seq("a"))
      .join(aIds.withColumnRenamed("id", "b"), Seq("b"))
    val rebuilt = connectedComponents(aIds, subEdges, maxIter)
    // the using-column join hoists cluster_id first — restore the
    // (id, cluster_id) contract every CC producer in this file keeps
    labels.join(hit, Seq("cluster_id"), "left_anti")
      .select(col("id"), col("cluster_id"))
      .unionByName(rebuilt)
  }
}
