package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Round-14 graph batch: multi-source closeness centrality, the
  * two-colorability (bipartiteness) certificate, edge-neighborhood
  * Jaccard (tie strength), and the degree histogram. Oracles replay
  * BFS as recursive CTEs (the q_bfs_levels precedent) over the shared
  * deterministic test graphs. */
object Round14Queries {

  /** Shared ring graph (ring + every-third-node quadratic chords) —
    * same construction as Round8Queries. */
  private val graphSql =
    """WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
      |e AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes
      |      UNION
      |      SELECT id AS src, (id * id + 7) % 100 AS dst FROM nodes WHERE id % 3 = 0)""".stripMargin

  private def graphNodesEdges(s: org.apache.spark.sql.SparkSession, d: String) = {
    val nodes = Tables.part(s, d)
      .select((col("p_partkey") % 100).as("id")).distinct()
    val edges = nodes
      .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"))
      .unionByName(nodes.filter(col("id") % 3 === 0)
        .select(col("id").as("src"), ((col("id") * col("id") + 7) % 100).as("dst")))
      .distinct()
    (nodes, edges)
  }

  /** The chain-with-chords graph of Round12Queries (10 ten-node chains;
    * chords (c, c+4) everywhere and (c+4, c+9) on even chains). Unlike
    * the ring graph — whose every cycle is EVEN (ring steps and chords
    * both flip id parity) — the (c, c+4) chord closes a 5-cycle, so
    * this graph certifies the NON-bipartite branch. */
  private val chainGraphSql =
    """nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
      |e AS (
      |  SELECT id AS src, id + 1 AS dst FROM nodes WHERE id % 10 <> 9
      |  UNION SELECT id, id + 4 FROM nodes WHERE id % 10 = 0
      |  UNION SELECT id, id + 5 FROM nodes WHERE id % 10 = 4 AND (id // 10) % 2 = 0),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM e WHERE src <> dst)""".stripMargin

  private def chainGraph(s: org.apache.spark.sql.SparkSession, d: String) = {
    val nodes = Tables.part(s, d)
      .select((col("p_partkey") % 100).as("id")).distinct()
    val chain = nodes.filter(col("id") % 10 =!= 9)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val c1 = nodes.filter(col("id") % 10 === 0)
      .select(col("id").as("src"), (col("id") + 4).as("dst"))
    val c2 = nodes.filter(col("id") % 10 === 4 && expr("(id div 10) % 2") === 0)
      .select(col("id").as("src"), (col("id") + 5).as("dst"))
    val und = chain.unionByName(c1).unionByName(c2)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    (nodes, und)
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Bounded-hop (≤ 20) closeness centrality of the 4 seed nodes,
    //    all seeds carried by ONE labeled frontier loop.
    QueryDef("q_closeness",
      (s, d) => {
        val (nodes, edges) = graphNodesEdges(s, d)
        Graph.closeness(nodes.withColumn("is_seed", col("id") % 25 === 0),
          edges, "is_seed", 20)
      },
      Some((graphSql +
        """,
          |bfs AS (
          |  SELECT id AS seed, id, 0 AS d FROM nodes WHERE id % 25 = 0
          |  UNION
          |  SELECT bfs.seed, e.dst AS id, bfs.d + 1 AS d
          |  FROM bfs JOIN e ON e.src = bfs.id WHERE bfs.d < 20),
          |md AS (SELECT seed, id, min(d) AS dist FROM bfs GROUP BY 1, 2)
          |SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
          |       CAST(sum(dist) AS BIGINT) AS sum_dist,
          |       CAST(CASE WHEN sum(dist) = 0 THEN NULL
          |            ELSE (count(*) - 1) * 1000000 // sum(dist)
          |            END AS BIGINT) AS closeness_e6
          |FROM md GROUP BY 1""".stripMargin)
        .replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ── Bipartiteness certificate on the chain graph (whose 5-cycles
    //    make it NON-bipartite, unlike the all-even-cycle ring): BFS
    //    parity coloring from node 0, then count same-color edges in
    //    the root's component.
    QueryDef("q_bipartite",
      (s, d) => {
        val (nodes, und) = chainGraph(s, d)
        Graph.bipartiteCheck(nodes.withColumn("is_root", col("id") === 0),
          und, "is_root", 64)
      },
      Some(("WITH RECURSIVE " + chainGraphSql +
        """,
          |adj AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
          |bfs AS (
          |  SELECT id, 0 AS d FROM nodes WHERE id = 0
          |  UNION
          |  SELECT adj.v AS id, bfs.d + 1 AS d
          |  FROM bfs JOIN adj ON adj.u = bfs.id WHERE bfs.d < 64),
          |md AS (SELECT id, min(d) % 2 AS c FROM bfs GROUP BY 1),
          |j AS (SELECT und.a, und.b, ca.c AS ca, cb.c AS cb
          |      FROM und JOIN md ca ON ca.id = und.a
          |               JOIN md cb ON cb.id = und.b)
          |SELECT (SELECT CAST(count(*) AS BIGINT) FROM md) AS n_reached,
          |       CAST(count(*) AS BIGINT) AS n_edges_reached,
          |       CAST(count(*) FILTER (WHERE ca = cb) AS BIGINT) AS n_violating,
          |       count(*) FILTER (WHERE ca = cb) = 0 AS is_bipartite
          |FROM j""".stripMargin))),

    // ── Edge embeddedness: neighborhood Jaccard of each adjacent pair
    //    on the undirected ring graph — the tie-strength score.
    QueryDef("q_edge_jaccard",
      (s, d) => {
        val (_, edges) = graphNodesEdges(s, d)
        Graph.edgeJaccard(edges.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b")))
      },
      Some(graphSql +
        """,
          |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |        FROM e WHERE src <> dst),
          |adj AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
          |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
          |common AS (SELECT l.v AS x, r.v AS y, CAST(count(*) AS BIGINT) AS c
          |           FROM adj l JOIN adj r ON l.u = r.u AND l.v < r.v
          |           GROUP BY 1, 2),
          |j AS (SELECT und.a, und.b, coalesce(common.c, 0) AS n_common
          |      FROM und LEFT JOIN common ON common.x = und.a AND common.y = und.b)
          |SELECT j.a, j.b, j.n_common,
          |       CAST(j.n_common * 1000000 // (da.d + db.d - j.n_common) AS BIGINT) AS jac_e6
          |FROM j JOIN deg da ON da.u = j.a JOIN deg db ON db.u = j.b""".stripMargin)),

    // ── Degree histogram of the undirected ring graph — the first plot
    //    of any graph audit; one degree aggregate + one histogram
    //    aggregate, both map-side combinable.
    QueryDef("q_degree_hist",
      (s, d) => {
        val (_, edges) = graphNodesEdges(s, d)
        val und = edges.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct().localCheckpoint(true) // edge axis: tiny; ONE raw scan
        und.select(col("a").as("u")).unionByName(und.select(col("b").as("u")))
          .groupBy(col("u")).agg(count(lit(1)).as("degree"))
          .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      },
      Some(graphSql +
        """,
          |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          |        FROM e WHERE src <> dst),
          |adj AS (SELECT a AS u FROM und UNION ALL SELECT b FROM und),
          |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree FROM adj GROUP BY 1)
          |SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
          |FROM deg GROUP BY 1""".stripMargin))
  )
}
