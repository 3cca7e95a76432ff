package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Diversify, Graph, Quantiles, Sketches}
import org.apache.spark.sql.functions._

/** Round-16 batch: bounded-hop eccentricity and the double-sweep
  * diameter lower bound (closing the §7.4k graph-diameter candidate),
  * the DDSketch-vs-exact quantile accuracy audit, and MMR
  * diversification of embedding retrieval. Graph oracles replay BFS as
  * recursive CTEs; the MMR oracle unrolls the greedy picks. */
object Round16Queries {

  /** Shared ring graph (ring + every-third-node quadratic chords) —
    * same construction as Round8/Round14. */
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

  /** Leading-`dims` e6-quantized embedding components, as in
    * Similarity.gramMatrix / Round15's PCA oracle. */
  private def compSql(i: Int) =
    s"CAST(floor(CAST(embedding AS DOUBLE[])[${i + 1}] * 1000000 + 0.5) AS BIGINT)"

  private val mmrDims = 8

  /** Unrolled greedy-MMR oracle: candidates = top 8 by integer inner
    * product against the smallest-vec_id query vector; picks 1..4 with
    * margin rel − max(sim to selected), ties to the smaller id. */
  private def mmrSql(k: Int): String = {
    val comps = (0 until mmrDims).map(i => s"${compSql(i)} AS c$i").mkString(", ")
    def ip(x: String, y: String) =
      (0 until mmrDims).map(i => s"$x.c$i * $y.c$i").mkString(" + ")
    val picks = (2 to k).map { r =>
      s"""sel${r - 1} AS MATERIALIZED (${(1 until r).map(i => s"SELECT id FROM s$i").mkString(" UNION ALL ")}),
         |s$r AS MATERIALIZED (
         |  SELECT c.id, c.rel, c.rel - max(s.sim) AS mmr2, CAST($r AS BIGINT) AS pick
         |  FROM cand c JOIN sims s ON s.a = c.id AND s.b IN (SELECT id FROM sel${r - 1})
         |  WHERE c.id NOT IN (SELECT id FROM sel${r - 1})
         |  GROUP BY c.id, c.rel ORDER BY mmr2 DESC, c.id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH cc AS (SELECT vec_id, $comps FROM embeddings),
       |q AS MATERIALIZED (SELECT * FROM cc ORDER BY vec_id LIMIT 1),
       |rel AS (SELECT cc.vec_id AS id, ${ip("cc", "q")} AS rel
       |        FROM cc CROSS JOIN q WHERE cc.vec_id <> q.vec_id),
       |cand AS MATERIALIZED (SELECT id, rel FROM rel ORDER BY rel DESC, id LIMIT 8),
       |cs AS (SELECT c.id, c.rel, ${(0 until mmrDims).map(i => s"cc.c$i").mkString(", ")}
       |       FROM cand c JOIN cc ON cc.vec_id = c.id),
       |sims AS MATERIALIZED (SELECT x.id AS a, y.id AS b, ${ip("x", "y")} AS sim
       |       FROM cs x JOIN cs y ON x.id <> y.id),
       |s1 AS MATERIALIZED (SELECT id, rel, rel AS mmr2, CAST(1 AS BIGINT) AS pick
       |      FROM cand ORDER BY rel DESC, id LIMIT 1),
       |$picks
       |SELECT pick, CAST(id AS BIGINT) AS id, CAST(rel AS BIGINT) AS rel,
       |       CAST(mmr2 AS BIGINT) AS mmr2
       |FROM (${(1 to k).map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")})""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Bounded-hop (≤ 20) eccentricity of the 4 seed nodes over the
    //    directed ring graph: farthest min-hop reach per seed, one
    //    labeled multi-source frontier for all seeds.
    QueryDef("q_eccentricity",
      (s, d) => {
        val (nodes, edges) = graphNodesEdges(s, d)
        Graph.eccentricity(nodes.withColumn("is_seed", col("id") % 25 === 0),
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
          |       CAST(max(dist) AS BIGINT) AS ecc
          |FROM md GROUP BY 1""".stripMargin)
        .replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ── Double-sweep diameter lower bound on the UNDIRECTED ring graph:
    //    BFS from node 0, re-BFS from its farthest reach u (ties →
    //    smallest id); ecc(u) ≥ radius and lower-bounds the diameter.
    QueryDef("q_diameter_sweep",
      (s, d) => {
        val (nodes, edges) = graphNodesEdges(s, d)
        val adj = edges
          .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        Graph.doubleSweepDiameter(nodes.withColumn("is_root", col("id") === 0),
          adj, "is_root", 64)
      },
      Some((graphSql +
        """,
          |adj AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
          |b0 AS (
          |  SELECT CAST(0 AS BIGINT) AS id, 0 AS d
          |  UNION
          |  SELECT adj.v AS id, b0.d + 1 AS d
          |  FROM b0 JOIN adj ON adj.u = b0.id WHERE b0.d < 64),
          |m0 AS (SELECT id, min(d) AS dist FROM b0 GROUP BY 1),
          |far AS MATERIALIZED (SELECT id AS u, dist AS ecc_root FROM m0
          |       ORDER BY dist DESC, id LIMIT 1),
          |b1 AS (
          |  SELECT (SELECT u FROM far) AS id, 0 AS d
          |  UNION
          |  SELECT adj.v AS id, b1.d + 1 AS d
          |  FROM b1 JOIN adj ON adj.u = b1.id WHERE b1.d < 64),
          |m1 AS (SELECT id, min(d) AS dist FROM b1 GROUP BY 1)
          |SELECT (SELECT CAST(u AS BIGINT) FROM far) AS u,
          |       (SELECT CAST(ecc_root AS BIGINT) FROM far) AS ecc_root,
          |       CAST(max(dist) AS BIGINT) AS diameter_lb,
          |       CAST(count(*) AS BIGINT) AS n_reached
          |FROM m1""".stripMargin)
        .replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ── Sketch-accuracy audit: DDSketch-style log-bucket p50/p99
    //    estimates vs the exact rank statistics, per returnflag — the
    //    relative error the sketch PROMISES (~2% at 5-bit mantissa ×
    //    k=57536) measured, not assumed. Sketch: one (g, bucket) count
    //    aggregate; exact: the histogram-selection grouped percentile.
    QueryDef("q_quantile_audit",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_returnflag").as("g"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
        val sk = Sketches.logBucketQuantile(li, "g", "cents", 57536L,
            Seq(500000L, 990000L))
          .withColumn("mid_l", expr("bucket * 57536L + 28768L"))
          .withColumn("est_cents", Sketches.pow2E6Expr("mid_l"))
        val ex = Quantiles.groupedPercentileBands(li, "g", "cents",
          Seq(500000L, 990000L))
        sk.join(ex.select(col("g"), col("p_e6"),
            col("value").as("exact_cents")), Seq("g", "p_e6"))
          .select(col("g"), col("p_e6"), col("bucket"), col("k"), col("n"),
            col("est_cents"), col("exact_cents"),
            expr("abs(est_cents - exact_cents) * 1000000L div exact_cents")
              .as("err_e6"))
      },
      Some {
        val lg = Bm25.log2E6Sql("v")
        val est = Sketches.pow2E6Sql("bucket * 57536 + 28768")
        s"""WITH e AS (SELECT l_returnflag AS g,
           |                 greatest(1, CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS v
           |           FROM lineitem),
           |b AS (SELECT g, v, $lg // 57536 AS bucket FROM e),
           |c AS (SELECT g, bucket, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
           |w AS (SELECT g, bucket, cnt,
           |             CAST(sum(cnt) OVER (PARTITION BY g ORDER BY bucket) AS BIGINT) AS cum,
           |             CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
           |      FROM c),
           |ps AS (SELECT unnest([500000, 990000]) AS p_e6),
           |land AS (SELECT g, CAST(ps.p_e6 AS BIGINT) AS p_e6,
           |                CAST(bucket AS BIGINT) AS bucket,
           |                CAST((n * ps.p_e6 + 999999) // 1000000 AS BIGINT) AS k, n,
           |                CAST($est AS BIGINT) AS est_cents
           |         FROM w JOIN ps ON cum >= (n * ps.p_e6 + 999999) // 1000000
           |                       AND cum - cnt < (n * ps.p_e6 + 999999) // 1000000),
           |ranked AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn
           |           FROM e)
           |SELECT l.g, l.p_e6, l.bucket, l.k, l.n, l.est_cents,
           |       r.v AS exact_cents,
           |       CAST(abs(l.est_cents - r.v) * 1000000 // r.v AS BIGINT) AS err_e6
           |FROM land l JOIN ranked r ON r.g = l.g AND r.rn = l.k""".stripMargin
      }),

    // ── MMR diversification (λ = ½) of the top-8 inner-product
    //    retrieval against the smallest-vec_id query embedding: 4
    //    greedy picks trading relevance against max similarity to the
    //    already-picked — e6-integer vector math end to end.
    QueryDef("q_mmr_diversify",
      (s, d) => {
        val cc = (0 until mmrDims).foldLeft(
          Tables.embeddings(s, d)
            .withColumn("ev", col("embedding").cast("array<double>"))) {
          (acc, i) => acc.withColumn(s"c$i",
            expr(s"CAST(floor(element_at(ev, ${i + 1}) * 1000000 + 0.5) AS BIGINT)"))
        }.select(col("vec_id") +: (0 until mmrDims).map(i => col(s"c$i")): _*)
        val q = cc.orderBy(col("vec_id")).limit(1)
          .select((0 until mmrDims).map(i => col(s"c$i").as(s"q$i")) :+
            col("vec_id").as("q_id"): _*)
        val ip = (0 until mmrDims)
          .map(i => col(s"c$i") * col(s"q$i")).reduce(_ + _)
        val cand = cc.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("rel", ip)
          .orderBy(col("rel").desc, col("vec_id").asc).limit(8)
          .select(col("vec_id").as("id") +: col("rel") +:
            (0 until mmrDims).map(i => col(s"c$i")): _*)
          .localCheckpoint(true)
        val right = cand.select(col("id").as("b") +:
          (0 until mmrDims).map(i => col(s"c$i").as(s"q$i")): _*)
        val sims = cand.crossJoin(right)
          .filter(col("id") =!= col("b"))
          .select(col("id").as("a"), col("b"), ip.as("sim"))
        Diversify.mmr(cand.select(col("id"), col("rel")), sims, 4)
      },
      Some(mmrSql(4)))
  )
}
