package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Round-12 extension batch. Headline: bridge (cut-edge) detection —
  * the graph item open since round 10 — by the tree-XOR technique over
  * the unique MSF, graded against a fully independent path-covering
  * oracle (root the forest with a recursive CTE, then a forest edge is
  * a bridge iff NO non-forest edge's endpoints straddle it, decided by
  * ancestor-closure membership). Every oracle is plain DuckDB SQL over
  * the shared parquet. */
object Round12Queries {

  /** Dedicated test graph WITH bridges (the shared ring graph is
    * 2-edge-connected, so it has none): 10 ten-node chains
    * (ring broken at id%10=9) plus chords — (c, c+4) on every chain,
    * (c+4, c+9) on even chains only. Odd chains therefore keep five
    * uncovered chain edges each (25 bridges total); even chains are
    * fully cycle-covered. */
  private val bridgeGraphSql =
    """nodes AS MATERIALIZED (SELECT DISTINCT p_partkey % 100 AS id FROM part),
      |e AS MATERIALIZED (
      |  SELECT id AS src, id + 1 AS dst FROM nodes WHERE id % 10 <> 9
      |  UNION SELECT id, id + 4 FROM nodes WHERE id % 10 = 0
      |  UNION SELECT id, id + 5 FROM nodes WHERE id % 10 = 4 AND (id // 10) % 2 = 0),
      |und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |     FROM e WHERE src <> dst),
      |we AS MATERIALIZED (SELECT a, b, a * 1000 + b AS w FROM und)""".stripMargin

  private def bridgeGraph(s: org.apache.spark.sql.SparkSession, d: String) = {
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
    (nodes, und.withColumn("w", col("a") * 1000 + col("b")))
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Bridges via tree-XOR leaf peeling over the unique MSF. The
    //    oracle shares only the graph + the cut-property forest
    //    reconstruction (proven independently by q_msf) and then uses a
    //    COMPLETELY different bridge criterion: root each tree
    //    (recursive BFS walk), build the ancestor-or-self closure, and
    //    count for each tree edge the non-forest edges whose endpoints
    //    lie on opposite sides (exactly one endpoint has the edge's
    //    child as ancestor-or-self). Bridge ⟺ count = 0.
    QueryDef("q_bridges",
      (s, d) => {
        val (nodes, edges) = bridgeGraph(s, d)
        Graph.bridges(nodes, edges, 15)
      },
      Some {
        val head = "WITH RECURSIVE\n" + bridgeGraphSql +
          """,
            |d0 AS MATERIALIZED (SELECT a AS u, b AS v, w AS d FROM we
            |      UNION ALL SELECT b, a, w FROM we)""".stripMargin
        val rounds = (1 to 4).map { i =>
          s"""d$i AS MATERIALIZED (SELECT u, v, min(d) AS d FROM (
             |      SELECT u, v, d FROM d${i - 1}
             |      UNION ALL
             |      SELECT x.u, y.v, greatest(x.d, y.d) AS d
             |      FROM d${i - 1} x JOIN d${i - 1} y ON x.v = y.u AND x.u <> y.v)
             |      GROUP BY u, v)""".stripMargin
        }
        (head +: rounds.map("," + _)).mkString("\n") +
          """,
            |forest AS MATERIALIZED (SELECT we.a, we.b FROM we
            |      JOIN d4 ON d4.u = we.a AND d4.v = we.b WHERE d4.d = we.w),
            |nf AS MATERIALIZED (SELECT u.a, u.b FROM und u
            |      LEFT JOIN forest f ON f.a = u.a AND f.b = u.b WHERE f.a IS NULL),
            |fadj AS MATERIALIZED (SELECT a AS u, b AS v FROM forest
            |      UNION ALL SELECT b, a FROM forest),
            |root AS MATERIALIZED (SELECT n.id AS v, least(n.id, coalesce(min(d4.v), n.id)) AS r
            |      FROM nodes n LEFT JOIN d4 ON d4.u = n.id GROUP BY n.id),
            |walk AS (
            |  SELECT v, CAST(NULL AS BIGINT) AS parent FROM root WHERE r = v
            |  UNION ALL
            |  SELECT fadj.v, w.v FROM walk w JOIN fadj ON fadj.u = w.v
            |  WHERE w.parent IS NULL OR fadj.v <> w.parent),
            |anc AS (
            |  SELECT v AS dn, v AS an FROM walk
            |  UNION ALL
            |  SELECT anc.dn, w.parent FROM anc JOIN walk w ON w.v = anc.an
            |  WHERE w.parent IS NOT NULL),
            |straddle AS (
            |  SELECT t.x, t.y, t.an AS c FROM (
            |    SELECT nf.a AS x, nf.b AS y, anc.an FROM nf JOIN anc ON anc.dn = nf.a
            |    UNION ALL
            |    SELECT nf.a, nf.b, anc.an FROM nf JOIN anc ON anc.dn = nf.b) t
            |  GROUP BY t.x, t.y, t.an HAVING count(*) = 1),
            |cov AS MATERIALIZED (SELECT c, CAST(count(*) AS BIGINT) AS k
            |      FROM straddle GROUP BY c),
            |te AS MATERIALIZED (SELECT v AS c, parent AS p FROM walk WHERE parent IS NOT NULL)
            |SELECT CAST(least(te.c, te.p) AS BIGINT) AS a,
            |       CAST(greatest(te.c, te.p) AS BIGINT) AS b,
            |       coalesce(cov.k, 0) = 0 AS is_bridge
            |FROM te LEFT JOIN cov ON cov.c = te.c""".stripMargin
      }))
}
