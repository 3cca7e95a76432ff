package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Behavior, Graph}
import org.apache.spark.sql.functions._

/** Round-52 batch: SALSA authority scores in closed form (the
  * degree-formula cousin of q_hits — no power iteration), the rich-club
  * coefficient curve (where the high-degree elite tightens — the
  * localized companion of q_assortativity), global transitivity (the
  * wedge-weighted companion of q_local_clustering), and daily-path edit
  * distance drift (routine change as a string metric, closing the
  * q_entropy_rate predictability family).
  */
object Round52Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── SALSA over the sparse customer→part purchase slice
    //    (every-97th order): component-weighted in-degree shares,
    //    components via star contraction on disjointly-encoded ids.
    QueryDef("q_salsa",
      (s, d) => Graph.salsa(
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") % 97 === 0)
          .join(Tables.orders(s, d)
            .filter(col("o_orderkey") % 97 === 0)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("hub"), col("l_partkey").as("auth"))),
      Some("""WITH RECURSIVE ed AS (
             |  SELECT DISTINCT o_custkey AS hub, l_partkey AS auth
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_orderkey % 97 = 0),
             |enc AS (SELECT hub * 2 AS a, auth * 2 + 1 AS b FROM ed),
             |ids AS (SELECT a AS id FROM enc UNION SELECT b FROM enc),
             |e2 AS (SELECT a, b FROM enc UNION ALL SELECT b, a FROM enc),
             |reach(id, label) AS (
             |  SELECT id, id FROM ids
             |  UNION
             |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id),
             |cc AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id),
             |ac AS (SELECT (id - 1) // 2 AS auth, cluster_id FROM cc
             |       WHERE id % 2 = 1),
             |din AS (SELECT auth, CAST(count(*) AS BIGINT) AS din
             |        FROM ed GROUP BY 1),
             |j AS (SELECT auth, din, cluster_id FROM din JOIN ac USING (auth)),
             |comp AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS comp_sz,
             |                CAST(sum(din) AS BIGINT) AS s_c
             |         FROM j GROUP BY 1),
             |tot AS (SELECT CAST(sum(comp_sz) AS BIGINT) AS a_tot FROM comp)
             |SELECT auth, din, comp_sz,
             |       CAST((comp_sz * din * 1000000000) // (a_tot * s_c)
             |            AS BIGINT) AS score_e9
             |FROM j JOIN comp USING (cluster_id) CROSS JOIN tot""".stripMargin)),

    // ── Rich-club curve at k ∈ {2, 3, 4} over the quadratic-chord ring
    //    (ring degree 2, chord endpoints 3–5 — the sweep crosses the
    //    elite boundary).
    QueryDef("q_rich_club",
      (s, d) => {
        val nodes = Tables.customer(s, d)
          .select((col("c_custkey") % 100).as("id")).distinct()
        val edges = nodes.select(col("id").as("a"), ((col("id") + 1) % 100).as("b"))
          .unionByName(nodes.filter(col("id") % 3 === 0)
            .select(col("id").as("a"),
              ((col("id") * col("id") + 7) % 100).as("b")))
        Graph.richClub(edges, Seq(2, 3, 4))
      },
      Some("""WITH nodes AS (SELECT DISTINCT c_custkey % 100 AS id FROM customer),
             |raw AS (SELECT id AS a, (id + 1) % 100 AS b FROM nodes
             |        UNION ALL SELECT id, (id * id + 7) % 100 FROM nodes
             |                  WHERE id % 3 = 0),
             |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
             |      FROM raw WHERE a <> b),
             |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
             |        FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
             |        GROUP BY 1),
             |ks AS (SELECT unnest([2, 3, 4]) AS k),
             |nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
             |       FROM deg CROSS JOIN ks WHERE degree > k GROUP BY 1),
             |ek AS (SELECT k, CAST(count(*) AS BIGINT) AS n_edges
             |       FROM e JOIN deg da ON e.a = da.id
             |            JOIN deg db ON e.b = db.id
             |            CROSS JOIN ks
             |       WHERE da.degree > k AND db.degree > k GROUP BY 1)
             |SELECT CAST(k AS BIGINT) AS k, n_nodes,
             |       coalesce(n_edges, 0) AS n_edges,
             |       CASE WHEN n_nodes < 2 THEN 0
             |            ELSE 2 * coalesce(n_edges, 0) * 1000000
             |                 // (n_nodes * (n_nodes - 1))
             |       END AS phi_e6
             |FROM nk LEFT JOIN ek USING (k)""".stripMargin)),

    // ── Global transitivity of the same graph: 3·triangles / wedges,
    //    wedges in closed form from degrees.
    QueryDef("q_transitivity",
      (s, d) => {
        val nodes = Tables.customer(s, d)
          .select((col("c_custkey") % 100).as("id")).distinct()
        val edges = nodes.select(col("id").as("a"), ((col("id") + 1) % 100).as("b"))
          .unionByName(nodes.select(col("id").as("a"), ((col("id") + 2) % 100).as("b")))
        Graph.transitivity(edges)
      },
      Some("""WITH nodes AS (SELECT DISTINCT c_custkey % 100 AS id FROM customer),
             |raw AS (SELECT id AS a, (id + 1) % 100 AS b FROM nodes
             |        UNION ALL SELECT id, (id + 2) % 100 FROM nodes),
             |e AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b
             |      FROM raw WHERE a <> b),
             |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
             |        FROM e e1 JOIN e e2 ON e2.a = e1.b
             |             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
             |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
             |        FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
             |        GROUP BY 1),
             |w AS (SELECT CAST(sum(degree * (degree - 1)) AS BIGINT) AS w2 FROM deg)
             |SELECT n_triangles, w2 // 2 AS n_wedges,
             |       CASE WHEN w2 = 0 THEN 0
             |            ELSE 6 * n_triangles * 1000000 // w2
             |       END AS transitivity_e6
             |FROM tri CROSS JOIN w""".stripMargin)),

    // ── Daily-path edit-distance drift per user over the event stream.
    QueryDef("q_path_drift",
      (s, d) => Behavior.pathDrift(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_id", "event_type"),
      Some("""WITH e AS (SELECT user_id AS u, epoch_us(ts) // 86400000000 AS day,
             |                 epoch_us(ts) AS t, event_id AS tie,
             |                 event_type AS et FROM events),
             |daily AS (SELECT u, day,
             |                 string_agg(et, '>' ORDER BY t, tie) AS path
             |          FROM e GROUP BY 1, 2),
             |lg AS (SELECT u, path,
             |              lag(path) OVER (PARTITION BY u ORDER BY day) AS prev
             |       FROM daily),
             |d AS (SELECT u, CASE WHEN prev IS NULL THEN NULL
             |                     ELSE levenshtein(path, prev) END AS dist
             |      FROM lg)
             |SELECT u, CAST(count(*) AS BIGINT) AS n_days,
             |       CAST(count(dist) AS BIGINT) AS n_transitions,
             |       CAST(coalesce(sum(dist), 0) AS BIGINT) AS dist_total,
             |       CAST(coalesce(sum(dist), 0) * 1000 // count(dist) AS BIGINT)
             |         AS drift_e3
             |FROM d GROUP BY 1 HAVING count(dist) >= 1""".stripMargin))
  )
}
