package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Graph, GridCluster, Stats, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-17 batch: rank statistics (Spearman), one-way ANOVA, the DAG
  * critical path, OHLC candlesticks, and grid-density (DBSCAN-lite)
  * clustering — each with an exact DuckDB oracle twin, each one or two
  * keyed exchanges at scale.
  */
object Round17Queries {
  private val cents = "CAST(floor(value * 100 + 0.5) AS BIGINT)"

  def defs: Seq[QueryDef] = Seq(

    // ── Spearman rank correlation, per event type, between event TIME
    //    and value: the rank-based monotone-trend detector (robust to
    //    outliers where q_trend_slope is not). Doubled average ranks
    //    keep midrank ties integer-exact.
    QueryDef("q_spearman",
      (s, d) => Stats.spearmanByKey(
        Tables.events(s, d)
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "ts", "cents"),
      Some(s"""WITH r AS (
              |  SELECT event_type AS key,
              |         2 * rank() OVER (PARTITION BY event_type ORDER BY ts)
              |           + count(*) OVER (PARTITION BY event_type, ts) - 1 AS rx,
              |         2 * rank() OVER (PARTITION BY event_type ORDER BY $cents)
              |           + count(*) OVER (PARTITION BY event_type, $cents) - 1 AS ry
              |  FROM events),
              |m AS (SELECT key, count(*) AS n, sum(rx) AS sx, sum(ry) AS sy,
              |             sum(rx * rx) AS qx, sum(ry * ry) AS qy,
              |             sum(rx * ry) AS sxy
              |      FROM r GROUP BY key)
              |SELECT key, CAST(n AS BIGINT) AS n,
              |       CASE WHEN n * qx - sx * sx = 0 OR n * qy - sy * sy = 0 THEN NULL
              |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
              |                 sqrt(CAST(n * qx - sx * sx AS DOUBLE) *
              |                      CAST(n * qy - sy * sy AS DOUBLE)), 6)
              |       END AS rho
              |FROM m""".stripMargin)),

    // ── One-way ANOVA: does mean value differ across event types?
    //    Exact integer moments; per-group between-term rounded to
    //    cents² before the order-independent sum; one double division.
    QueryDef("q_anova",
      (s, d) => Stats.anovaF(
        Tables.events(s, d)
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "cents"),
      Some(s"""WITH g AS (
              |  SELECT event_type AS key, count(*) AS n_g, sum($cents) AS s_g,
              |         sum($cents * $cents) AS q_g
              |  FROM events GROUP BY 1),
              |t AS (SELECT n_g, s_g, q_g,
              |        CAST(floor(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) /
              |             CAST(n_g AS DOUBLE) + CAST('0.5' AS DOUBLE)) AS BIGINT) AS term_c2
              |      FROM g),
              |m AS (SELECT count(*) AS k, sum(n_g) AS n, sum(s_g) AS s,
              |             sum(q_g) AS q, sum(term_c2) AS ssb_raw FROM t),
              |z AS (SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
              |        CAST(ssb_raw -
              |          CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
              |               CAST(n AS DOUBLE) + CAST('0.5' AS DOUBLE)) AS BIGINT)
              |          AS BIGINT) AS ssb_c2,
              |        CAST(q - ssb_raw AS BIGINT) AS ssw_c2
              |      FROM m)
              |SELECT k, n, ssb_c2, ssw_c2,
              |       CASE WHEN k < 2 OR n <= k OR ssw_c2 = 0 THEN NULL
              |            ELSE round(CAST(ssb_c2 AS DOUBLE) * CAST(n - k AS DOUBLE) /
              |                 (CAST(ssw_c2 AS DOUBLE) * CAST(k - 1 AS DOUBLE)), 6)
              |       END AS f
              |FROM z""".stripMargin)),

    // ── Longest weighted path ending at each node of the chain DAG
    //    (edges directed low→high id, so acyclic; w = id gap). The
    //    critical-path / dataflow-depth primitive, by bounded-round
    //    max-relaxation.
    QueryDef("q_dag_longest",
      (s, d) => {
        val (nodes, dag) = chainDag(s, d)
        Graph.dagLongestPath(nodes,
          dag.withColumn("w", col("dst") - col("src")), 10)
      },
      Some(s"""WITH RECURSIVE $chainDagSql,
              |e AS (SELECT src, dst, dst - src AS w FROM ce),
              |reach(v, dd) AS (
              |  SELECT id, CAST(0 AS BIGINT) FROM nodes
              |  UNION
              |  SELECT e.dst, r.dd + e.w FROM reach r JOIN e ON e.src = r.v)
              |SELECT CAST(v AS BIGINT) AS id, CAST(max(dd) AS BIGINT) AS dist
              |FROM reach GROUP BY 1""".stripMargin)),

    // ── Daily OHLC candlesticks per event type: open/close are
    //    struct-extrema (totally ordered by the unique (ts, event_id)),
    //    so ONE map-side-combinable aggregate — no window, no sort.
    QueryDef("q_ohlc",
      (s, d) => TimeSeries.ohlc(
        Tables.events(s, d)
          .withColumn("tmicros", unix_micros(col("ts")))
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "tmicros", "event_id", "cents", 86400000000L),
      Some(s"""WITH b AS (
              |  SELECT event_type AS key,
              |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS bucket,
              |         $cents AS x,
              |         row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
              |                            ORDER BY ts, event_id) AS ra,
              |         row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
              |                            ORDER BY ts DESC, event_id DESC) AS rd
              |  FROM events)
              |SELECT key, CAST(bucket AS BIGINT) AS bucket,
              |       max(CASE WHEN ra = 1 THEN x END) AS open_cents,
              |       max(x) AS high_cents, min(x) AS low_cents,
              |       max(CASE WHEN rd = 1 THEN x END) AS close_cents,
              |       count(*) AS n_events
              |FROM b GROUP BY 1, 2""".stripMargin)),

    // ── Grid-density clustering (DBSCAN-lite) of the derived position
    //    grid: dense cells (≥ 2× mean occupancy, scale-free threshold)
    //    8-neighbor-joined and component-labeled — the neighborhood
    //    query is an equi-join, the closure runs on cells, not points.
    QueryDef("q_grid_clusters",
      (s, d) => GridCluster.denseCellClusters(
        Tables.events(s, d)
          .select(expr("((user_id * 37) % 17000) div 100").as("cx"),
            expr("((event_id * 91) % 35000) div 100").as("cy")),
        "cx", "cy"),
      Some("""WITH RECURSIVE c AS (
             |  SELECT (user_id * 37) % 17000 // 100 AS cx,
             |         (event_id * 91) % 35000 // 100 AS cy, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT (2 * sum(n)) // count(*) AS thr FROM c),
             |d AS MATERIALIZED (
             |  SELECT cx, cy, n, cx * 1000 + cy AS k FROM c, t WHERE n >= thr),
             |e AS (SELECT a.k AS a, b.k AS b FROM d a JOIN d b
             |      ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
             |     AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 AND a.k < b.k),
             |e2 AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
             |reach(id, label) AS (
             |  SELECT k, k FROM d
             |  UNION
             |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id),
             |cc AS (SELECT id, min(label) AS cluster_id FROM reach GROUP BY id)
             |SELECT cluster_id, count(*) AS n_cells,
             |       CAST(sum(d.n) AS BIGINT) AS n_points
             |FROM cc JOIN d ON d.k = cc.id GROUP BY 1""".stripMargin))
  )

  /** Directed chain-with-chords DAG (same topology as Round16's
    * chainGraph, kept low→high so it is acyclic): 10 ten-node chains,
    * (c, c+4) chords everywhere, (c+4, c+9) on even chains. */
  private val chainDagSql =
    """nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
      |ce AS (
      |  SELECT id AS src, id + 1 AS dst FROM nodes WHERE id % 10 <> 9
      |  UNION SELECT id, id + 4 FROM nodes WHERE id % 10 = 0
      |  UNION SELECT id, id + 5 FROM nodes WHERE id % 10 = 4 AND (id // 10) % 2 = 0)""".stripMargin

  private def chainDag(s: org.apache.spark.sql.SparkSession, d: String) = {
    val nodes = Tables.part(s, d)
      .select((col("p_partkey") % 100).as("id")).distinct()
    val chain = nodes.filter(col("id") % 10 =!= 9)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val c1 = nodes.filter(col("id") % 10 === 0)
      .select(col("id").as("src"), (col("id") + 4).as("dst"))
    val c2 = nodes.filter(col("id") % 10 === 4 && expr("(id div 10) % 2") === 0)
      .select(col("id").as("src"), (col("id") + 5).as("dst"))
    (nodes, chain.unionByName(c1).unionByName(c2).distinct())
  }
}
