package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{ClusterEval, Dbscan, Mobility}
import org.apache.spark.sql.functions._

/** Round-28 batch: centroid-silhouette clustering audit, point-level
  * DBSCAN core/border/noise classification, and per-route polyline
  * length — each integer-exact with a DuckDB oracle twin.
  */
object Round28Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Simplified silhouette per label over the embeddings table:
    //    squared-distance score in e6 fixed point (see ClusterEval).
    QueryDef("q_silhouette",
      (s, d) => ClusterEval.centroidSilhouette(Tables.embeddings(s, d)),
      Some("""WITH q AS MATERIALIZED (
             |  SELECT vec_id, CAST(label AS BIGINT) AS label,
             |         list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings),
             |comp AS MATERIALIZED (
             |  SELECT vec_id, label, unnest(qv) AS v,
             |         unnest(range(1, len(qv) + 1)) AS i
             |  FROM q),
             |cent AS (
             |  SELECT label AS cl, i,
             |         CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)
             |           AS c
             |  FROM comp GROUP BY 1, 2),
             |d2 AS (
             |  SELECT p.vec_id, p.label, c.cl,
             |         CAST(sum((p.v - c.c) * (p.v - c.c)) AS BIGINT) AS d2
             |  FROM comp p JOIN cent c ON c.i = p.i
             |  GROUP BY 1, 2, 3),
             |ab AS (
             |  SELECT vec_id, label,
             |         max(CASE WHEN cl = label THEN d2 END) AS a,
             |         min(CASE WHEN cl <> label THEN d2 END) AS b
             |  FROM d2 GROUP BY 1, 2),
             |s AS (
             |  SELECT label,
             |         CASE WHEN a = b THEN 0
             |              WHEN b > a THEN 1000000 - CAST(
             |                (CAST(1000000 AS HUGEINT) * CAST(a AS HUGEINT))
             |                // CAST(b AS HUGEINT) AS BIGINT)
             |              ELSE CAST(
             |                (CAST(1000000 AS HUGEINT) * CAST(b AS HUGEINT))
             |                // CAST(a AS HUGEINT) AS BIGINT) - 1000000
             |         END AS s_e6
             |  FROM ab)
             |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             |       CAST(sum(s_e6) AS BIGINT) AS sum_sil_e6,
             |       CAST(sum(CASE WHEN s_e6 < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_neg
             |FROM s GROUP BY label""".stripMargin)),

    // ── L∞ DBSCAN point classification over positions (ε = 200 e2-deg,
    //    minPts = 5), counted per provider. Coordinates shift to ≥ 0 so
    //    ε-cell bucketing truncates identically cross-engine.
    QueryDef("q_dbscan_classify",
      (s, d) => Dbscan.classify(
        Tables.positions(s, d).select(
          col("event_id").as("id"), col("provider").as("grp"),
          (floor(col("lat") * 100 + 0.5).cast("long") + 10000L).as("x"),
          (floor(col("lon") * 100 + 0.5).cast("long") + 20000L).as("y")),
        eps = 200L, minPts = 5L),
      Some(s"""WITH p AS MATERIALIZED (
              |  SELECT event_id AS id, provider AS grp,
              |         CAST(floor(lat * 100 + 0.5) AS BIGINT) + 10000 AS x,
              |         CAST(floor(lon * 100 + 0.5) AS BIGINT) + 20000 AS y
              |  FROM ${Tables.positionsSql} pp),
              |c AS MATERIALIZED (
              |  SELECT id, grp, x, y, x // 200 AS cx, y // 200 AS cy FROM p),
              |scat AS (
              |  SELECT id AS ida, x AS xa, y AS ya,
              |         cx + dx.d AS ncx, cy + dy.d AS ncy
              |  FROM c, (VALUES (-1), (0), (1)) dx(d),
              |          (VALUES (-1), (0), (1)) dy(d)),
              |pairs AS MATERIALIZED (
              |  SELECT s.ida, b.id AS idb
              |  FROM scat s JOIN c b ON b.cx = s.ncx AND b.cy = s.ncy
              |  WHERE greatest(abs(s.xa - b.x), abs(s.ya - b.y)) <= 200),
              |nb AS (SELECT ida, count(*) AS n FROM pairs GROUP BY ida),
              |core AS (SELECT ida AS idc FROM nb WHERE n >= 5),
              |hascore AS (
              |  SELECT DISTINCT pr.ida FROM pairs pr
              |  JOIN core ON core.idc = pr.idb)
              |SELECT grp,
              |       CAST(sum(CASE WHEN core.idc IS NOT NULL THEN 1 ELSE 0
              |                END) AS BIGINT) AS core_pts,
              |       CAST(sum(CASE WHEN core.idc IS NULL
              |                      AND h.ida IS NOT NULL THEN 1 ELSE 0
              |                END) AS BIGINT) AS border_pts,
              |       CAST(sum(CASE WHEN core.idc IS NULL AND h.ida IS NULL
              |                THEN 1 ELSE 0 END) AS BIGINT) AS noise_pts
              |FROM p LEFT JOIN core ON core.idc = p.id
              |       LEFT JOIN hascore h ON h.ida = p.id
              |GROUP BY grp""".stripMargin)),

    // ── Per-route (event_type) polyline length in e2-degree units.
    QueryDef("q_path_length",
      (s, d) => Mobility.pathLength(
        Tables.positions(s, d).withColumn("route", col("event_type")),
        "route"),
      Some(s"""WITH p AS (
              |  SELECT event_type AS route, epoch_us(eventTs) AS t,
              |         event_id AS tie,
              |         CAST(floor(lat * 100 + 0.5) AS BIGINT) AS x,
              |         CAST(floor(lon * 100 + 0.5) AS BIGINT) AS y
              |  FROM ${Tables.positionsSql} pp),
              |st AS (
              |  SELECT route, x, y,
              |         lag(x) OVER (PARTITION BY route ORDER BY t, tie) AS px,
              |         lag(y) OVER (PARTITION BY route ORDER BY t, tie) AS py
              |  FROM p),
              |g AS (
              |  SELECT route,
              |         CASE WHEN px IS NULL THEN NULL
              |              ELSE CAST(floor(sqrt(CAST(
              |                (x - px) * (x - px) + (y - py) * (y - py)
              |                AS DOUBLE))) AS BIGINT) END AS seg
              |  FROM st)
              |SELECT route, CAST(count(*) AS BIGINT) AS n_pts,
              |       CAST(count(seg) AS BIGINT) AS n_segs,
              |       CAST(coalesce(sum(seg), 0) AS BIGINT) AS len_total,
              |       CAST(coalesce(max(seg), 0) AS BIGINT) AS len_max
              |FROM g GROUP BY route""".stripMargin))
  )
}
