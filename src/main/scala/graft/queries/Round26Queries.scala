package graft.queries

import graft.{QueryDef, Tables}
import graft.geo.HexSql
import graft.ops.Mobility
import org.apache.spark.sql.functions._

/** Round-26 batch: mobility analytics over the position stream —
  * origin–destination flows, neighbor-smoothed heatmap intensity, and
  * per-cell dwell time — each with an exact DuckDB oracle twin built on
  * the [[HexSql]] snap.
  */
object Round26Queries {

  // Coarse grid so cells actually collide (res 3 ≈ 15° edges).
  private val res = 3
  private val posCell = HexSql.withCellId(Tables.positionsSql, "lat", "lon", res)
  private val dayUs = 86400000000L

  def defs: Seq[QueryDef] = Seq(

    // ── OD matrix: per (vehicle, day), first → last cell, counted.
    QueryDef("q_od_matrix",
      (s, d) => Mobility.odMatrix(Tables.positions(s, d), res, dayUs),
      Some(s"""WITH p AS (SELECT vehicleId AS veh,
              |            epoch_us(eventTs) // $dayUs AS bkt,
              |            epoch_us(eventTs) AS t, event_id AS tie, cell_id
              |          FROM $posCell t),
              |od AS (SELECT veh, bkt,
              |         (SELECT p2.cell_id FROM p p2
              |          WHERE p2.veh = p.veh AND p2.bkt = p.bkt
              |          ORDER BY p2.t, p2.tie LIMIT 1) AS o_cell,
              |         (SELECT p2.cell_id FROM p p2
              |          WHERE p2.veh = p.veh AND p2.bkt = p.bkt
              |          ORDER BY p2.t DESC, p2.tie DESC LIMIT 1) AS d_cell
              |       FROM (SELECT DISTINCT veh, bkt FROM p) p)
              |SELECT o_cell, d_cell, CAST(count(*) AS BIGINT) AS flows
              |FROM od GROUP BY 1, 2""".stripMargin)),

    // ── One-ring box blur: smoothed = 7-cell disk total / 7 (e6).
    QueryDef("q_hex_smooth",
      (s, d) => Mobility.hexSmooth(Tables.positions(s, d), res),
      Some(s"""WITH c AS MATERIALIZED (
              |  SELECT cell_id AS cell, g_qi AS q, g_ri AS r,
              |         CAST(count(*) AS BIGINT) AS cnt
              |  FROM $posCell t GROUP BY 1, 2, 3),
              |scatter AS (
              |  SELECT c.q + d.dq AS tq, c.r + d.dr AS tr, c.cnt
              |  FROM c CROSS JOIN (VALUES (0, 0), (1, 0), (1, -1), (0, -1),
              |                            (-1, 0), (-1, 1), (0, 1)) d(dq, dr)),
              |disk AS (SELECT tq, tr, sum(cnt) AS disk FROM scatter
              |         GROUP BY 1, 2)
              |SELECT c.cell, c.cnt,
              |       CAST(k.disk * 1000000 // 7 AS BIGINT) AS smoothed_e6
              |FROM c JOIN disk k ON k.tq = c.q AND k.tr = c.r""".stripMargin)),

    // ── Dwell time per cell: lead-gap per vehicle, capped at 1 hour.
    QueryDef("q_dwell_time",
      (s, d) => Mobility.dwellTime(Tables.positions(s, d), res, 3600000000L),
      Some(s"""WITH p AS (SELECT vehicleId AS veh, epoch_us(eventTs) AS t,
              |            event_id AS tie, cell_id
              |          FROM $posCell t),
              |g AS (SELECT cell_id, least(coalesce(
              |         lead(t) OVER (PARTITION BY veh ORDER BY t, tie) - t,
              |         0), 3600000000) AS dwell
              |      FROM p)
              |SELECT cell_id AS cell, CAST(count(*) AS BIGINT) AS visits,
              |       CAST(sum(dwell) // 1000000 AS BIGINT) AS dwell_s
              |FROM g GROUP BY 1""".stripMargin))
  )
}
