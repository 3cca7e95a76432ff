package graft.queries

import graft.{QueryDef, Tables}
import graft.geo.HexSql
import graft.ops.{Bm25, Mobility}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-40 batch: the trajectory-mining layer over the position stream
  * — co-location contact pairs, stay-point detection, per-vehicle
  * location entropy (predictability), and the serving tier's
  * hour-of-day × day-of-week heatmap matrix. All cell math rides the
  * shared [[HexSql]] snap; entropy rides the shared fixed-point log₂.
  */
object Round40Queries {

  private val res = 3
  private val posCell = HexSql.withCellId(Tables.positionsSql, "lat", "lon", res)
  private val bucketUs = 300000000L // 5-minute co-location buckets

  def defs: Seq[QueryDef] = Seq(

    // ── Contact pairs: vehicles sharing a (cell, 5-min bucket), top 20
    //    by distinct shared blocks. Presence dedups BEFORE the blocked
    //    self-join — the join never sees raw pings.
    QueryDef("q_colocation",
      (s, d) => Mobility.colocation(Tables.positions(s, d), res, bucketUs, 20),
      Some(s"""WITH presence AS (
              |  SELECT DISTINCT vehicleId AS veh, cell_id AS cell,
              |         epoch_us(eventTs) // $bucketUs AS bkt
              |  FROM $posCell t)
              |SELECT a.veh AS veh_a, b.veh AS veh_b,
              |       CAST(count(*) AS BIGINT) AS n_blocks
              |FROM presence a JOIN presence b
              |  ON a.cell = b.cell AND a.bkt = b.bkt AND a.veh < b.veh
              |GROUP BY 1, 2
              |ORDER BY n_blocks DESC, veh_a, veh_b LIMIT 20""".stripMargin)),

    // ── Stay points: maximal same-cell runs ≥ 15 min per vehicle,
    //    rolled up per cell (gaps-and-islands on the vehicle key).
    QueryDef("q_stay_points",
      (s, d) => Mobility.stayPoints(Tables.positions(s, d), res, 900000000L),
      Some(s"""WITH p AS (
              |  SELECT vehicleId AS veh, epoch_us(eventTs) AS t,
              |         event_id AS tie, cell_id AS cell
              |  FROM $posCell t),
              |b AS (
              |  SELECT veh, t, tie, cell,
              |         CASE WHEN lag(cell) OVER (PARTITION BY veh
              |                ORDER BY t, tie) IS DISTINCT FROM cell
              |              THEN 1 ELSE 0 END AS brk
              |  FROM p),
              |r AS (
              |  SELECT veh, cell,
              |         sum(brk) OVER (PARTITION BY veh ORDER BY t, tie
              |                        ROWS UNBOUNDED PRECEDING) AS run, t
              |  FROM b),
              |stays AS (
              |  SELECT veh, run, cell, max(t) - min(t) AS dur
              |  FROM r GROUP BY 1, 2, 3
              |  HAVING max(t) - min(t) >= 900000000)
              |SELECT cell, CAST(count(*) AS BIGINT) AS n_stays,
              |       CAST(sum(dur) // 1000000 AS BIGINT) AS stay_s,
              |       CAST(max(dur) // 1000000 AS BIGINT) AS max_stay_s
              |FROM stays GROUP BY 1""".stripMargin)),

    // ── Location entropy per vehicle (Song et al. predictability):
    //    H_e6 = log2e6(T) − (Σ cnt·log2e6(cnt)) div T, integer-exact on
    //    the shared fixed-point log₂.
    QueryDef("q_location_entropy",
      (s, d) => Mobility.locationEntropy(Tables.positions(s, d), res),
      Some(s"""WITH vc AS (
              |  SELECT vehicleId AS veh, cell_id AS cell, count(*) AS cnt
              |  FROM $posCell t GROUP BY 1, 2),
              |v AS (
              |  SELECT veh, CAST(sum(cnt) AS BIGINT) AS n_visits,
              |         count(*) AS n_cells,
              |         sum(cnt * ${Bm25.log2E6Sql("cnt")}) AS clc
              |  FROM vc GROUP BY 1)
              |SELECT veh, CAST(n_visits AS BIGINT) AS n_visits,
              |       CAST(n_cells AS BIGINT) AS n_cells,
              |       CAST(${Bm25.log2E6Sql("n_visits")} - clc // n_visits
              |            AS BIGINT) AS entropy_e6
              |FROM v""".stripMargin)),

    // ── Serving heatmap matrix: hour-of-day × day-of-week occupancy per
    //    event type with each cell's share of the type total (e6). The
    //    dow is epoch-day mod 7 (identical on both engines — the
    //    q_chi_square convention); totals ride a type-keyed window over
    //    the ≤ 168-cell aggregate, not a second scan.
    QueryDef("q_hourly_heatmap",
      (s, d) => {
        val cells = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000 % 7").as("dow"),
            expr("unix_micros(ts) div 3600000000 % 24").as("hour"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("event_type"))
        cells.withColumn("total", sum(col("cnt")).over(w))
          .select(col("event_type"), col("dow"), col("hour"), col("cnt"),
            expr("cnt * 1000000 div total").as("share_e6"))
      },
      Some("""WITH c AS (
             |  SELECT event_type,
             |         epoch_us(ts) // 86400000000 % 7 AS dow,
             |         epoch_us(ts) // 3600000000 % 24 AS hour,
             |         count(*) AS cnt
             |  FROM events GROUP BY 1, 2, 3)
             |SELECT event_type, CAST(dow AS BIGINT) AS dow,
             |       CAST(hour AS BIGINT) AS hour,
             |       CAST(cnt AS BIGINT) AS cnt,
             |       CAST(cnt * 1000000 //
             |            sum(cnt) OVER (PARTITION BY event_type)
             |            AS BIGINT) AS share_e6
             |FROM c""".stripMargin))
  )
}
