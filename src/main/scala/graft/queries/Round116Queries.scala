package graft.queries

import graft.{QueryDef, Tables}
import graft.geo.HexSql
import graft.geo.hexfunctions._
import graft.ops.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-116 batch: three mobility-mining staples over the synthetic
  * positions stream (reference domain — `heatmap_stream.py`'s feed) —
  * home/work anchor detection (modal night vs office-hours cell per
  * vehicle, the first step of any commute model), per-cell flow
  * imbalance (net arrivals − departures by hour of day: where does the
  * fleet pool and drain), and the jump-length distribution (log₂-
  * bucketed displacement histogram — the Lévy-flight diagnostic of
  * human-mobility papers). Hours derive from epoch microseconds (no
  * timezone surface); cells via the shared [[HexSql]] axial snap.
  */
object Round116Queries {

  private val res = 8

  def defs: Seq[QueryDef] = Seq(

    // ── Home/work anchors: per vehicle, the modal cell over night
    //    pings (hod ≥22 or <6) and over office-hour pings (9–16);
    //    rolled up to the top-5 home cells per provider with commuter
    //    counts (home ≠ work). Modal pick tie-breaks (cnt desc, cell
    //    asc) identically in both engines. The (vehicle, cell, class)
    //    rollup is the only data-sized exchange; anchors live on the
    //    vehicle axis.
    QueryDef("q_home_work",
      (s, d) => {
        val pos = Tables.positions(s, d)
          .withColumn("cellId", hex_cell_id(col("lat"), col("lon"), res))
          .withColumn("hod",
            expr("(unix_micros(eventTs) div 3600000000) % 24"))
          .withColumn("cls", when(col("hod") >= 22 || col("hod") < 6, "h")
            .when(col("hod") >= 9 && col("hod") <= 16, "w"))
          .filter(col("cls").isNotNull)
        val modal = pos
          .groupBy(col("provider"), col("vehicleId"), col("cls"),
            col("cellId"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("vehicleId"), col("cls"))
              .orderBy(col("cnt").desc, col("cellId"))))
          .filter(col("rn") === 1)
          .localCheckpoint(false) // home + work legs of the anchor join
        val home = modal.filter(col("cls") === "h")
          .select(col("provider"), col("vehicleId"),
            col("cellId").as("home_cell"))
        val work = modal.filter(col("cls") === "w")
          .select(col("vehicleId"), col("cellId").as("work_cell"))
        home.join(work, "vehicleId")
          .groupBy(col("provider"), col("home_cell"))
          .agg(count(lit(1)).as("n_vehicles"),
            sum(when(col("home_cell") =!= col("work_cell"), 1L)
              .otherwise(0L)).as("n_commuters"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("provider"))
              .orderBy(col("n_vehicles").desc, col("home_cell"))))
          .filter(col("rk") <= 5)
          .selectExpr("provider", "home_cell",
            "CAST(n_vehicles AS BIGINT) AS n_vehicles",
            "CAST(n_commuters AS BIGINT) AS n_commuters",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some {
        val posCell = HexSql.withCellId(Tables.positionsSql,
          "lat", "lon", res)
        s"""WITH pos AS (
           |  SELECT provider, vehicleId, cell_id,
           |         (epoch_us(eventTs) // 3600000000) % 24 AS hod
           |  FROM $posCell t),
           |cls AS (SELECT provider, vehicleId, cell_id,
           |               CASE WHEN hod >= 22 OR hod < 6 THEN 'h'
           |                    WHEN hod >= 9 AND hod <= 16 THEN 'w'
           |               END AS cls
           |        FROM pos),
           |cnt AS (SELECT provider, vehicleId, cls, cell_id,
           |               CAST(count(*) AS BIGINT) AS cnt
           |        FROM cls WHERE cls IS NOT NULL GROUP BY 1, 2, 3, 4),
           |modal AS (SELECT provider, vehicleId, cls, cell_id
           |          FROM (SELECT *, row_number() OVER (
           |                  PARTITION BY vehicleId, cls
           |                  ORDER BY cnt DESC, cell_id) AS rn
           |                FROM cnt) WHERE rn = 1),
           |hw AS (SELECT h.provider, h.cell_id AS home_cell,
           |              w.cell_id AS work_cell
           |       FROM (SELECT * FROM modal WHERE cls = 'h') h
           |       JOIN (SELECT * FROM modal WHERE cls = 'w') w
           |         ON h.vehicleId = w.vehicleId),
           |agg AS (SELECT provider, home_cell,
           |               CAST(count(*) AS BIGINT) AS n_vehicles,
           |               CAST(sum(CASE WHEN home_cell <> work_cell
           |                             THEN 1 ELSE 0 END) AS BIGINT)
           |                 AS n_commuters
           |        FROM hw GROUP BY 1, 2)
           |SELECT provider, home_cell, n_vehicles, n_commuters, rk
           |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY provider
           |        ORDER BY n_vehicles DESC, home_cell) AS BIGINT) AS rk
           |      FROM agg)
           |WHERE rk <= 5""".stripMargin
      }),

    // ── Flow imbalance: consecutive-ping cell transitions per vehicle
    //    (lag over (eventTs, event_id) — one keyed shuffle), then net
    //    arrivals − departures per (cell, hour-of-day); top 20 by
    //    |net|. Departure hour = the arrival row's hour (the hour the
    //    move completed) on both legs, so in/out books balance.
    QueryDef("q_flow_imbalance",
      (s, d) => {
        val w = Window.partitionBy(col("vehicleId"))
          .orderBy(col("eventTs"), col("event_id"))
        val trans = Tables.positions(s, d)
          .withColumn("cellId", hex_cell_id(col("lat"), col("lon"), res))
          .withColumn("hod",
            expr("(unix_micros(eventTs) div 3600000000) % 24"))
          .withColumn("prev", lag(col("cellId"), 1).over(w))
          .filter(col("prev").isNotNull && col("prev") =!= col("cellId"))
          .select(col("prev").as("from_cell"), col("cellId").as("to_cell"),
            col("hod"))
          .localCheckpoint(false) // arrival + departure rollups
        val in = trans.groupBy(col("to_cell").as("cell"), col("hod"))
          .agg(count(lit(1)).as("n_in"))
        val out = trans.groupBy(col("from_cell").as("cell"), col("hod"))
          .agg(count(lit(1)).as("n_out"))
        in.join(out, Seq("cell", "hod"), "full")
          .select(col("cell"), col("hod"),
            coalesce(col("n_in"), lit(0L)).as("n_in"),
            coalesce(col("n_out"), lit(0L)).as("n_out"))
          .withColumn("net", col("n_in") - col("n_out"))
          .withColumn("rk", row_number().over(
            Window.orderBy(abs(col("net")).desc, col("cell"), col("hod"))))
          .filter(col("rk") <= 20)
          .selectExpr("cell", "CAST(hod AS BIGINT) AS hod",
            "CAST(n_in AS BIGINT) AS n_in",
            "CAST(n_out AS BIGINT) AS n_out", "net",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some {
        val posCell = HexSql.withCellId(Tables.positionsSql,
          "lat", "lon", res)
        s"""WITH pos AS (
           |  SELECT vehicleId, cell_id, event_id,
           |         eventTs,
           |         (epoch_us(eventTs) // 3600000000) % 24 AS hod
           |  FROM $posCell t),
           |tr AS (SELECT lag(cell_id) OVER (PARTITION BY vehicleId
           |                ORDER BY eventTs, event_id) AS from_cell,
           |              cell_id AS to_cell, hod
           |       FROM pos),
           |trans AS (SELECT from_cell, to_cell, hod FROM tr
           |          WHERE from_cell IS NOT NULL
           |            AND from_cell <> to_cell),
           |i AS (SELECT to_cell AS cell, hod,
           |             CAST(count(*) AS BIGINT) AS n_in
           |      FROM trans GROUP BY 1, 2),
           |o AS (SELECT from_cell AS cell, hod,
           |             CAST(count(*) AS BIGINT) AS n_out
           |      FROM trans GROUP BY 1, 2),
           |f AS (SELECT coalesce(i.cell, o.cell) AS cell,
           |             coalesce(i.hod, o.hod) AS hod,
           |             coalesce(n_in, 0) AS n_in,
           |             coalesce(n_out, 0) AS n_out
           |      FROM i FULL JOIN o ON i.cell = o.cell AND i.hod = o.hod)
           |SELECT cell, CAST(hod AS BIGINT) AS hod, n_in, n_out,
           |       n_in - n_out AS net, rk
           |FROM (SELECT *, n_in - n_out AS net,
           |             CAST(row_number() OVER (ORDER BY
           |               abs(n_in - n_out) DESC, cell, hod) AS BIGINT)
           |               AS rk
           |      FROM f)
           |WHERE rk <= 20""".stripMargin
      }),

    // ── Jump-length distribution: squared centidegree displacement
    //    between consecutive pings per vehicle, log₂-bucketed through
    //    the shared fixed-point [[Bm25.log2E6]] (bit-identical in both
    //    engines — no IEEE log in the bucket boundary). Displacements
    //    are exact integers (the synthetic lat/lon are e2 fixed-point
    //    by construction), so the whole histogram is integer-exact.
    QueryDef("q_jump_lengths",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val d2f = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("(user_id * 37) % 17000").as("lat_e2"),
            expr("(event_id * 91) % 35000").as("lon_e2"))
          .withColumn("dlat", col("lat_e2") - lag(col("lat_e2"), 1).over(w))
          .withColumn("dlon", col("lon_e2") - lag(col("lon_e2"), 1).over(w))
          .filter(col("dlat").isNotNull)
          .select(expr("dlat * dlat + dlon * dlon").as("d2"))
        val hist = d2f
          .select((Bm25.log2E6(col("d2") + 1) / lit(1000000L))
            .cast("long").as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .localCheckpoint(false) // bucket axis; reused by the total
        val tot = hist.agg(sum(col("n")).as("tot"))
        hist.crossJoin(broadcast(tot))
          .selectExpr("bucket", "CAST(n AS BIGINT) AS n",
            "n * 1000000 div tot AS pct_e6")
      },
      Some(s"""WITH pts AS (
             |  SELECT user_id, ts, event_id,
             |         (user_id * 37) % 17000 AS lat_e2,
             |         (event_id * 91) % 35000 AS lon_e2
             |  FROM events),
             |dd AS (SELECT lat_e2 - lag(lat_e2) OVER w AS dlat,
             |              lon_e2 - lag(lon_e2) OVER w AS dlon
             |       FROM pts
             |       WINDOW w AS (PARTITION BY user_id
             |                    ORDER BY ts, event_id)),
             |d2 AS (SELECT CAST(dlat * dlat + dlon * dlon AS BIGINT)
             |                AS d2
             |       FROM dd WHERE dlat IS NOT NULL),
             |hist AS (SELECT ${Bm25.log2E6Sql("(d2 + 1)")} // 1000000
             |                  AS bucket,
             |                CAST(count(*) AS BIGINT) AS n
             |         FROM d2 GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM hist)
             |SELECT CAST(bucket AS BIGINT) AS bucket, n,
             |       n * 1000000 // tot AS pct_e6
             |FROM hist CROSS JOIN tot""".stripMargin))
  )
}
