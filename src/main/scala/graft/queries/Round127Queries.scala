package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-127 batch: trajectory-shape analytics over the deterministic
  * ping grid ((user_id·37)%17000, (event_id·91)%35000 — the
  * [[graft.Tables.positions]] coordinate convention): detour ratio
  * (path length vs net displacement — the route-efficiency read beside
  * q_radius_gyration's spread), a predictability histogram (top-cell
  * share per user — the Song-et-al. regularity proxy next to
  * q_location_entropy), and gap-split trip statistics (the trip-count ×
  * path-length profile that q_session_window's sessionization implies
  * but never rolls up). All distances are Manhattan on e2-scaled
  * integer coordinates — engine-exact, no sqrt anywhere.
  */
object Round127Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Detour ratio per (user, day): Σ|step| over the ts-ordered pings
    //    vs |last − first|, both Manhattan-integer; ≥3 pings and a
    //    nonzero net. ONE user-day keyed shuffle carries the lag window,
    //    the frame-wide first/last, and the rollup.
    QueryDef("q_detour_ratio",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("ts"), col("event_id"))
        val wf = w.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        val pts = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            expr("(user_id * 37) % 17000").as("lat_e2"),
            expr("(event_id * 91) % 35000").as("lon_e2"))
        pts
          .withColumn("dlat", col("lat_e2") - lag(col("lat_e2"), 1).over(w))
          .withColumn("dlon", col("lon_e2") - lag(col("lon_e2"), 1).over(w))
          .withColumn("flat", first(col("lat_e2")).over(wf))
          .withColumn("flon", first(col("lon_e2")).over(wf))
          .withColumn("llat", last(col("lat_e2")).over(wf))
          .withColumn("llon", last(col("lon_e2")).over(wf))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("n_pings"),
            sum(expr("abs(dlat) + abs(dlon)")).as("path_m"),
            max(expr("abs(llat - flat) + abs(llon - flon)")).as("net_m"))
          .filter(col("n_pings") >= 3 && col("net_m") > 0)
          .withColumn("detour_e6", expr("path_m * 1000000 div net_m"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("detour_e6").desc, col("user_id"),
              col("day"))))
          .filter(col("rk") <= 20)
          .selectExpr("user_id", "day", "CAST(n_pings AS BIGINT) AS n_pings",
            "CAST(path_m AS BIGINT) AS path_m",
            "CAST(net_m AS BIGINT) AS net_m", "detour_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH pts AS (
             |  SELECT user_id, ts, event_id,
             |         epoch_us(ts) // 86400000000 AS day,
             |         (user_id * 37) % 17000 AS lat_e2,
             |         (event_id * 91) % 35000 AS lon_e2
             |  FROM events),
             |st AS (SELECT user_id, day,
             |              lat_e2 - lag(lat_e2) OVER w AS dlat,
             |              lon_e2 - lag(lon_e2) OVER w AS dlon,
             |              first_value(lat_e2) OVER wf AS flat,
             |              first_value(lon_e2) OVER wf AS flon,
             |              last_value(lat_e2) OVER wf AS llat,
             |              last_value(lon_e2) OVER wf AS llon
             |       FROM pts
             |       WINDOW w AS (PARTITION BY user_id, day
             |                    ORDER BY ts, event_id),
             |              wf AS (PARTITION BY user_id, day
             |                     ORDER BY ts, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING
             |                     AND UNBOUNDED FOLLOWING)),
             |ud AS (SELECT user_id, day,
             |              CAST(count(*) AS BIGINT) AS n_pings,
             |              CAST(sum(abs(dlat) + abs(dlon)) AS BIGINT)
             |                AS path_m,
             |              CAST(max(abs(llat - flat) + abs(llon - flon))
             |                AS BIGINT) AS net_m
             |       FROM st GROUP BY 1, 2
             |       HAVING count(*) >= 3
             |          AND max(abs(llat - flat) + abs(llon - flon)) > 0)
             |SELECT user_id, day, n_pings, path_m, net_m, detour_e6, rk
             |FROM (SELECT *, path_m * 1000000 // net_m AS detour_e6,
             |             CAST(row_number() OVER (ORDER BY
             |               path_m * 1000000 // net_m DESC, user_id, day)
             |               AS BIGINT) AS rk
             |      FROM ud)
             |WHERE rk <= 20""".stripMargin)),

    // ── Predictability histogram: per user the top-cell visit share
    //    (cell = e2 coords div 100 ≈ 1°×1° grid), bucketed into deciles
    //    — how regular is the population. Two keyed aggregates sharing
    //    the user prefix + one bounded-axis rollup.
    QueryDef("q_predictability",
      (s, d) => {
        val perCell = Tables.events(s, d)
          .select(col("user_id"),
            expr("((user_id * 37) % 17000) div 100").as("cx"),
            expr("((event_id * 91) % 35000) div 100").as("cy"))
          .groupBy(col("user_id"), col("cx"), col("cy"))
          .agg(count(lit(1)).as("c"))
        val perUser = perCell.groupBy(col("user_id"))
          .agg(sum(col("c")).as("n"), max(col("c")).as("m"),
            count(lit(1)).as("k"))
          .filter(col("n") >= 10)
          .withColumn("pred_e6", expr("m * 1000000 div n"))
        perUser
          .groupBy(expr("least(pred_e6 div 100000, 9)").as("decile"))
          .agg(count(lit(1)).as("n_users"), sum(col("k")).as("sk"),
            sum(col("n")).as("sn"))
          .selectExpr("CAST(decile AS BIGINT) AS decile",
            "CAST(n_users AS BIGINT) AS n_users",
            "sk div n_users AS avg_cells",
            "sn div n_users AS avg_pings")
      },
      Some("""WITH pc AS (
             |  SELECT user_id,
             |         ((user_id * 37) % 17000) // 100 AS cx,
             |         ((event_id * 91) % 35000) // 100 AS cy,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2, 3),
             |pu AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
             |              CAST(max(c) AS BIGINT) AS m,
             |              CAST(count(*) AS BIGINT) AS k
             |       FROM pc GROUP BY 1 HAVING sum(c) >= 10)
             |SELECT CAST(least(m * 1000000 // n // 100000, 9) AS BIGINT)
             |         AS decile,
             |       CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(k) AS BIGINT) // count(*) AS avg_cells,
             |       CAST(sum(n) AS BIGINT) // count(*) AS avg_pings
             |FROM pu GROUP BY 1""".stripMargin)),

    // ── Trip stats: a user-day's pings split into trips at >1 h gaps
    //    (cumulative gap-flag sum over the SAME ts-ordered window as the
    //    step deltas — one shuffle), then the n_trips profile across
    //    user-days with total Manhattan path per bucket.
    QueryDef("q_trip_stats",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("ts"), col("event_id"))
        val pts = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            expr("unix_micros(ts)").as("us"),
            expr("(user_id * 37) % 17000").as("lat_e2"),
            expr("(event_id * 91) % 35000").as("lon_e2"))
          .withColumn("gap", when(
            col("us") - lag(col("us"), 1).over(w) > 3600000000L, 1L)
            .otherwise(lit(0L)))
          .withColumn("step", when(col("gap") === 0L,
            abs(col("lat_e2") - lag(col("lat_e2"), 1).over(w)) +
              abs(col("lon_e2") - lag(col("lon_e2"), 1).over(w))))
        pts.groupBy(col("user_id"), col("day"))
          .agg((sum(col("gap")) + 1L).as("n_trips"),
            coalesce(sum(col("step")), lit(0L)).as("path_m"))
          .groupBy(col("n_trips"))
          .agg(count(lit(1)).as("n_user_days"), sum(col("path_m")).as("sp"))
          .selectExpr("CAST(n_trips AS BIGINT) AS n_trips",
            "CAST(n_user_days AS BIGINT) AS n_user_days",
            "sp div n_user_days AS avg_path_m")
      },
      Some("""WITH pts AS (
             |  SELECT user_id, ts, event_id,
             |         epoch_us(ts) // 86400000000 AS day,
             |         epoch_us(ts) AS us,
             |         (user_id * 37) % 17000 AS lat_e2,
             |         (event_id * 91) % 35000 AS lon_e2
             |  FROM events),
             |st AS (SELECT user_id, day,
             |              CASE WHEN us - lag(us) OVER w > 3600000000
             |                THEN 1 ELSE 0 END AS gap,
             |              CASE WHEN us - lag(us) OVER w <= 3600000000
             |                THEN abs(lat_e2 - lag(lat_e2) OVER w)
             |                   + abs(lon_e2 - lag(lon_e2) OVER w)
             |              END AS step
             |       FROM pts
             |       WINDOW w AS (PARTITION BY user_id, day
             |                    ORDER BY ts, event_id)),
             |ud AS (SELECT user_id, day,
             |              CAST(sum(gap) + 1 AS BIGINT) AS n_trips,
             |              CAST(coalesce(sum(step), 0) AS BIGINT)
             |                AS path_m
             |       FROM st GROUP BY 1, 2)
             |SELECT n_trips, CAST(count(*) AS BIGINT) AS n_user_days,
             |       CAST(sum(path_m) AS BIGINT) // count(*) AS avg_path_m
             |FROM ud GROUP BY 1""".stripMargin))
  )
}
