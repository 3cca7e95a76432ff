package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-80 batch: a watermark advisor (lateness percentiles per stream
  * → the allowed-lateness setting q_lateness_histogram's bands only
  * describe), SMAPE backtesting of naive vs seasonal-naive forecasts
  * (the scale-free accuracy metric beside q_mase), and ship-SLA
  * attainment per order priority (the business-facing latency rollup
  * of the q_tpch_priority lateness join).
  */
object Round80Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Watermark advisor: lateness vs the running high-watermark in
    //    arrival order (the q_lateness_histogram skew convention);
    //    positional p50/p95/p99 + the share beyond p99.
    QueryDef("q_watermark_advisor",
      (s, d) => {
        val late = Tables.events(s, d)
          .select(col("event_type").as("et"), col("event_id").as("eid"),
            expr("unix_micros(ts)").as("t"))
          .withColumn("arr",
            expr("t + (eid * 2654435761 % 600) * 1000000"))
          .withColumn("late_s",
            expr("(max(t) OVER (PARTITION BY et ORDER BY arr, eid " +
              "ROWS UNBOUNDED PRECEDING) - t) div 1000000"))
          .localCheckpoint(false) // reused: 3 percentile picks + tail frac
        val w = Window.partitionBy(col("et"))
        val ranked = late
          .withColumn("rn", row_number().over(
            w.orderBy(col("late_s"), col("eid"))))
          .withColumn("n", count(lit(1)).over(w))
        def pick(p: Int, nm: String) = ranked
          .where(col("rn") === expr(s"($p * n + 99) div 100"))
          .select(col("et"), col("n"), col("late_s").as(nm))
        val ps = pick(50, "p50_s").join(pick(95, "p95_s"), Seq("et", "n"))
          .join(pick(99, "p99_s"), Seq("et", "n"))
        late.join(broadcast(ps), "et")
          .groupBy(col("et"), col("n"), col("p50_s"), col("p95_s"),
            col("p99_s"))
          .agg(sum(when(col("late_s") > col("p99_s"), 1L).otherwise(0L))
            .as("n_beyond"))
          .withColumn("beyond_e6", expr("n_beyond * 1000000 div n"))
      },
      Some {
        def pick(p: Int, nm: String) =
          s"""p$p AS (SELECT et, n, late_s AS $nm FROM ranked
             |        WHERE rn = ($p * n + 99) // 100)""".stripMargin
        s"""WITH late AS (
           |  SELECT et, eid, (max(t) OVER (PARTITION BY et ORDER BY arr,
           |    eid ROWS UNBOUNDED PRECEDING) - t) // 1000000 AS late_s
           |  FROM (SELECT event_type AS et, event_id AS eid,
           |               epoch_us(ts) AS t,
           |               epoch_us(ts) + (event_id * 2654435761 % 600)
           |                 * 1000000 AS arr
           |        FROM events)),
           |ranked AS (SELECT et, late_s,
           |                  row_number() OVER (PARTITION BY et
           |                    ORDER BY late_s, eid) AS rn,
           |                  CAST(count(*) OVER (PARTITION BY et)
           |                    AS BIGINT) AS n
           |           FROM late),
           |${pick(50, "p50_s")},
           |${pick(95, "p95_s")},
           |${pick(99, "p99_s")},
           |ps AS (SELECT p50.et, p50.n, p50_s, p95_s, p99_s
           |       FROM p50 JOIN p95 ON p50.et = p95.et
           |            JOIN p99 ON p50.et = p99.et)
           |SELECT late.et, n, p50_s, p95_s, p99_s,
           |       CAST(sum(CASE WHEN late_s > p99_s THEN 1 ELSE 0 END)
           |         AS BIGINT) AS n_beyond,
           |       CAST(sum(CASE WHEN late_s > p99_s THEN 1 ELSE 0 END)
           |         AS BIGINT) * 1000000 // n AS beyond_e6
           |FROM late JOIN ps ON late.et = ps.et
           |GROUP BY 1, 2, 3, 4, 5""".stripMargin
      }),

    // ── SMAPE backtest: naive (lag 1) vs seasonal-naive (lag 7) daily
    //    count forecasts per type; per-term e6 truncation, 0/0 skipped.
    QueryDef("q_smape_eval",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type").as("et"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("et"), col("day")).agg(count(lit(1)).as("x"))
        val w = Window.partitionBy(col("et")).orderBy(col("day"))
        val f = daily
          .withColumn("f1", lag(col("x"), 1).over(w))
          .withColumn("f7", lag(col("x"), 7).over(w))
        Seq(("naive", "f1"), ("snaive", "f7")).map { case (nm, c) =>
          f.where(col(c).isNotNull && (col("x") + col(c)) > 0)
            .groupBy(col("et"))
            .agg(count(lit(1)).as("n"),
              sum(expr(s"2000000 * abs(x - $c) div (x + $c)"))
                .as("s_terms"))
            .select(col("et"), lit(nm).as("model"), col("n"),
              expr("s_terms div n").as("smape_e6"))
        }.reduce(_ unionByName _)
      },
      Some {
        def side(nm: String, lagN: Int) =
          s"""SELECT et, '$nm' AS model, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(2000000 * abs(x - f) // (x + f)) // count(*)
             |         AS BIGINT) AS smape_e6
             |FROM (SELECT et, x, lag(x, $lagN) OVER (PARTITION BY et
             |        ORDER BY day) AS f FROM daily)
             |WHERE f IS NOT NULL AND x + f > 0
             |GROUP BY 1""".stripMargin
        s"""WITH daily AS (SELECT event_type AS et,
           |                     epoch_us(ts) // 86400000000 AS day,
           |                     CAST(count(*) AS BIGINT) AS x
           |              FROM events GROUP BY 1, 2)
           |${side("naive", 1)}
           |UNION ALL
           |${side("snaive", 7)}""".stripMargin
      }),

    // ── SLA attainment: orders shipped (first lineitem ship) within
    //    30/60 days, by priority; plus the positional p90 ship lag.
    QueryDef("q_sla_attainment",
      (s, d) => {
        val ship = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(min(expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000"))
            .as("ship_day"))
        val lags = Tables.orders(s, d)
          .join(ship, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderpriority").as("pri"),
            col("o_orderkey").as("ok"),
            (col("ship_day") -
              expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
                " div 86400000000")).as("lag_d"))
          .localCheckpoint(false) // reused: p90 pick + attainment rollup
        val w = Window.partitionBy(col("pri"))
        val p90 = lags
          .withColumn("rn", row_number().over(
            w.orderBy(col("lag_d"), col("ok"))))
          .withColumn("n", count(lit(1)).over(w))
          .where(col("rn") === expr("(9 * n + 9) div 10"))
          .select(col("pri"), col("lag_d").as("p90_lag_d"))
        lags.join(broadcast(p90), "pri")
          .groupBy(col("pri"), col("p90_lag_d"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("lag_d") <= 30, 1L).otherwise(0L)).as("in_30d"),
            sum(when(col("lag_d") <= 60, 1L).otherwise(0L)).as("in_60d"))
          .selectExpr("pri", "n_orders", "p90_lag_d",
            "in_30d * 1000000 div n_orders AS sla30_e6",
            "in_60d * 1000000 div n_orders AS sla60_e6")
      },
      Some("""WITH ship AS (SELECT l_orderkey,
             |                CAST(min(epoch_us(l_shipdate) // 86400000000)
             |                  AS BIGINT) AS ship_day
             |              FROM lineitem GROUP BY 1),
             |lags AS (SELECT o_orderpriority AS pri, o_orderkey AS ok,
             |                ship_day - epoch_us(o_orderdate)
             |                  // 86400000000 AS lag_d
             |         FROM orders JOIN ship ON o_orderkey = l_orderkey),
             |p90 AS (SELECT pri, lag_d AS p90_lag_d FROM (
             |          SELECT pri, lag_d, ok,
             |                 row_number() OVER (PARTITION BY pri
             |                   ORDER BY lag_d, ok) AS rn,
             |                 CAST(count(*) OVER (PARTITION BY pri)
             |                   AS BIGINT) AS n
             |          FROM lags)
             |        WHERE rn = (9 * n + 9) // 10)
             |SELECT lags.pri, CAST(count(*) AS BIGINT) AS n_orders,
             |       p90_lag_d,
             |       CAST(sum(CASE WHEN lag_d <= 30 THEN 1 ELSE 0 END)
             |         AS BIGINT) * 1000000 // count(*) AS sla30_e6,
             |       CAST(sum(CASE WHEN lag_d <= 60 THEN 1 ELSE 0 END)
             |         AS BIGINT) * 1000000 // count(*) AS sla60_e6
             |FROM lags JOIN p90 ON lags.pri = p90.pri
             |GROUP BY 1, 3""".stripMargin))
  )
}
