package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-88 batch, time-series monitoring closers: Bollinger bands
  * (rolling 7-day mean ± 2σ with breach flags — the banded control
  * chart q_ewma_smooth's point estimate lacks), the Pettitt test (rank-
  * based single change-point location, the nonparametric complement of
  * q_changepoint/q_binary_segmentation), and the turning-points test
  * (local-extrema count vs the 2(n−2)/3 randomness expectation — the
  * smoothness check q_runs_test does on signs).
  */
object Round88Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Bollinger: trailing 7-day window (current inclusive), bands at
    //    mean ± 2σ (population, exact moments, double close); every
    //    banded day emitted, breaches labeled high/low.
    QueryDef("q_bollinger",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
        val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
        daily
          .withColumn("nw", count(lit(1)).over(w))
          .withColumn("sw", sum(col("x")).over(w))
          .withColumn("qw", sum(col("x") * col("x")).over(w))
          .where(col("nw") === 7)
          .selectExpr("day", "x", "sw div 7 AS mean7",
            """round(sqrt(CAST(7 * qw - sw * sw AS DOUBLE))
              |/ CAST('7.0' AS DOUBLE), 6) AS sigma7""".stripMargin)
          .selectExpr("day", "x", "mean7", "sigma7",
            """CASE WHEN CAST(x AS DOUBLE) > CAST(mean7 AS DOUBLE)
              |       + 2 * sigma7 THEN 'high'
              |     WHEN CAST(x AS DOUBLE) < CAST(mean7 AS DOUBLE)
              |       - 2 * sigma7 THEN 'low'
              |     ELSE 'in' END AS band""".stripMargin)
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS x
             |              FROM events GROUP BY 1),
             |wnd AS (SELECT day, x,
             |               CAST(count(*) OVER w AS BIGINT) AS nw,
             |               CAST(sum(x) OVER w AS BIGINT) AS sw,
             |               CAST(sum(x * x) OVER w AS BIGINT) AS qw
             |        FROM daily
             |        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
             |                     AND CURRENT ROW)),
             |b AS (SELECT day, x, sw // 7 AS mean7,
             |             round(sqrt(CAST(7 * qw - sw * sw AS DOUBLE))
             |               / CAST('7.0' AS DOUBLE), 6) AS sigma7
             |      FROM wnd WHERE nw = 7),
             |f AS (SELECT day, x, mean7, sigma7,
             |             CASE WHEN CAST(x AS DOUBLE)
             |                    > CAST(mean7 AS DOUBLE) + 2 * sigma7
             |                  THEN 'high'
             |                  WHEN CAST(x AS DOUBLE)
             |                    < CAST(mean7 AS DOUBLE) - 2 * sigma7
             |                  THEN 'low'
             |                  ELSE 'in' END AS band
             |      FROM b)
             |SELECT day, x, mean7, sigma7, band FROM f""".stripMargin)),

    // ── Pettitt: U_t over the bounded day axis by exact pair signs;
    //    the argmax |U| locates the change point.
    QueryDef("q_pettitt",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // both pair sides
        val b = daily.select(col("day").as("d2"), col("x").as("x2"))
        val u = daily.join(b, col("day") < col("d2"))
          .withColumn("sgn",
            when(col("x2") > col("x"), 1L)
              .when(col("x2") < col("x"), -1L).otherwise(0L))
          .groupBy(col("day")).agg(sum(col("sgn")).as("contrib"))
        // U_t = Σ_{i≤t} contrib_i (sign sums of pairs crossing t)
        u.withColumn("ut", sum(col("contrib")).over(
            Window.orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rk", row_number().over(
            Window.orderBy(abs(col("ut")).desc, col("day"))))
          .where(col("rk") === 1)
          .select(col("day").as("change_day"), col("ut").as("u_stat"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS x
             |              FROM events GROUP BY 1),
             |pairs AS (SELECT a.day,
             |                 CASE WHEN b.x > a.x THEN 1
             |                      WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
             |          FROM daily a JOIN daily b ON a.day < b.day),
             |u AS (SELECT day, CAST(sum(sgn) AS BIGINT) AS contrib
             |      FROM pairs GROUP BY 1),
             |ut AS (SELECT day, CAST(sum(contrib) OVER (ORDER BY day
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ut
             |       FROM u)
             |SELECT day AS change_day, ut AS u_stat FROM (
             |  SELECT *, row_number() OVER (ORDER BY abs(ut) DESC, day)
             |    AS rk FROM ut)
             |WHERE rk = 1""".stripMargin)),

    // ── Turning points: interior local extrema count vs 2(n−2)/3
    //    expectation, z via the exact variance (16n−29)/90.
    QueryDef("q_turning_points",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
        val w = Window.orderBy(col("day"))
        daily
          .withColumn("xp", lag(col("x"), 1).over(w))
          .withColumn("xn", lead(col("x"), 1).over(w))
          .where(col("xp").isNotNull && col("xn").isNotNull)
          .agg(count(lit(1)).as("n_interior"),
            sum(when((col("x") > col("xp") && col("x") > col("xn")) ||
                (col("x") < col("xp") && col("x") < col("xn")), 1L)
              .otherwise(0L)).as("turns"))
          .selectExpr("n_interior + 2 AS n", "turns",
            "(2 * (n_interior + 2) - 4) * 1000000 div 3 AS expected_e6",
            """round((CAST(turns AS DOUBLE)
              |- CAST(2 * (n_interior + 2) - 4 AS DOUBLE)
              |  / CAST('3.0' AS DOUBLE))
              |/ sqrt(CAST(16 * (n_interior + 2) - 29 AS DOUBLE)
              |       / CAST('90.0' AS DOUBLE)), 6) AS z""".stripMargin)
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS x
             |              FROM events GROUP BY 1),
             |t AS (SELECT x, lag(x) OVER (ORDER BY day) AS xp,
             |             lead(x) OVER (ORDER BY day) AS xn
             |      FROM daily),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_interior,
             |             CAST(sum(CASE WHEN (x > xp AND x > xn)
             |                            OR (x < xp AND x < xn)
             |                           THEN 1 ELSE 0 END) AS BIGINT)
             |               AS turns
             |      FROM t WHERE xp IS NOT NULL AND xn IS NOT NULL)
             |SELECT n_interior + 2 AS n, turns,
             |       (2 * (n_interior + 2) - 4) * 1000000 // 3
             |         AS expected_e6,
             |       round((CAST(turns AS DOUBLE)
             |         - CAST(2 * (n_interior + 2) - 4 AS DOUBLE)
             |           / CAST('3.0' AS DOUBLE))
             |         / sqrt(CAST(16 * (n_interior + 2) - 29 AS DOUBLE)
             |                / CAST('90.0' AS DOUBLE)), 6) AS z
             |FROM m""".stripMargin))
  )
}
