package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-110 batch: the classical quality-control corner — Shewhart
  * X̄-R control limits (the subgrouped chart the q_cusum_drift /
  * q_page_hinkley sequential detectors assume was run first), Dixon's Q
  * outlier gate for small samples (where q_grubbs' z-form is invalid),
  * and the Rousseeuw–Croux Sₙ robust scale (pairwise-median dispersion
  * that, unlike MAD, needs no location estimate and keeps 50%
  * breakdown at higher efficiency).
  */
object Round110Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── X̄-R chart over full ISO weeks of daily event volumes
    //    (subgroup size n = 7): per-week mean and range, then the
    //    Shewhart limits X̄̄ ± A₂·R̄ and [D₃, D₄]·R̄ with the tabulated
    //    n = 7 constants (A₂ = .419, D₃ = .076, D₄ = 1.924) in e3
    //    fixed point. Partial boundary weeks are excluded — a limit
    //    from a short subgroup is biased. All integer e6.
    QueryDef("q_xbar_r",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
        val weeks = daily
          .groupBy(expr("day div 7").as("wk"))
          .agg(count(lit(1)).as("n_days"), sum(col("c")).as("s"),
            (max(col("c")) - min(col("c"))).as("r"))
          .filter(col("n_days") === 7L)
        weeks
          .agg(count(lit(1)).as("n_sub"),
            sum(expr("s * 1000000 div 7")).as("xb_sum_e6"),
            sum(expr("r * 1000000")).as("r_sum_e6"))
          .selectExpr("CAST(n_sub AS BIGINT) AS n_subgroups",
            "xb_sum_e6 div n_sub AS xbarbar_e6",
            "r_sum_e6 div n_sub AS rbar_e6",
            """xb_sum_e6 div n_sub
              |  + (r_sum_e6 div n_sub) * 419 div 1000 AS ucl_x_e6"""
              .stripMargin,
            """xb_sum_e6 div n_sub
              |  - (r_sum_e6 div n_sub) * 419 div 1000 AS lcl_x_e6"""
              .stripMargin,
            "(r_sum_e6 div n_sub) * 1924 div 1000 AS ucl_r_e6",
            "(r_sum_e6 div n_sub) * 76 div 1000 AS lcl_r_e6")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM events GROUP BY 1),
             |weeks AS (SELECT day // 7 AS wk,
             |                 CAST(count(*) AS BIGINT) AS n_days,
             |                 CAST(sum(c) AS BIGINT) AS s,
             |                 CAST(max(c) - min(c) AS BIGINT) AS r
             |          FROM daily GROUP BY 1
             |          HAVING count(*) = 7),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_sub,
             |             CAST(sum(s * 1000000 // 7) AS BIGINT) AS xb_sum_e6,
             |             CAST(sum(r * 1000000) AS BIGINT) AS r_sum_e6
             |      FROM weeks)
             |SELECT n_sub AS n_subgroups,
             |       xb_sum_e6 // n_sub AS xbarbar_e6,
             |       r_sum_e6 // n_sub AS rbar_e6,
             |       xb_sum_e6 // n_sub
             |         + (r_sum_e6 // n_sub) * 419 // 1000 AS ucl_x_e6,
             |       xb_sum_e6 // n_sub
             |         - (r_sum_e6 // n_sub) * 419 // 1000 AS lcl_x_e6,
             |       (r_sum_e6 // n_sub) * 1924 // 1000 AS ucl_r_e6,
             |       (r_sum_e6 // n_sub) * 76 // 1000 AS lcl_r_e6
             |FROM m""".stripMargin)),

    // ── Dixon's Q at both ends of the 25-nation customer-count axis:
    //    Q = gap/range using the sorted sample's extreme gaps — the
    //    small-sample outlier screen where Grubbs' normal-theory z is
    //    untrustworthy. Nearest-rank picks on the bounded axis; gaps
    //    and range are non-negative so e6 truncation is
    //    engine-identical.
    QueryDef("q_dixon_q",
      (s, d) => {
        val cells = Tables.customer(s, d)
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // one sorted walk, four order stats
        val n = cells.agg(count(lit(1)).as("n"))
        cells.crossJoin(broadcast(n))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("x"), col("c_nationkey"))).cast("long"))
          .agg(max(col("n")).as("n"),
            max(when(col("rk") === 1L, col("x"))).as("x1"),
            max(when(col("rk") === 2L, col("x"))).as("x2"),
            max(when(col("rk") === col("n") - 1, col("x"))).as("xn1"),
            max(when(col("rk") === col("n"), col("x"))).as("xn"))
          .selectExpr("CAST(n AS BIGINT) AS n",
            "CAST(x1 AS BIGINT) AS x_min", "CAST(xn AS BIGINT) AS x_max",
            "(x2 - x1) * 1000000 div greatest(xn - x1, 1) AS q_min_e6",
            "(xn - xn1) * 1000000 div greatest(xn - x1, 1) AS q_max_e6")
      },
      Some("""WITH cells AS (SELECT c_nationkey,
             |                      CAST(count(*) AS BIGINT) AS x
             |               FROM customer GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cells),
             |r AS (SELECT x, n,
             |             CAST(row_number() OVER (ORDER BY x, c_nationkey)
             |               AS BIGINT) AS rk
             |      FROM cells CROSS JOIN n),
             |m AS (SELECT max(n) AS n,
             |             max(CASE WHEN rk = 1 THEN x END) AS x1,
             |             max(CASE WHEN rk = 2 THEN x END) AS x2,
             |             max(CASE WHEN rk = n - 1 THEN x END) AS xn1,
             |             max(CASE WHEN rk = n THEN x END) AS xn
             |      FROM r)
             |SELECT CAST(n AS BIGINT) AS n, CAST(x1 AS BIGINT) AS x_min,
             |       CAST(xn AS BIGINT) AS x_max,
             |       (x2 - x1) * 1000000 // greatest(xn - x1, 1) AS q_min_e6,
             |       (xn - xn1) * 1000000 // greatest(xn - x1, 1) AS q_max_e6
             |FROM m""".stripMargin)),

    // ── Rousseeuw–Croux Sₙ robust scale of daily event volume:
    //    Sₙ = lomedᵢ (lomedⱼ≠ᵢ |xᵢ − xⱼ|) — a 50%-breakdown dispersion
    //    estimate needing no location estimate. Both medians are
    //    nearest-rank (lower) on the calendar-bounded 30-day axis, so
    //    the 30×29 pair grid is the right exact plan; the bias
    //    constant c = 1.1926 is applied in e4 fixed point.
    QueryDef("q_sn_scale",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // both sides of the pair grid
        val pairs = daily.as("a")
          .crossJoin(daily.as("b"))
          .filter(col("a.day") =!= col("b.day"))
          .select(col("a.day").as("day"),
            abs(col("a.c") - col("b.c")).as("ad"))
        val inner = pairs
          .withColumn("m", count(lit(1)).over(
            Window.partitionBy(col("day"))))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("day")).orderBy(col("ad"))))
          .filter(col("rk") === expr("CAST((m + 1) div 2 AS INT)"))
          .select(col("day"), col("ad").as("di"))
        val nn = inner.agg(count(lit(1)).as("n"))
        inner.crossJoin(broadcast(nn))
          .withColumn("rk", row_number().over(Window.orderBy(col("di"))))
          .filter(col("rk") === expr("CAST((n + 1) div 2 AS INT)"))
          .selectExpr("CAST(n AS BIGINT) AS n_days",
            "CAST(di AS BIGINT) AS sn_raw",
            "di * 11926 div 10000 AS sn_e0")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM events GROUP BY 1),
             |pairs AS (SELECT a.day AS day, abs(a.c - b.c) AS ad
             |          FROM daily a CROSS JOIN daily b
             |          WHERE a.day <> b.day),
             |i AS (SELECT day, ad,
             |             CAST(count(*) OVER (PARTITION BY day) AS BIGINT)
             |               AS m,
             |             row_number() OVER (PARTITION BY day ORDER BY ad)
             |               AS rk
             |      FROM pairs),
             |inner_med AS (SELECT day, ad AS di FROM i
             |              WHERE rk = (m + 1) // 2),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM inner_med),
             |o AS (SELECT di, n,
             |             row_number() OVER (ORDER BY di) AS rk
             |      FROM inner_med CROSS JOIN n)
             |SELECT n AS n_days, CAST(di AS BIGINT) AS sn_raw,
             |       di * 11926 // 10000 AS sn_e0
             |FROM o WHERE rk = (n + 1) // 2""".stripMargin))
  )
}
