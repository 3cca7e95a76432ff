package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-113 batch: the three classical k-group screens still missing
  * from the test battery — Jonckheere–Terpstra (ordered-alternative
  * trend across groups, the test ANOVA/Kruskal–Wallis lack power for
  * when the alternative is monotone), Brown–Forsythe (median-centered
  * Levene — the variance-homogeneity gate ANOVA's F assumes), and
  * Cochran–Armitage (trend in binomial proportions across ordered
  * exposure levels). All three run on bounded (group × calendar-unit)
  * grids, so the pair/moment arithmetic is volume-independent: at
  * 100 TB only the first rollup grows.
  */
object Round113Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Jonckheere–Terpstra across order priorities (ordered 1-URGENT
    //    … 5-LOW): units are monthly order counts per priority; J sums
    //    the cross-group "later group larger" pair indicators over every
    //    priority pair (i<j), carried at 2× so ties (+1) stay integer.
    //    Null moments use the tie-free formulas on the zero-filled grid
    //    (equal n per group by construction). The pair grid is
    //    (months)² × C(5,2) — bounded by the calendar, not the data.
    QueryDef("q_jonckheere",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
        val axes = cell.select(col("g")).distinct()
          .crossJoin(cell.select(col("mo")).distinct())
        val grid = axes.join(cell, Seq("g", "mo"), "left")
          .select(col("g"), col("mo"), coalesce(col("x"), lit(0L)).as("x"))
          .localCheckpoint(false) // both pair sides + the group-size rollup
        val j2 = grid.as("a").join(grid.as("b"), col("a.g") < col("b.g"))
          .agg(sum(when(col("a.x") < col("b.x"), 2L)
            .when(col("a.x") === col("b.x"), 1L).otherwise(0L)).as("j2"))
        val mom = grid.groupBy(col("g")).agg(count(lit(1)).as("n"))
          .agg(sum(col("n")).as("nn"),
            sum(expr("n * n")).as("sn2"),
            sum(expr("n * n * (2 * n + 3)")).as("sn23"))
        j2.crossJoin(mom)
          .selectExpr("CAST(j2 AS BIGINT) AS j2",
            "CAST(nn AS BIGINT) AS n_total",
            "(nn * nn - sn2) div 2 AS ej2",
            "nn * nn * (2 * nn + 3) - sn23 AS var72",
            """CASE WHEN nn * nn * (2 * nn + 3) - sn23 = 0
              |     THEN CAST('0.0' AS DOUBLE)
              |     ELSE round((CAST(j2 AS DOUBLE)
              |            - CAST((nn * nn - sn2) div 2 AS DOUBLE))
              |          / CAST('2.0' AS DOUBLE)
              |          / sqrt(CAST(nn * nn * (2 * nn + 3) - sn23
              |                   AS DOUBLE) / CAST('72.0' AS DOUBLE)), 6)
              |END AS z""".stripMargin)
      },
      Some("""WITH cell AS (SELECT substring(o_orderpriority, 1, 1) AS g,
             |                    year(o_orderdate) * 100
             |                      + month(o_orderdate) AS mo,
             |                    CAST(count(*) AS BIGINT) AS x
             |             FROM orders GROUP BY 1, 2),
             |grid AS (SELECT ga.g, ma.mo, coalesce(c.x, 0) AS x
             |         FROM (SELECT DISTINCT g FROM cell) ga
             |         CROSS JOIN (SELECT DISTINCT mo FROM cell) ma
             |         LEFT JOIN cell c ON c.g = ga.g AND c.mo = ma.mo),
             |jj AS (SELECT CAST(sum(CASE WHEN a.x < b.x THEN 2
             |                            WHEN a.x = b.x THEN 1
             |                            ELSE 0 END) AS BIGINT) AS j2
             |       FROM grid a JOIN grid b ON a.g < b.g),
             |mom AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |               CAST(sum(n * n) AS BIGINT) AS sn2,
             |               CAST(sum(n * n * (2 * n + 3)) AS BIGINT)
             |                 AS sn23
             |        FROM (SELECT g, CAST(count(*) AS BIGINT) AS n
             |              FROM grid GROUP BY 1))
             |SELECT j2, nn AS n_total,
             |       (nn * nn - sn2) // 2 AS ej2,
             |       nn * nn * (2 * nn + 3) - sn23 AS var72,
             |       CASE WHEN nn * nn * (2 * nn + 3) - sn23 = 0
             |            THEN CAST('0.0' AS DOUBLE)
             |            ELSE round((CAST(j2 AS DOUBLE)
             |                   - CAST((nn * nn - sn2) // 2 AS DOUBLE))
             |                 / CAST('2.0' AS DOUBLE)
             |                 / sqrt(CAST(nn * nn * (2 * nn + 3) - sn23
             |                          AS DOUBLE)
             |                        / CAST('72.0' AS DOUBLE)), 6)
             |       END AS z
             |FROM jj CROSS JOIN mom""".stripMargin)),

    // ── Brown–Forsythe variance-homogeneity across the same priority ×
    //    month grid: deviations from the per-group median (doubled —
    //    m2 = sum of the two middle order statistics, so the integer
    //    carry is exact for even and odd n alike), then the Levene F on
    //    the deviation grid in fully integer numer/denominator:
    //    W = (n−1)(k·ΣSᵢ² − S²) / ((k−1)(n·Q − ΣSᵢ²)) on the equal-n
    //    zero-filled grid. One grid build, one sort-rank window per
    //    group, three tiny rollups.
    QueryDef("q_brown_forsythe",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
        val axes = cell.select(col("g")).distinct()
          .crossJoin(cell.select(col("mo")).distinct())
        val grid = axes.join(cell, Seq("g", "mo"), "left")
          .select(col("g"), col("mo"), coalesce(col("x"), lit(0L)).as("x"))
          .localCheckpoint(false) // median rank pass + deviation pass
        val med = grid
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("g")).orderBy(col("x"), col("mo"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
          .groupBy(col("g"))
          .agg(sum(when(col("rn") === expr("(n + 1) div 2"), col("x"))
            .otherwise(0L)).as("lo"),
            sum(when(col("rn") === expr("(n + 2) div 2"), col("x"))
              .otherwise(0L)).as("hi"))
          .select(col("g"), (col("lo") + col("hi")).as("m2"))
        val dev = grid.join(med, "g")
          .select(col("g"), abs(col("x") * 2 - col("m2")).as("z2"))
        val per = dev.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("z2")).as("sg"),
            sum(expr("z2 * z2")).as("qg"))
        per.agg(count(lit(1)).as("k"), max(col("n")).as("n"),
          sum(col("sg")).as("s"), sum(expr("sg * sg")).as("ss2"),
          sum(col("qg")).as("q"))
          .selectExpr("CAST(k AS BIGINT) AS k", "CAST(n AS BIGINT) AS n",
            "(n - 1) * (k * ss2 - s * s) AS w_num",
            "(k - 1) * (n * q - ss2) AS w_den",
            """CASE WHEN (k - 1) * (n * q - ss2) = 0
              |     THEN CAST('0.0' AS DOUBLE)
              |     ELSE round(CAST((n - 1) * (k * ss2 - s * s) AS DOUBLE)
              |          / CAST((k - 1) * (n * q - ss2) AS DOUBLE), 6)
              |END AS bf_w""".stripMargin)
      },
      Some("""WITH cell AS (SELECT substring(o_orderpriority, 1, 1) AS g,
             |                    year(o_orderdate) * 100
             |                      + month(o_orderdate) AS mo,
             |                    CAST(count(*) AS BIGINT) AS x
             |             FROM orders GROUP BY 1, 2),
             |grid AS (SELECT ga.g, ma.mo, coalesce(c.x, 0) AS x
             |         FROM (SELECT DISTINCT g FROM cell) ga
             |         CROSS JOIN (SELECT DISTINCT mo FROM cell) ma
             |         LEFT JOIN cell c ON c.g = ga.g AND c.mo = ma.mo),
             |rk AS (SELECT g, x,
             |              row_number() OVER (PARTITION BY g
             |                                 ORDER BY x, mo) AS rn,
             |              count(*) OVER (PARTITION BY g) AS n
             |       FROM grid),
             |med AS (SELECT g,
             |               CAST(sum(CASE WHEN rn = (n + 1) // 2 THEN x
             |                             ELSE 0 END)
             |                  + sum(CASE WHEN rn = (n + 2) // 2 THEN x
             |                             ELSE 0 END) AS BIGINT) AS m2
             |        FROM rk GROUP BY 1),
             |dev AS (SELECT grid.g, abs(x * 2 - m2) AS z2
             |        FROM grid JOIN med ON grid.g = med.g),
             |per AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(z2) AS BIGINT) AS sg,
             |               CAST(sum(z2 * z2) AS BIGINT) AS qg
             |        FROM dev GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |             CAST(max(n) AS BIGINT) AS n,
             |             CAST(sum(sg) AS BIGINT) AS s,
             |             CAST(sum(sg * sg) AS BIGINT) AS ss2,
             |             CAST(sum(qg) AS BIGINT) AS q
             |      FROM per)
             |SELECT k, n, (n - 1) * (k * ss2 - s * s) AS w_num,
             |       (k - 1) * (n * q - ss2) AS w_den,
             |       CASE WHEN (k - 1) * (n * q - ss2) = 0
             |            THEN CAST('0.0' AS DOUBLE)
             |            ELSE round(CAST((n - 1) * (k * ss2 - s * s)
             |                         AS DOUBLE)
             |                 / CAST((k - 1) * (n * q - ss2) AS DOUBLE), 6)
             |       END AS bf_w
             |FROM t""".stripMargin)),

    // ── Cochran–Armitage trend: does the return-flag rate trend across
    //    the ordered line-number exposure (1..7)? Scores tᵢ = i; all
    //    five moments are one integer rollup over the bounded exposure
    //    axis; the closing χ² is a fixed scalar IEEE expression (every
    //    operand an exact BIGINT cast once to DOUBLE), identical tree in
    //    both engines.
    QueryDef("q_cochran_armitage",
      (s, d) => {
        val per = Tables.lineitem(s, d)
          .groupBy(col("l_linenumber").cast("long").as("t"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .as("r"))
        per.agg(sum(col("n")).as("nn"), sum(col("r")).as("rr"),
          sum(expr("t * n")).as("tn"), sum(expr("t * r")).as("tr"),
          sum(expr("t * t * n")).as("ttn"))
          .selectExpr("CAST(nn AS BIGINT) AS n_total",
            "CAST(rr AS BIGINT) AS n_success",
            "CAST(tr AS BIGINT) AS sum_t_succ",
            """CASE WHEN rr = 0 OR rr = nn
              |       OR nn * ttn - tn * tn = 0
              |     THEN CAST('0.0' AS DOUBLE)
              |     ELSE round(CAST(nn AS DOUBLE)
              |          * (CAST(nn AS DOUBLE) * CAST(tr AS DOUBLE)
              |             - CAST(rr AS DOUBLE) * CAST(tn AS DOUBLE))
              |          * (CAST(nn AS DOUBLE) * CAST(tr AS DOUBLE)
              |             - CAST(rr AS DOUBLE) * CAST(tn AS DOUBLE))
              |          / (CAST(rr AS DOUBLE)
              |             * CAST(nn - rr AS DOUBLE)
              |             * (CAST(nn AS DOUBLE) * CAST(ttn AS DOUBLE)
              |                - CAST(tn AS DOUBLE)
              |                  * CAST(tn AS DOUBLE))), 6)
              |END AS chi2""".stripMargin)
      },
      Some("""WITH per AS (SELECT CAST(l_linenumber AS BIGINT) AS t,
             |                   CAST(count(*) AS BIGINT) AS n,
             |                   CAST(sum(CASE WHEN l_returnflag = 'R'
             |                                 THEN 1 ELSE 0 END)
             |                     AS BIGINT) AS r
             |            FROM lineitem GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |             CAST(sum(r) AS BIGINT) AS rr,
             |             CAST(sum(t * n) AS BIGINT) AS tn,
             |             CAST(sum(t * r) AS BIGINT) AS tr,
             |             CAST(sum(t * t * n) AS BIGINT) AS ttn
             |      FROM per)
             |SELECT nn AS n_total, rr AS n_success, tr AS sum_t_succ,
             |       CASE WHEN rr = 0 OR rr = nn
             |              OR nn * ttn - tn * tn = 0
             |            THEN CAST('0.0' AS DOUBLE)
             |            ELSE round(CAST(nn AS DOUBLE)
             |                 * (CAST(nn AS DOUBLE) * CAST(tr AS DOUBLE)
             |                    - CAST(rr AS DOUBLE) * CAST(tn AS DOUBLE))
             |                 * (CAST(nn AS DOUBLE) * CAST(tr AS DOUBLE)
             |                    - CAST(rr AS DOUBLE) * CAST(tn AS DOUBLE))
             |                 / (CAST(rr AS DOUBLE)
             |                    * CAST(nn - rr AS DOUBLE)
             |                    * (CAST(nn AS DOUBLE) * CAST(ttn AS DOUBLE)
             |                       - CAST(tn AS DOUBLE)
             |                         * CAST(tn AS DOUBLE))), 6)
             |       END AS chi2
             |FROM t""".stripMargin))
  )
}
