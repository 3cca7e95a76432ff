package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-107 batch: the robust-estimation trio the rank-test family
  * (q_mann_whitney, q_wilcoxon_signed, q_siegel_slope) still lacked —
  * Hodges–Lehmann location shift (the estimator dual of the rank tests),
  * Mood's median test (the distribution-free two-sample gate), and the
  * one-way intraclass correlation (how much of order-value variance is
  * BETWEEN nations — the clustering-strength number a stratified sampler
  * needs before trusting per-stratum allocations).
  *
  * Scale shape: every pairwise/walk step rides the calendar-bounded
  * 30-day axis or the 25-nation axis; raw tables are touched exactly
  * once each by a keyed rollup.
  */
object Round107Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Hodges–Lehmann two-sample shift: the lower median of all
    //    nx·ny pairwise differences between daily click and view
    //    volumes. The pair grid is 30×30 (calendar-bounded at any SF),
    //    so the exact all-pairs form is the right plan — no need for
    //    the binary-search-on-ranks form until the axis itself grows.
    //    Nearest-rank (lower) median keeps everything integer.
    QueryDef("q_hodges_lehmann",
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .select(col("event_type").as("et"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("et"), col("day")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // both sides of the 30×30 pair grid
        val x = daily.filter(col("et") === "click")
          .select(col("c").as("cx"))
        val y = daily.filter(col("et") === "view")
          .select(col("c").as("cy"))
        val pairs = x.crossJoin(y).select((col("cx") - col("cy")).as("diff"))
        val n = pairs.agg(count(lit(1)).as("n_pairs"))
        pairs.crossJoin(broadcast(n))
          .withColumn("rk", row_number().over(Window.orderBy(col("diff"))))
          .filter(col("rk") === expr("CAST((n_pairs + 1) div 2 AS INT)"))
          .selectExpr("CAST(n_pairs AS BIGINT) AS n_pairs",
            "CAST(diff AS BIGINT) AS hl_shift")
      },
      Some("""WITH daily AS (SELECT event_type AS et,
             |                      epoch_us(ts) // 86400000000 AS day,
             |                      CAST(count(*) AS BIGINT) AS c
             |               FROM events
             |               WHERE event_type IN ('click', 'view')
             |               GROUP BY 1, 2),
             |pairs AS (SELECT x.c - y.c AS diff
             |          FROM (SELECT c FROM daily WHERE et = 'click') x
             |          CROSS JOIN (SELECT c FROM daily WHERE et = 'view') y),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
             |r AS (SELECT diff, n_pairs,
             |             row_number() OVER (ORDER BY diff) AS rk
             |      FROM pairs CROSS JOIN n)
             |SELECT n_pairs, CAST(diff AS BIGINT) AS hl_shift
             |FROM r WHERE rk = (n_pairs + 1) // 2""".stripMargin)),

    // ── Mood's median test between daily click and view volumes: split
    //    every sample at the COMBINED lower median, then Pearson χ² on
    //    the resulting 2×2 (group × above/not-above). All integer —
    //    the squared numerator is sign-safe for the truncating ·1e6
    //    division; denominator margins floored at 1.
    QueryDef("q_mood_median",
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .select(col("event_type").as("et"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("et"), col("day")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // median walk + the 2×2 rollup
        val n = daily.agg(count(lit(1)).as("n_all"))
        val med = daily.crossJoin(broadcast(n))
          .withColumn("rk", row_number().over(Window.orderBy(col("c"))))
          .filter(col("rk") === expr("CAST((n_all + 1) div 2 AS INT)"))
          .select(col("c").as("m"))
        daily.crossJoin(broadcast(med))
          .agg(sum(expr("CASE WHEN et = 'click' AND c > m THEN 1 ELSE 0 END"))
              .as("a"),
            sum(expr("CASE WHEN et = 'click' AND c <= m THEN 1 ELSE 0 END"))
              .as("b"),
            sum(expr("CASE WHEN et = 'view' AND c > m THEN 1 ELSE 0 END"))
              .as("cc"),
            sum(expr("CASE WHEN et = 'view' AND c <= m THEN 1 ELSE 0 END"))
              .as("dd"))
          .selectExpr("CAST(a AS BIGINT) AS n_click_above",
            "CAST(b AS BIGINT) AS n_click_below",
            "CAST(cc AS BIGINT) AS n_view_above",
            "CAST(dd AS BIGINT) AS n_view_below",
            """(a + b + cc + dd) * (a * dd - b * cc) * (a * dd - b * cc)
              |  * 1000000
              |  div greatest((a + b) * (cc + dd) * (a + cc) * (b + dd), 1)
              |  AS chi2_e6""".stripMargin)
      },
      Some("""WITH daily AS (SELECT event_type AS et,
             |                      epoch_us(ts) // 86400000000 AS day,
             |                      CAST(count(*) AS BIGINT) AS c
             |               FROM events
             |               WHERE event_type IN ('click', 'view')
             |               GROUP BY 1, 2),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM daily),
             |r AS (SELECT c, n_all,
             |             row_number() OVER (ORDER BY c) AS rk
             |      FROM daily CROSS JOIN n),
             |med AS (SELECT c AS m FROM r WHERE rk = (n_all + 1) // 2),
             |cells AS (SELECT
             |    CAST(sum(CASE WHEN et = 'click' AND c > m
             |        THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |    CAST(sum(CASE WHEN et = 'click' AND c <= m
             |        THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(sum(CASE WHEN et = 'view' AND c > m
             |        THEN 1 ELSE 0 END) AS BIGINT) AS cc,
             |    CAST(sum(CASE WHEN et = 'view' AND c <= m
             |        THEN 1 ELSE 0 END) AS BIGINT) AS dd
             |  FROM daily CROSS JOIN med)
             |SELECT a AS n_click_above, b AS n_click_below,
             |       cc AS n_view_above, dd AS n_view_below,
             |       (a + b + cc + dd) * (a * dd - b * cc)
             |         * (a * dd - b * cc) * 1000000
             |         // greatest((a + b) * (cc + dd) * (a + cc) * (b + dd),
             |                     1) AS chi2_e6
             |FROM cells""".stripMargin)),

    // ── One-way intraclass correlation ICC(1,1) of whole-dollar order
    //    values within nations: (MSB − MSW)/(MSB + (k0−1)·MSW) with the
    //    unbalanced-design group size k0 = (N − Σn²/N)/(J−1). Sums of
    //    squares follow the q_anova convention exactly — exact long
    //    moments per nation, the S²/n correction terms rounded through
    //    one deterministic IEEE double product — then the ICC close is
    //    a fixed-order double expression shared by both engines.
    QueryDef("q_icc",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("g"),
            expr("CAST(floor(o_totalprice + 0.5) AS BIGINT)").as("x"))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"),
            sum(expr("x * x")).as("q_g"))
          .withColumn("term_c2", expr(
            """CAST(floor(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
              |  / CAST(n_g AS DOUBLE) + CAST('0.5' AS DOUBLE)) AS BIGINT)"""
              .stripMargin))
        cells
          .agg(count(lit(1)).as("j"), sum(col("n_g")).as("n"),
            sum(col("s_g")).as("s"), sum(col("q_g")).as("q"),
            sum(col("term_c2")).as("ssb_raw"),
            sum(expr("n_g * n_g")).as("sn2"))
          .selectExpr("CAST(j AS BIGINT) AS j", "CAST(n AS BIGINT) AS n",
            """CAST(ssb_raw - CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              |  / CAST(n AS DOUBLE) + CAST('0.5' AS DOUBLE)) AS BIGINT)
              |  AS BIGINT) AS ssb""".stripMargin,
            "CAST(q - ssb_raw AS BIGINT) AS ssw",
            """round(((CAST(ssb_raw AS DOUBLE)
              |    - floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              |            / CAST(n AS DOUBLE) + CAST('0.5' AS DOUBLE)))
              |   / CAST(j - 1 AS DOUBLE)
              |  - CAST(q - ssb_raw AS DOUBLE) / CAST(n - j AS DOUBLE))
              | / ((CAST(ssb_raw AS DOUBLE)
              |    - floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
              |            / CAST(n AS DOUBLE) + CAST('0.5' AS DOUBLE)))
              |   / CAST(j - 1 AS DOUBLE)
              |  + ((CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE)
              |      / CAST(n AS DOUBLE)) / CAST(j - 1 AS DOUBLE)
              |     - CAST('1.0' AS DOUBLE))
              |    * CAST(q - ssb_raw AS DOUBLE) / CAST(n - j AS DOUBLE)),
              | 6) AS icc""".stripMargin)
      },
      Some("""WITH cells AS (SELECT c_nationkey AS g,
             |                      CAST(count(*) AS BIGINT) AS n_g,
             |                      CAST(sum(CAST(floor(o_totalprice + 0.5)
             |                        AS BIGINT)) AS BIGINT) AS s_g,
             |                      CAST(sum(CAST(floor(o_totalprice + 0.5)
             |                          AS BIGINT)
             |                        * CAST(floor(o_totalprice + 0.5)
             |                          AS BIGINT)) AS BIGINT) AS q_g
             |               FROM orders
             |               JOIN customer ON o_custkey = c_custkey
             |               GROUP BY 1),
             |t AS (SELECT n_g, s_g, q_g,
             |             CAST(floor(CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE)
             |               / CAST(n_g AS DOUBLE) + CAST('0.5' AS DOUBLE))
             |               AS BIGINT) AS term_c2
             |      FROM cells),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS j,
             |             CAST(sum(n_g) AS BIGINT) AS n,
             |             CAST(sum(s_g) AS BIGINT) AS s,
             |             CAST(sum(q_g) AS BIGINT) AS q,
             |             CAST(sum(term_c2) AS BIGINT) AS ssb_raw,
             |             CAST(sum(n_g * n_g) AS BIGINT) AS sn2
             |      FROM t)
             |SELECT j, n,
             |       CAST(ssb_raw - CAST(floor(CAST(s AS DOUBLE)
             |           * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             |           + CAST('0.5' AS DOUBLE)) AS BIGINT) AS BIGINT)
             |         AS ssb,
             |       CAST(q - ssb_raw AS BIGINT) AS ssw,
             |       round(((CAST(ssb_raw AS DOUBLE)
             |            - floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |                    / CAST(n AS DOUBLE)
             |                    + CAST('0.5' AS DOUBLE)))
             |           / CAST(j - 1 AS DOUBLE)
             |          - CAST(q - ssb_raw AS DOUBLE)
             |            / CAST(n - j AS DOUBLE))
             |         / ((CAST(ssb_raw AS DOUBLE)
             |            - floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |                    / CAST(n AS DOUBLE)
             |                    + CAST('0.5' AS DOUBLE)))
             |           / CAST(j - 1 AS DOUBLE)
             |          + ((CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE)
             |              / CAST(n AS DOUBLE)) / CAST(j - 1 AS DOUBLE)
             |             - CAST('1.0' AS DOUBLE))
             |            * CAST(q - ssb_raw AS DOUBLE)
             |            / CAST(n - j AS DOUBLE)), 6) AS icc
             |FROM m""".stripMargin))
  )
}
