package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-105 batch: three classical test statistics the evaluation layer
  * still lacked — Matthews correlation (the balanced single-number
  * confusion summary), Durbin–Watson (serial correlation of residuals,
  * the "is this time series actually i.i.d." gate the forecast-backtest
  * family assumes), and Cochran's Q (k-treatment extension of McNemar).
  *
  * Scale shape shared by all three: one keyed rollup over the raw table
  * (map-side partial agg), then all remaining arithmetic on a bounded
  * axis (a 2×2 table, a day spine, a 3-column margin row). Nothing
  * downstream of the first aggregate touches data-sized frames.
  */
object Round105Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Matthews correlation coefficient of the "click predicts
    //    purchase" classifier over per-user ever-did flags — the same
    //    2×2 table q_mcnemar reads the discordant cells of, summarized
    //    by the balance-robust coefficient. Integer confusion counts;
    //    the close multiplies four exact-long sqrt factors (each
    //    < 2^53 → IEEE-deterministic) in a fixed order.
    QueryDef("q_mcc",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
        .agg(sum(expr("CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END")).as("tp"),
          sum(expr("CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END")).as("fp"),
          sum(expr("CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END")).as("fn"),
          sum(expr("CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END")).as("tn"))
        .selectExpr("CAST(tp AS BIGINT) AS tp", "CAST(fp AS BIGINT) AS fp",
          "CAST(fn AS BIGINT) AS fn", "CAST(tn AS BIGINT) AS tn",
          """CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) = 0
            |     THEN CAST('0.0' AS DOUBLE)
            |     ELSE round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
            |            - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
            |          / (sqrt(CAST(tp + fp AS DOUBLE))
            |             * sqrt(CAST(tp + fn AS DOUBLE))
            |             * sqrt(CAST(tn + fp AS DOUBLE))
            |             * sqrt(CAST(tn + fn AS DOUBLE))), 6)
            |END AS mcc""".stripMargin),
      Some("""WITH u AS (SELECT user_id,
             |                  max(CASE WHEN event_type = 'click'
             |                      THEN 1 ELSE 0 END) AS x,
             |                  max(CASE WHEN event_type = 'purchase'
             |                      THEN 1 ELSE 0 END) AS y
             |           FROM events GROUP BY 1),
             |c AS (SELECT
             |        CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END)
             |          AS BIGINT) AS tp,
             |        CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
             |          AS BIGINT) AS fp,
             |        CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
             |          AS BIGINT) AS fn,
             |        CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
             |          AS BIGINT) AS tn
             |      FROM u)
             |SELECT tp, fp, fn, tn,
             |       CASE WHEN (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) = 0
             |            THEN CAST('0.0' AS DOUBLE)
             |            ELSE round((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
             |                   - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
             |                 / (sqrt(CAST(tp + fp AS DOUBLE))
             |                    * sqrt(CAST(tp + fn AS DOUBLE))
             |                    * sqrt(CAST(tn + fp AS DOUBLE))
             |                    * sqrt(CAST(tn + fn AS DOUBLE))), 6)
             |       END AS mcc
             |FROM c""".stripMargin)),

    // ── Durbin–Watson on daily order volumes demeaned the n-scaled way
    //    (z = n·c − S keeps residuals integer; DW is scale-invariant so
    //    the n factor cancels). DW = Σ(z_t − z_{t−1})² / Σz² over the
    //    day spine; both moments accumulate in decimal(38,0)/HUGEINT.
    //    The unpartitioned lag window rides the POST-AGGREGATE day axis
    //    (≤ ~2.4k rows at any SF — one row per calendar day, bounded by
    //    the 7-year order horizon, not by data volume).
    QueryDef("q_durbin_watson",
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.orders(s, d)
          .select(expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            .as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
        daily.crossJoin(broadcast(tot))
          .withColumn("z", expr(s"CAST(n * c - s AS $dec)"))
          .withColumn("zp", lag(col("z"), 1).over(Window.orderBy(col("day"))))
          .agg(max(col("n")).as("nd"),
            sum(expr("CASE WHEN zp IS NULL THEN CAST(0 AS " + dec +
              ") ELSE (z - zp) * (z - zp) END")).as("num"),
            sum(expr("z * z")).as("den"))
          .selectExpr("CAST(nd AS BIGINT) AS n_days",
            """round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
              |AS dw""".stripMargin)
      },
      Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
             |                        AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM orders GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(c) AS BIGINT) AS s FROM daily),
             |z AS (SELECT day, n,
             |             CAST(n * c - s AS HUGEINT) AS z
             |      FROM daily CROSS JOIN tot),
             |l AS (SELECT day, n, z,
             |             lag(z, 1) OVER (ORDER BY day) AS zp
             |      FROM z),
             |m AS (SELECT max(n) AS nd,
             |             sum(CASE WHEN zp IS NULL THEN CAST(0 AS HUGEINT)
             |                 ELSE (z - zp) * (z - zp) END) AS num,
             |             sum(z * z) AS den
             |      FROM l)
             |SELECT CAST(nd AS BIGINT) AS n_days,
             |       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
             |         AS dw
             |FROM m""".stripMargin)),

    // ── Cochran's Q across k = 3 within-user binary "treatments"
    //    (ever viewed / clicked / purchased) — the k-way McNemar. With
    //    column totals C_j and row sums R_i:
    //    Q = (k−1)·(k·ΣC² − (ΣC)²) / (k·ΣR − ΣR²). The numerator is
    //    ≥ 0 by Cauchy–Schwarz, so the truncating ·1e6 division is
    //    engine-identical without sign-factoring; the denominator
    //    Σ R(k−R) is ≥ 0 and floored at 1.
    QueryDef("q_cochran_q",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("x1"),
          max(when(col("event_type") === "click", 1L).otherwise(0L)).as("x2"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("x3"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("x1")).as("c1"), sum(col("x2")).as("c2"),
          sum(col("x3")).as("c3"),
          sum(expr("(x1 + x2 + x3) * (3 - x1 - x2 - x3)")).as("rden"))
        .selectExpr("CAST(n_users AS BIGINT) AS n_users",
          "CAST(c1 AS BIGINT) AS c_view", "CAST(c2 AS BIGINT) AS c_click",
          "CAST(c3 AS BIGINT) AS c_purchase",
          """2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
            |     - (c1 + c2 + c3) * (c1 + c2 + c3)) * 1000000
            |  div greatest(rden, 1) AS q_e6""".stripMargin),
      Some("""WITH u AS (SELECT user_id,
             |                  max(CASE WHEN event_type = 'view'
             |                      THEN 1 ELSE 0 END) AS x1,
             |                  max(CASE WHEN event_type = 'click'
             |                      THEN 1 ELSE 0 END) AS x2,
             |                  max(CASE WHEN event_type = 'purchase'
             |                      THEN 1 ELSE 0 END) AS x3
             |           FROM events GROUP BY 1),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
             |             CAST(sum(x1) AS BIGINT) AS c1,
             |             CAST(sum(x2) AS BIGINT) AS c2,
             |             CAST(sum(x3) AS BIGINT) AS c3,
             |             CAST(sum((x1 + x2 + x3) * (3 - x1 - x2 - x3))
             |               AS BIGINT) AS rden
             |      FROM u)
             |SELECT n_users, c1 AS c_view, c2 AS c_click, c3 AS c_purchase,
             |       2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3)
             |            - (c1 + c2 + c3) * (c1 + c2 + c3)) * 1000000
             |         // greatest(rden, 1) AS q_e6
             |FROM m""".stripMargin))
  )
}
