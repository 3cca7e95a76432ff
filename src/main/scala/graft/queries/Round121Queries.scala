package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-121 batch: lead-lag causality screening (Granger-lite — does
  * yesterday's event volume predict today's orders beyond the orders'
  * own history?), Cliff's delta (the ordinal effect size that reports
  * HOW MUCH two groups differ after q_mann_whitney says they do), and
  * unit-price dispersion across suppliers per part (the procurement
  * screen for quote spread). Heavy moment products ride decimal(38,0)/
  * HUGEINT exactly; only the final F/ratio closes in (deterministic,
  * identically-shaped) IEEE trees.
  */
object Round121Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Granger-lite on the shared day axis: restricted model
    //    y_t ~ y_{t−1} vs full y_t ~ y_{t−1} + x_{t−1} (x = events/day,
    //    y = orders/day), both via exact centered moments. SSE·scale
    //    products are exact decimal(38,0) integers (SSE1·S11 and
    //    SSE2·D); F = (n−3)(SSE1−SSE2)/SSE2 closes through doubles of
    //    those exact integers — identical trees both engines.
    QueryDef("q_granger_lite",
      (s, d) => {
        val dec = "decimal(38,0)"
        val oy = Tables.orders(s, d)
          .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
            "div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("y"))
        val ex = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
        // inner join on day; lags on the shared observed axis
        val w = Window.orderBy(col("day"))
        val ser = oy.join(ex, "day")
          .withColumn("y1", lag(col("y"), 1).over(w))
          .withColumn("x1", lag(col("x"), 1).over(w))
          .filter(col("y1").isNotNull)
          .select(col("y"), col("y1"), col("x1"))
          .localCheckpoint(false) // one moment rollup
        val m = ser.agg(count(lit(1)).as("n"),
          sum(col("y")).as("sy"), sum(col("y1")).as("s1"),
          sum(col("x1")).as("s2"), sum(expr("y * y")).as("syy"),
          sum(expr("y1 * y1")).as("s11r"), sum(expr("x1 * x1")).as("s22r"),
          sum(expr("y1 * x1")).as("s12r"), sum(expr("y * y1")).as("sy1r"),
          sum(expr("y * x1")).as("sy2r"))
        m.selectExpr("CAST(n AS BIGINT) AS n",
            s"CAST(n AS $dec) * CAST(syy AS $dec) - CAST(sy AS $dec) * CAST(sy AS $dec) AS cyy",
            s"CAST(n AS $dec) * CAST(s11r AS $dec) - CAST(s1 AS $dec) * CAST(s1 AS $dec) AS c11",
            s"CAST(n AS $dec) * CAST(s22r AS $dec) - CAST(s2 AS $dec) * CAST(s2 AS $dec) AS c22",
            s"CAST(n AS $dec) * CAST(s12r AS $dec) - CAST(s1 AS $dec) * CAST(s2 AS $dec) AS c12",
            s"CAST(n AS $dec) * CAST(sy1r AS $dec) - CAST(sy AS $dec) * CAST(s1 AS $dec) AS cy1",
            s"CAST(n AS $dec) * CAST(sy2r AS $dec) - CAST(sy AS $dec) * CAST(s2 AS $dec) AS cy2")
          // SSE1·c11 = cyy·c11 − cy1²; D = c11·c22 − c12²;
          // SSE2·D = cyy·D − c22·cy1² + 2·c12·cy1·cy2 − c11·cy2²
          .selectExpr("n",
            "CAST(cyy * c11 - cy1 * cy1 AS DOUBLE) AS sse1_s",
            "CAST(c11 * c22 - c12 * c12 AS DOUBLE) AS dd",
            "CAST(c11 AS DOUBLE) AS c11d",
            """CAST(cyy * (c11 * c22 - c12 * c12) - c22 * cy1 * cy1
              |  + 2 * c12 * cy1 * cy2 - c11 * cy2 * cy2
              |  AS DOUBLE) AS sse2_s""".stripMargin)
          .selectExpr("n",
            """CASE WHEN sse2_s <= CAST('0.0' AS DOUBLE)
              |       OR dd <= CAST('0.0' AS DOUBLE)
              |       OR c11d <= CAST('0.0' AS DOUBLE)
              |     THEN CAST('0.0' AS DOUBLE)
              |     ELSE round(CAST(n - 3 AS DOUBLE)
              |          * (sse1_s / c11d - sse2_s / dd)
              |          / (sse2_s / dd), 6)
              |END AS f_stat""".stripMargin)
      },
      Some("""WITH oy AS (SELECT epoch_us(o_orderdate) // 86400000000
             |                     AS day,
             |                  CAST(count(*) AS BIGINT) AS y
             |           FROM orders GROUP BY 1),
             |ex AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |              CAST(count(*) AS BIGINT) AS x
             |       FROM events GROUP BY 1),
             |ser0 AS (SELECT oy.day, y, x FROM oy JOIN ex USING (day)),
             |ser AS (SELECT y,
             |               lag(y) OVER (ORDER BY day) AS y1,
             |               lag(x) OVER (ORDER BY day) AS x1
             |        FROM ser0),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(y) AS HUGEINT) AS sy,
             |             CAST(sum(y1) AS HUGEINT) AS s1,
             |             CAST(sum(x1) AS HUGEINT) AS s2,
             |             CAST(sum(y * y) AS HUGEINT) AS syy,
             |             CAST(sum(y1 * y1) AS HUGEINT) AS s11r,
             |             CAST(sum(x1 * x1) AS HUGEINT) AS s22r,
             |             CAST(sum(y1 * x1) AS HUGEINT) AS s12r,
             |             CAST(sum(y * y1) AS HUGEINT) AS sy1r,
             |             CAST(sum(y * x1) AS HUGEINT) AS sy2r
             |      FROM ser WHERE y1 IS NOT NULL),
             |c AS (SELECT n,
             |             n * syy - sy * sy AS cyy,
             |             n * s11r - s1 * s1 AS c11,
             |             n * s22r - s2 * s2 AS c22,
             |             n * s12r - s1 * s2 AS c12,
             |             n * sy1r - sy * s1 AS cy1,
             |             n * sy2r - sy * s2 AS cy2
             |      FROM m),
             |f AS (SELECT n,
             |             CAST(cyy * c11 - cy1 * cy1 AS DOUBLE) AS sse1_s,
             |             CAST(c11 * c22 - c12 * c12 AS DOUBLE) AS dd,
             |             CAST(c11 AS DOUBLE) AS c11d,
             |             CAST(cyy * (c11 * c22 - c12 * c12)
             |                  - c22 * cy1 * cy1
             |                  + 2 * c12 * cy1 * cy2
             |                  - c11 * cy2 * cy2 AS DOUBLE) AS sse2_s
             |      FROM c)
             |SELECT n,
             |       CASE WHEN sse2_s <= CAST('0.0' AS DOUBLE)
             |              OR dd <= CAST('0.0' AS DOUBLE)
             |              OR c11d <= CAST('0.0' AS DOUBLE)
             |            THEN CAST('0.0' AS DOUBLE)
             |            ELSE round(CAST(n - 3 AS DOUBLE)
             |                 * (sse1_s / c11d - sse2_s / dd)
             |                 / (sse2_s / dd), 6)
             |       END AS f_stat
             |FROM f""".stripMargin)),

    // ── Cliff's delta between priorities 1 and 2 on monthly volumes:
    //    δ = (#(x₁>x₂) − #(x₁<x₂))/(n·m) over the bounded cross grid,
    //    sign-factored e6 close plus the standard |δ| magnitude label
    //    (negligible/small/medium/large at 0.147/0.33/0.474).
    QueryDef("q_cliffs_delta",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .filter(substring(col("o_orderpriority"), 1, 1).isin("1", "2"))
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // both sides of the cross grid
        val a = cell.filter(col("g") === "1")
          .select(col("x").as("xa"))
        val b = cell.filter(col("g") === "2")
          .select(col("x").as("xb"))
        a.crossJoin(b)
          .agg(count(lit(1)).as("nm"),
            sum(when(col("xa") > col("xb"), 1L).otherwise(0L)).as("gt"),
            sum(when(col("xa") < col("xb"), 1L).otherwise(0L)).as("lt"))
          .selectExpr("CAST(nm AS BIGINT) AS n_pairs",
            "CAST(gt AS BIGINT) AS n_gt", "CAST(lt AS BIGINT) AS n_lt",
            """CASE WHEN gt >= lt THEN (gt - lt) * 1000000 div nm
              |ELSE -((lt - gt) * 1000000 div nm)
              |END AS delta_e6""".stripMargin)
          .selectExpr("n_pairs", "n_gt", "n_lt", "delta_e6",
            """CASE WHEN abs(delta_e6) < 147000 THEN 'negligible'
              |WHEN abs(delta_e6) < 330000 THEN 'small'
              |WHEN abs(delta_e6) < 474000 THEN 'medium'
              |ELSE 'large' END AS magnitude""".stripMargin)
      },
      Some("""WITH cell AS (SELECT substring(o_orderpriority, 1, 1) AS g,
             |                    year(o_orderdate) * 100
             |                      + month(o_orderdate) AS mo,
             |                    CAST(count(*) AS BIGINT) AS x
             |             FROM orders
             |             WHERE substring(o_orderpriority, 1, 1)
             |                     IN ('1', '2')
             |             GROUP BY 1, 2),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS nm,
             |             CAST(sum(CASE WHEN a.x > b.x THEN 1 ELSE 0
             |               END) AS BIGINT) AS gt,
             |             CAST(sum(CASE WHEN a.x < b.x THEN 1 ELSE 0
             |               END) AS BIGINT) AS lt
             |      FROM (SELECT x FROM cell WHERE g = '1') a
             |      CROSS JOIN (SELECT x FROM cell WHERE g = '2') b),
             |r AS (SELECT nm AS n_pairs, gt AS n_gt, lt AS n_lt,
             |             CASE WHEN gt >= lt
             |                    THEN (gt - lt) * 1000000 // nm
             |                  ELSE -((lt - gt) * 1000000 // nm)
             |             END AS delta_e6
             |      FROM t)
             |SELECT n_pairs, n_gt, n_lt, delta_e6,
             |       CASE WHEN abs(delta_e6) < 147000 THEN 'negligible'
             |            WHEN abs(delta_e6) < 330000 THEN 'small'
             |            WHEN abs(delta_e6) < 474000 THEN 'medium'
             |            ELSE 'large' END AS magnitude
             |FROM r""".stripMargin)),

    // ── Unit-price dispersion per part across its suppliers: mean unit
    //    price per (part, supplier) in exact cents-per-unit e2 (price
    //    cents ×100 div qty), then the across-supplier CV in e6 from
    //    integer moments — top 20 parts (≥3 suppliers) by CV. One
    //    lineitem rollup; the part axis carries everything after.
    QueryDef("q_price_dispersion",
      (s, d) => {
        val unit = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long")
              .as("cents"),
            col("l_quantity").cast("long").as("qty"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("cents")).as("sc"), sum(col("qty")).as("sq"))
          .select(col("l_partkey"),
            expr("sc * 100 div sq").as("up"))
        val per = unit.groupBy(col("l_partkey"))
          // suu rides decimal(38,0): up ~ 1e8 e2-cents, so sum(up²) nears
          // int64 at sf0.1 and overflows at 100× — widen BEFORE the sum.
          .agg(count(lit(1)).as("ns"), sum(col("up")).as("su"),
            sum(expr("CAST(up AS DECIMAL(38,0)) * up")).as("suu"))
          .filter(col("ns") >= 3)
        per
          .withColumn("cv_e6", expr(
            """CASE WHEN su = 0 THEN 0
              |ELSE CAST(round(sqrt(CAST(ns AS DOUBLE)
              |       * CAST(CAST(ns AS DECIMAL(38,0)) * suu
              |              - CAST(su AS DECIMAL(38,0)) * su AS DOUBLE))
              |     / CAST(su AS DOUBLE)
              |     * CAST('1000000' AS DOUBLE), 0) AS BIGINT)
              |END""".stripMargin))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cv_e6").desc, col("l_partkey"))))
          .filter(col("rk") <= 20)
          .selectExpr("l_partkey AS partkey",
            "CAST(ns AS BIGINT) AS n_suppliers",
            "su div ns AS mean_unit_e2", "cv_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH unit AS (
             |  SELECT l_partkey, l_suppkey,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) * 100
             |           // CAST(sum(CAST(l_quantity AS BIGINT))
             |                AS BIGINT) AS up
             |  FROM lineitem GROUP BY 1, 2),
             |per AS (SELECT l_partkey,
             |               CAST(count(*) AS BIGINT) AS ns,
             |               CAST(sum(up) AS BIGINT) AS su,
             |               sum(CAST(up AS HUGEINT) * up) AS suu
             |        FROM unit GROUP BY 1 HAVING count(*) >= 3),
             |cv AS (SELECT l_partkey, ns, su,
             |              CASE WHEN su = 0 THEN 0
             |                   ELSE CAST(round(sqrt(CAST(ns AS DOUBLE)
             |                          * CAST(CAST(ns AS HUGEINT) * suu
             |                                 - CAST(su AS HUGEINT) * su
             |                              AS DOUBLE))
             |                        / CAST(su AS DOUBLE)
             |                        * CAST('1000000' AS DOUBLE), 0)
             |                     AS BIGINT)
             |              END AS cv_e6
             |       FROM per)
             |SELECT l_partkey AS partkey, ns AS n_suppliers,
             |       su // ns AS mean_unit_e2, cv_e6, rk
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY cv_e6 DESC,
             |        l_partkey) AS BIGINT) AS rk
             |      FROM cv)
             |WHERE rk <= 20""".stripMargin))
  )
}
