package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-150 batch: supply-chain planning trio — hierarchical forecast
  * reconciliation (bottom-up vs top-down over the nation→region tree:
  * the coherence problem every rollup-forecast pipeline hits),
  * safety-stock / reorder-point sizing (exact nearest-rank p95 of
  * calendar 7-day lead-time demand), and cross-price elasticity
  * (month-over-month percent-change regression between brand pairs —
  * own- and cross-price effects from one construction).
  *
  * All-integer: cents, e6 shares/elasticities, sign-factored
  * truncating division, nearest-rank percentiles via
  * ceil(95n/100) = (95n+99) div 100 — identical formulas both engines.
  *
  * Scale notes: reconciliation and elasticity aggregate facts to
  * fixed-cardinality axes (nation×year, brand×month) before any join;
  * safety stock's sliding sum is a RANGE frame over each brand's
  * bounded day axis.
  */
object Round150Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Hierarchical reconciliation: naive seasonal forecast for 1997
    //    = 1996 actuals. Bottom-up: nation forecast as-is. Top-down:
    //    region 1996 total redistributed by each nation's 1996 share.
    //    Emit both forecasts + absolute errors vs 1997 actuals — the
    //    coherent-by-construction pair every hierarchy reconciler
    //    compares.
    QueryDef("q_forecast_reconcile",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(expr("year(l_shipdate) IN (1996, 1997)"))
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_nationkey").as("nk"),
            col("n_regionkey").as("rk"))
          .agg(sum(when(expr("year(l_shipdate) = 1996"),
            expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
            .otherwise(0L)).as("y96"),
            sum(when(expr("year(l_shipdate) = 1997"),
              expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"))
              .otherwise(0L)).as("y97"))
        val reg = rev.groupBy(col("rk"))
          .agg(sum(col("y96")).as("r96"))
        rev.join(broadcast(reg), "rk")
          .selectExpr("CAST(nk AS BIGINT) AS nationkey",
            "CAST(rk AS BIGINT) AS regionkey",
            "y97 AS actual_cents", "y96 AS f_bu_cents",
            "r96 * (y96 * 1000000 div greatest(1L, r96)) div 1000000 AS f_td_cents",
            "abs(y97 - y96) AS err_bu_cents",
            "abs(y97 - r96 * (y96 * 1000000 div greatest(1L, r96)) div 1000000) AS err_td_cents")
      },
      Some("""WITH rev AS (
             |  SELECT s.s_nationkey AS nk, n.n_regionkey AS rk,
             |         CAST(sum(CASE WHEN year(l.l_shipdate) = 1996
             |           THEN CAST(floor(l.l_extendedprice * 100 + 0.5)
             |             AS BIGINT) ELSE 0 END) AS BIGINT) AS y96,
             |         CAST(sum(CASE WHEN year(l.l_shipdate) = 1997
             |           THEN CAST(floor(l.l_extendedprice * 100 + 0.5)
             |             AS BIGINT) ELSE 0 END) AS BIGINT) AS y97
             |  FROM lineitem l
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  JOIN nation n ON s.s_nationkey = n.n_nationkey
             |  WHERE year(l.l_shipdate) IN (1996, 1997)
             |  GROUP BY 1, 2),
             |reg AS (SELECT rk, CAST(sum(y96) AS BIGINT) AS r96
             |        FROM rev GROUP BY 1)
             |SELECT CAST(nk AS BIGINT) AS nationkey,
             |       CAST(rk AS BIGINT) AS regionkey,
             |       y97 AS actual_cents, y96 AS f_bu_cents,
             |       r96 * (y96 * 1000000 // greatest(1, r96)) // 1000000 AS f_td_cents,
             |       abs(y97 - y96) AS err_bu_cents,
             |       abs(y97 - r96 * (y96 * 1000000 // greatest(1, r96)) // 1000000)
             |         AS err_td_cents
             |FROM rev JOIN reg USING (rk)""".stripMargin)),

    // ── Safety stock: per brand, calendar 7-day lead-time demand via a
    //    RANGE frame over the day axis (missing days contribute 0 by
    //    construction), complete windows only (day ≤ max_day − 6);
    //    reorder point = exact nearest-rank p95; safety stock =
    //    p95 − mean. Windows ride each brand's bounded day axis.
    QueryDef("q_safety_stock",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
              .as("day"),
            expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"))
          .groupBy(col("brand"), col("day")).agg(sum(col("q")).as("dq"))
        val lead = Window.partitionBy(col("brand")).orderBy(col("day"))
          .rangeBetween(0, 6)
        val wnd = daily
          .withColumn("d7", sum(col("dq")).over(lead))
          .withColumn("max_day",
            max(col("day")).over(Window.partitionBy(col("brand"))))
          .filter(col("day") <= col("max_day") - 6)
        val ranked = wnd
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("brand")).orderBy(col("d7"), col("day"))))
        val stats = wnd.groupBy(col("brand"))
          .agg(count(lit(1)).as("n"), sum(col("d7")).as("s7"))
        ranked.join(stats, "brand")
          .filter(col("rk") === expr("(95 * n + 99) div 100"))
          .selectExpr("brand", "CAST(n AS BIGINT) AS n_windows",
            "s7 div n AS mean7_qty", "d7 AS rop_p95_qty",
            "d7 - s7 div n AS safety_qty")
      },
      Some("""WITH daily AS (
             |  SELECT p.p_brand AS brand,
             |         epoch_us(l.l_shipdate) // 86400000000 AS day,
             |         CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT))
             |           AS BIGINT) AS dq
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |  GROUP BY 1, 2),
             |wnd AS (
             |  SELECT brand, day,
             |         CAST(sum(dq) OVER (PARTITION BY brand ORDER BY day
             |           RANGE BETWEEN CURRENT ROW AND 6 FOLLOWING)
             |           AS BIGINT) AS d7,
             |         max(day) OVER (PARTITION BY brand) AS max_day
             |  FROM daily),
             |cw AS (SELECT brand, day, d7 FROM wnd
             |       WHERE day <= max_day - 6),
             |rk AS (SELECT brand, d7,
             |         CAST(row_number() OVER (PARTITION BY brand
             |           ORDER BY d7, day) AS BIGINT) AS rk
             |       FROM cw),
             |st AS (SELECT brand, CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(d7) AS BIGINT) AS s7
             |       FROM cw GROUP BY 1)
             |SELECT rk.brand, st.n AS n_windows,
             |       st.s7 // st.n AS mean7_qty,
             |       rk.d7 AS rop_p95_qty,
             |       rk.d7 - st.s7 // st.n AS safety_qty
             |FROM rk JOIN st ON rk.brand = st.brand
             |WHERE rk.rk = (95 * st.n + 99) // 100""".stripMargin)),

    // ── Cross-price elasticity: top-3 brands by revenue; per ordered
    //    pair (A, B), regress A's month-over-month quantity percent
    //    change (e6) on B's average-price percent change (e6) through
    //    the origin: slope = Σxy // max(1, Σx² // 1e6). The A=B
    //    diagonal is own-price elasticity. Fixed 3×3 pair axis — the
    //    cross join never touches fact-table cardinality.
    QueryDef("q_cross_elasticity",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.lineitem(s, d)
          .filter(expr("year(l_shipdate) IN (1996, 1997)"))
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            expr("(year(l_shipdate) - 1996) * 12 + month(l_shipdate) - 1")
              .as("m"),
            expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("q"),
            expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
              .as("c"))
        val top = base.groupBy(col("brand")).agg(sum(col("c")).as("rev"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rev").desc, col("brand"))))
          .filter(col("rk") <= 3).select(col("brand"))
        val monthly = base.join(broadcast(top), "brand")
          .groupBy(col("brand"), col("m"))
          .agg(sum(col("q")).as("mq"),
            expr("sum(c) div sum(q)").as("avg_price"))
        val w = Window.partitionBy(col("brand")).orderBy(col("m"))
        val chg = monthly
          .withColumn("pq", lag(col("mq"), 1).over(w))
          .withColumn("pp", lag(col("avg_price"), 1).over(w))
          .filter(col("pq").isNotNull && col("pq") > 0L && col("pp") > 0L)
          .selectExpr("brand", "m",
            """CASE WHEN mq >= pq THEN (mq - pq) * 1000000 div pq
              |ELSE -((pq - mq) * 1000000 div pq) END AS dq_e6""".stripMargin,
            """CASE WHEN avg_price >= pp
              |THEN (avg_price - pp) * 1000000 div pp
              |ELSE -((pp - avg_price) * 1000000 div pp) END AS dp_e6"""
              .stripMargin)
        chg.select(col("brand").as("brand_a"), col("m"), col("dq_e6"))
          .join(chg.select(col("brand").as("brand_b"), col("m"),
            col("dp_e6")), "m")
          .groupBy(col("brand_a"), col("brand_b"))
          .agg(count(lit(1)).as("n_months"),
            sum(col("dq_e6") * col("dp_e6")).as("sxy"),
            sum(col("dp_e6") * col("dp_e6")).as("sxx"))
          .selectExpr("brand_a", "brand_b",
            "CAST(n_months AS BIGINT) AS n_months",
            """CASE WHEN sxy >= 0
              |  THEN sxy div greatest(1L, sxx div 1000000)
              |  ELSE -((-sxy) div greatest(1L, sxx div 1000000))
              |END AS elasticity_e6""".stripMargin)
      },
      Some("""WITH base AS (
             |  SELECT p.p_brand AS brand,
             |         (year(l.l_shipdate) - 1996) * 12
             |           + month(l.l_shipdate) - 1 AS m,
             |         CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS q,
             |         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             |           AS c
             |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |  WHERE year(l.l_shipdate) IN (1996, 1997)),
             |top3 AS (SELECT brand FROM (
             |           SELECT brand, sum(c) AS rev FROM base GROUP BY 1) t
             |         QUALIFY row_number() OVER (ORDER BY rev DESC, brand)
             |           <= 3),
             |monthly AS (
             |  SELECT brand, m, CAST(sum(q) AS BIGINT) AS mq,
             |         CAST(sum(c) // sum(q) AS BIGINT) AS avg_price
             |  FROM base JOIN top3 USING (brand) GROUP BY 1, 2),
             |chg AS (
             |  SELECT brand, m,
             |         CASE WHEN mq >= pq THEN (mq - pq) * 1000000 // pq
             |           ELSE -((pq - mq) * 1000000 // pq) END AS dq_e6,
             |         CASE WHEN avg_price >= pp
             |           THEN (avg_price - pp) * 1000000 // pp
             |           ELSE -((pp - avg_price) * 1000000 // pp)
             |         END AS dp_e6
             |  FROM (SELECT brand, m, mq, avg_price,
             |          lag(mq) OVER w AS pq, lag(avg_price) OVER w AS pp
             |        FROM monthly WINDOW w AS (PARTITION BY brand
             |          ORDER BY m))
             |  WHERE pq IS NOT NULL AND pq > 0 AND pp > 0),
             |a AS (
             |  SELECT x.brand AS brand_a, y.brand AS brand_b,
             |         CAST(count(*) AS BIGINT) AS n_months,
             |         CAST(sum(x.dq_e6 * y.dp_e6) AS BIGINT) AS sxy,
             |         CAST(sum(y.dp_e6 * y.dp_e6) AS BIGINT) AS sxx
             |  FROM chg x JOIN chg y ON x.m = y.m
             |  GROUP BY 1, 2)
             |SELECT brand_a, brand_b, n_months,
             |       CASE WHEN sxy >= 0
             |         THEN sxy // greatest(1, sxx // 1000000)
             |         ELSE -((-sxy) // greatest(1, sxx // 1000000))
             |       END AS elasticity_e6
             |FROM a""".stripMargin))
  )
}
