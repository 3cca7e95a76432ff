package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-166 batch — regularization path, supply-chain variance
  * amplification, and the attribute control chart:
  *
  *  - Ridge path (`q_ridge_path`): the L2-regularized companion to
  *    q_linreg2. Closed form on the same exact centered integer moments
  *    (c11, c22, c12, cy1, cy2 at n²·raw scale); shrinkage expressed
  *    per-coordinate as λ_j = k/1000 · Sxx_j (ridge on standardized
  *    features re-expressed in raw units — the only formulation whose
  *    grid is scale-free), so the whole path multiplies diagonals by
  *    (1000+k) and off-diagonals/numerators by 1000 and stays integer
  *    with NO div truncation until the one β division. One lineitem
  *    pass; the 5-point k grid is a broadcast of a literal frame.
  *  - Bullwhip effect (`q_bullwhip`): CV²(upstream ship-month revenue) /
  *    CV²(downstream order-month demand) per year — Lee et al.'s
  *    variance-amplification reading of the order→fulfillment pipeline.
  *    Two independent monthly rollups (cents-exact), CV² at n²-scale
  *    integers, ratio closed as one double division. No fact-fact join.
  *  - p-chart (`q_p_chart`): monthly returned-line proportion vs
  *    binomial 3σ limits around the pooled p̄ (variable n_t per month).
  *    σ needs one sqrt — the limits are rounded to e6 integers BEFORE
  *    the in/out-of-control comparison, so the flag is bit-deterministic
  *    across engines (the r10 double-sum lesson: only per-row scalar
  *    chains are IEEE-portable, never cross-row double accumulation).
  *
  * Scale: each query is one or two full-table aggregations onto a
  * bounded axis (5 λs / ~24 months); everything downstream is tiny.
  */
object Round166Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Ridge path: y = extendedprice dollars, x1 = quantity,
    //    x2 = discount (e2). k ∈ {0,1,10,100,1000} per-mille shrinkage;
    //    k=0 row IS the OLS solution (pins consistency with q_linreg2).
    QueryDef("q_ridge_path",
      (s, d) => {
        val m = Tables.lineitem(s, d)
          .select(floor(col("l_extendedprice") + 0.5).cast("long").as("y"),
            floor(col("l_quantity") + 0.5).cast("long").as("x1"),
            floor(col("l_discount") * 100 + 0.5).cast("long").as("x2"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
            sum(expr("x1 * x1")).as("q11"), sum(expr("x2 * x2")).as("q22"),
            sum(expr("x1 * x2")).as("q12"),
            sum(expr(s"CAST(x1 AS $dec) * y")).as("p1"),
            sum(expr(s"CAST(x2 AS $dec) * y")).as("p2"))
        val ks = s.range(0, 5).select(
          expr("element_at(array(0L, 1L, 10L, 100L, 1000L), CAST(id + 1 AS INT))")
            .as("k"))
        m.crossJoin(broadcast(ks))
          .selectExpr("k", "CAST(n AS BIGINT) AS n", "sy", "s1", "s2",
            s"CAST(n AS $dec) * q11 - CAST(s1 AS $dec) * s1 AS c11",
            s"CAST(n AS $dec) * q22 - CAST(s2 AS $dec) * s2 AS c22",
            s"CAST(n AS $dec) * q12 - CAST(s1 AS $dec) * s2 AS c12",
            s"CAST(n AS $dec) * p1 - CAST(s1 AS $dec) * sy AS cy1",
            s"CAST(n AS $dec) * p2 - CAST(s2 AS $dec) * sy AS cy2")
          .selectExpr("k", "n", "sy", "s1", "s2",
            "c11 * (1000 + k) AS a11", "c22 * (1000 + k) AS a22",
            "c12 * 1000 AS a12", "cy1 * 1000 AS w1", "cy2 * 1000 AS w2")
          .selectExpr("k", "n", "sy", "s1", "s2",
            "a11 * a22 - a12 * a12 AS det",
            "w1 * a22 - w2 * a12 AS nb1", "w2 * a11 - w1 * a12 AS nb2")
          .selectExpr("k", "n",
            """CASE WHEN det = 0 THEN NULL ELSE
              |  round(CAST(nb1 AS DOUBLE) / CAST(det AS DOUBLE), 6)
              |END AS b1""".stripMargin,
            """CASE WHEN det = 0 THEN NULL ELSE
              |  round(CAST(nb2 AS DOUBLE) / CAST(det AS DOUBLE), 6)
              |END AS b2""".stripMargin, "det", "sy", "s1", "s2")
          .selectExpr("k", "n", "b1", "b2",
            """CASE WHEN det = 0 THEN NULL ELSE
              |  round((CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE)
              |    - b2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE), 6)
              |END AS b0""".stripMargin)
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y,
             |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
             |         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2
             |  FROM lineitem),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(y) AS sy,
             |             sum(x1) AS s1, sum(x2) AS s2,
             |             sum(x1 * x1) AS q11, sum(x2 * x2) AS q22,
             |             sum(x1 * x2) AS q12, sum(x1 * y) AS p1,
             |             sum(x2 * y) AS p2 FROM b),
             |c AS (SELECT k, n, sy, s1, s2,
             |        CAST(n AS HUGEINT) * q11 - CAST(s1 AS HUGEINT) * s1
             |          AS c11,
             |        CAST(n AS HUGEINT) * q22 - CAST(s2 AS HUGEINT) * s2
             |          AS c22,
             |        CAST(n AS HUGEINT) * q12 - CAST(s1 AS HUGEINT) * s2
             |          AS c12,
             |        CAST(n AS HUGEINT) * p1 - CAST(s1 AS HUGEINT) * sy
             |          AS cy1,
             |        CAST(n AS HUGEINT) * p2 - CAST(s2 AS HUGEINT) * sy
             |          AS cy2
             |      FROM m CROSS JOIN (VALUES (CAST(0 AS BIGINT)),
             |        (CAST(1 AS BIGINT)), (CAST(10 AS BIGINT)),
             |        (CAST(100 AS BIGINT)), (CAST(1000 AS BIGINT))) t(k)),
             |a AS (SELECT k, n, sy, s1, s2,
             |        c11 * (1000 + k) AS a11, c22 * (1000 + k) AS a22,
             |        c12 * 1000 AS a12, cy1 * 1000 AS w1,
             |        cy2 * 1000 AS w2 FROM c),
             |dd AS (SELECT k, n, sy, s1, s2,
             |         a11 * a22 - a12 * a12 AS det,
             |         w1 * a22 - w2 * a12 AS nb1,
             |         w2 * a11 - w1 * a12 AS nb2 FROM a),
             |e AS (SELECT k, n, det, sy, s1, s2,
             |        CASE WHEN det = 0 THEN NULL ELSE
             |          round(CAST(nb1 AS DOUBLE) / CAST(det AS DOUBLE), 6)
             |        END AS b1,
             |        CASE WHEN det = 0 THEN NULL ELSE
             |          round(CAST(nb2 AS DOUBLE) / CAST(det AS DOUBLE), 6)
             |        END AS b2 FROM dd)
             |SELECT k, n, b1, b2,
             |       CASE WHEN det = 0 THEN NULL ELSE
             |         round((CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE)
             |           - b2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             |       END AS b0
             |FROM e""".stripMargin)),

    // ── Bullwhip per year: CV²(ship-month revenue) over
    //    CV²(order-month demand), both cents-exact; CV² at n² scale:
    //    cv2 = (m·Σx² − (Σx)²) / (Σx)², m = months in year.
    QueryDef("q_bullwhip",
      (s, d) => {
        def monthly(df: org.apache.spark.sql.DataFrame, ts: String,
                    amt: String) = df
          .select(year(col(ts)).as("yr"),
            date_trunc("month", col(ts)).as("mo"),
            floor(col(amt) * 100 + 0.5).cast("long").as("cents"))
          .groupBy(col("yr"), col("mo")).agg(sum(col("cents")).as("x"))
          .groupBy(col("yr"))
          .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
            sum(expr(s"CAST(x AS $dec) * x")).as("sxx"))
        val down = monthly(Tables.orders(s, d), "o_orderdate",
          "o_totalprice")
          .selectExpr("yr", "m AS m_dn",
            s"CAST(m AS $dec) * sxx - CAST(sx AS $dec) * sx AS v_dn",
            s"CAST(sx AS $dec) * sx AS s2_dn")
        val up = monthly(Tables.lineitem(s, d), "l_shipdate",
          "l_extendedprice")
          .selectExpr("yr", "m AS m_up",
            s"CAST(m AS $dec) * sxx - CAST(sx AS $dec) * sx AS v_up",
            s"CAST(sx AS $dec) * sx AS s2_up")
        down.join(up, "yr")
          .selectExpr("CAST(yr AS BIGINT) AS yr", "m_dn", "m_up",
            """round(CAST(v_dn AS DOUBLE) / CAST(s2_dn AS DOUBLE), 6)
              |AS cv2_down""".stripMargin,
            """round(CAST(v_up AS DOUBLE) / CAST(s2_up AS DOUBLE), 6)
              |AS cv2_up""".stripMargin,
            """CASE WHEN v_dn = 0 THEN NULL ELSE
              |round((CAST(v_up AS DOUBLE) * CAST(s2_dn AS DOUBLE))
              |  / (CAST(s2_up AS DOUBLE) * CAST(v_dn AS DOUBLE)), 6)
              |END AS bullwhip""".stripMargin)
      },
      Some("""WITH dn0 AS (
             |  SELECT year(o_orderdate) AS yr,
             |         date_trunc('month', o_orderdate) AS mo,
             |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |           AS x
             |  FROM orders GROUP BY 1, 2),
             |dn AS (SELECT yr, CAST(count(*) AS BIGINT) AS m_dn,
             |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
             |           - CAST(sum(x) AS HUGEINT) * sum(x) AS v_dn,
             |         CAST(sum(x) AS HUGEINT) * sum(x) AS s2_dn
             |       FROM dn0 GROUP BY 1),
             |up0 AS (
             |  SELECT year(l_shipdate) AS yr,
             |         date_trunc('month', l_shipdate) AS mo,
             |         sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS x
             |  FROM lineitem GROUP BY 1, 2),
             |up AS (SELECT yr, CAST(count(*) AS BIGINT) AS m_up,
             |         CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
             |           - CAST(sum(x) AS HUGEINT) * sum(x) AS v_up,
             |         CAST(sum(x) AS HUGEINT) * sum(x) AS s2_up
             |       FROM up0 GROUP BY 1)
             |SELECT CAST(dn.yr AS BIGINT) AS yr, m_dn, m_up,
             |       round(CAST(v_dn AS DOUBLE) / CAST(s2_dn AS DOUBLE), 6)
             |         AS cv2_down,
             |       round(CAST(v_up AS DOUBLE) / CAST(s2_up AS DOUBLE), 6)
             |         AS cv2_up,
             |       CASE WHEN v_dn = 0 THEN NULL ELSE
             |         round((CAST(v_up AS DOUBLE) * CAST(s2_dn AS DOUBLE))
             |           / (CAST(s2_up AS DOUBLE) * CAST(v_dn AS DOUBLE)),
             |           6) END AS bullwhip
             |FROM dn JOIN up ON up.yr = dn.yr""".stripMargin)),

    // ── p-chart: monthly return proportion vs pooled 3σ binomial
    //    limits; limits rounded to e6 BEFORE the flag comparison.
    QueryDef("q_p_chart",
      (s, d) => {
        val mo = Tables.lineitem(s, d)
          .select(trunc(col("l_shipdate"), "month").as("mo"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("r"))
          .groupBy(col("mo"))
          .agg(count(lit(1)).as("nt"), sum(col("r")).as("rt"))
          .localCheckpoint(false) // reused: pooled p̄ + per-month rows
        val pool = mo.agg(sum(col("nt")).as("nn"), sum(col("rt")).as("rr"))
        mo.crossJoin(broadcast(pool))
          .selectExpr("mo", "nt", "rt",
            "rt * 1000000 div nt AS p_e6",
            "rr * 1000000 div nn AS pbar_e6",
            """CAST(round(CAST('3000000.0' AS DOUBLE) * sqrt(
              |  (CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
              |  * (CAST('1.0' AS DOUBLE)
              |     - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
              |  / CAST(nt AS DOUBLE))) AS BIGINT) AS sigma3_e6"""
              .stripMargin)
          .selectExpr("mo", "nt", "rt", "p_e6", "pbar_e6", "sigma3_e6",
            """CASE WHEN p_e6 > pbar_e6 + sigma3_e6 THEN 'HIGH'
              |     WHEN p_e6 < pbar_e6 - sigma3_e6 THEN 'LOW'
              |     ELSE 'IN' END AS control""".stripMargin)
      },
      Some("""WITH mo AS (
             |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mo,
             |         CAST(count(*) AS BIGINT) AS nt,
             |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1
             |                       ELSE 0 END) AS BIGINT) AS rt
             |  FROM lineitem GROUP BY 1),
             |pool AS (SELECT CAST(sum(nt) AS BIGINT) AS nn,
             |                CAST(sum(rt) AS BIGINT) AS rr FROM mo),
             |j AS (SELECT mo, nt, rt,
             |        rt * 1000000 // nt AS p_e6,
             |        rr * 1000000 // nn AS pbar_e6,
             |        CAST(round(CAST('3000000.0' AS DOUBLE) * sqrt(
             |          (CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
             |          * (CAST('1.0' AS DOUBLE)
             |             - CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE))
             |          / CAST(nt AS DOUBLE))) AS BIGINT) AS sigma3_e6
             |      FROM mo CROSS JOIN pool)
             |SELECT mo, nt, rt, p_e6, pbar_e6, sigma3_e6,
             |       CASE WHEN p_e6 > pbar_e6 + sigma3_e6 THEN 'HIGH'
             |            WHEN p_e6 < pbar_e6 - sigma3_e6 THEN 'LOW'
             |            ELSE 'IN' END AS control
             |FROM j""".stripMargin))
  )
}
