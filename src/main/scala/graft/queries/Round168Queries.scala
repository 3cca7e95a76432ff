package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-168 batch — ranking distances, equivalence testing, and
  * cointegration:
  *
  *  - Rank distance (`q_rank_distance`): Spearman footrule Σ|r₁−r₂| and
  *    Kendall distance (discordant pairs) between the 1996 and 1997
  *    brand revenue rankings — the "how much did the league table
  *    move" read that correlation coefficients (q_kendall_tau,
  *    q_spearman) blur. Ranks by row_number over the VISIBLE brand
  *    aggregate (25 rows — the pairwise join is axis-bounded, never
  *    data-bounded); normalized e6 against the exact maxima
  *    ⌊n²/2⌋ and n(n−1)/2.
  *  - TOST equivalence (`q_tost`): two one-sided Welch tests that
  *    BUILDING and MACHINERY mean account balances are within ±$50 —
  *    the right null when you want to CLAIM similarity (q_welch_ttest
  *    answers the opposite question). Exact integer moments; the two
  *    t statistics close in one double chain each; the equivalence
  *    flag compares the 6dp-ROUNDED stats so it is engine-exact.
  *  - Engle–Granger (`q_engle_granger`): cointegration screen for the
  *    region-0 vs region-1 monthly revenue series. Step 1 OLS on exact
  *    integer moments → 6dp coefficients; step 2 residuals integerized
  *    per-row (round to cents — a scalar chain, portable) so step 3,
  *    the ADF regression Δr_t on r_{t−1}, runs on exact integers with
  *    the same t-stat close as q_adf_lite. Monthly axis checkpointed
  *    once (ONE orders scan feeds OLS, residuals, and the lag window).
  */
object Round168Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Footrule + Kendall distance between year rankings.
    QueryDef("q_rank_distance",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val rev = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .where(expr("year(l_shipdate) IN (1996, 1997)"))
          .groupBy(col("p_brand"))
          .agg(sum(when(expr("year(l_shipdate) = 1996"),
              floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
              .otherwise(0L)).as("r96"),
            sum(when(expr("year(l_shipdate) = 1997"),
              floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
              .otherwise(0L)).as("r97"))
        val ranked = rev
          .withColumn("k1", row_number().over(
            Window.orderBy(col("r96").desc, col("p_brand"))))
          .withColumn("k2", row_number().over(
            Window.orderBy(col("r97").desc, col("p_brand"))))
          .select(col("p_brand"), col("k1").cast("long").as("k1"),
            col("k2").cast("long").as("k2"))
          .localCheckpoint(false) // footrule agg + pairwise join
        val foot = ranked.agg(count(lit(1)).as("n"),
          sum(expr("abs(k1 - k2)")).as("footrule"))
        val kend = ranked.as("a")
          .join(ranked.as("b"),
            col("a.p_brand") < col("b.p_brand"))
          .agg(sum(expr("CASE WHEN (a.k1 - b.k1) * (a.k2 - b.k2) < 0" +
            " THEN 1 ELSE 0 END")).as("discordant"),
            count(lit(1)).as("pairs"))
        foot.crossJoin(broadcast(kend))
          .selectExpr("n AS n_brands", "footrule",
            "footrule * 1000000 div ((n * n) div 2) AS footrule_e6",
            "discordant", "pairs",
            "discordant * 1000000 div pairs AS kendall_e6")
      },
      Some("""WITH rev AS (
             |  SELECT p_brand,
             |         CAST(sum(CASE WHEN year(l_shipdate) = 1996 THEN
             |           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |           ELSE 0 END) AS BIGINT) AS r96,
             |         CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN
             |           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |           ELSE 0 END) AS BIGINT) AS r97
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE year(l_shipdate) IN (1996, 1997)
             |  GROUP BY 1),
             |rk AS (SELECT p_brand,
             |         CAST(row_number() OVER (ORDER BY r96 DESC, p_brand)
             |           AS BIGINT) AS k1,
             |         CAST(row_number() OVER (ORDER BY r97 DESC, p_brand)
             |           AS BIGINT) AS k2
             |       FROM rev),
             |foot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |                CAST(sum(abs(k1 - k2)) AS BIGINT) AS footrule
             |         FROM rk),
             |kend AS (SELECT CAST(sum(CASE WHEN (a.k1 - b.k1)
             |                  * (a.k2 - b.k2) < 0 THEN 1 ELSE 0 END)
             |                AS BIGINT) AS discordant,
             |                CAST(count(*) AS BIGINT) AS pairs
             |         FROM rk a JOIN rk b ON a.p_brand < b.p_brand)
             |SELECT n AS n_brands, footrule,
             |       footrule * 1000000 // ((n * n) // 2) AS footrule_e6,
             |       discordant, pairs,
             |       discordant * 1000000 // pairs AS kendall_e6
             |FROM foot CROSS JOIN kend""".stripMargin)),

    // ── TOST: equivalence of segment mean balances within ±$50.
    QueryDef("q_tost",
      (s, d) => {
        val m = Tables.customer(s, d)
          .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
          .select(when(col("c_mktsegment") === "BUILDING", 1L)
            .otherwise(0L).as("g"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("x"))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(expr(s"CAST(x AS $dec) * x")).as("sxx"))
        val w = m.agg(
          max(when(col("g") === 1, col("n"))).as("n1"),
          max(when(col("g") === 1, col("sx"))).as("s1"),
          max(when(col("g") === 1, col("sxx"))).as("q1"),
          max(when(col("g") === 0, col("n"))).as("n2"),
          max(when(col("g") === 0, col("sx"))).as("s2"),
          max(when(col("g") === 0, col("sxx"))).as("q2"))
        w.selectExpr("n1", "n2",
            s"CAST(n1 AS $dec) * q1 - CAST(s1 AS $dec) * s1 AS c1",
            s"CAST(n2 AS $dec) * q2 - CAST(s2 AS $dec) * s2 AS c2",
            "s1", "s2")
          .selectExpr("n1", "n2",
            """round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              | - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
              | / CAST('100.0' AS DOUBLE), 6) AS mean_diff_usd"""
              .stripMargin,
            """sqrt(CAST(c1 AS DOUBLE) / (CAST(n1 AS DOUBLE)
              | * CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
              | + CAST(c2 AS DOUBLE) / (CAST(n2 AS DOUBLE)
              | * CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE))) AS se"""
              .stripMargin,
            """(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              | - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS md"""
              .stripMargin)
          .selectExpr("n1", "n2", "mean_diff_usd",
            "round((md + CAST('5000.0' AS DOUBLE)) / se, 6) AS t_lower",
            "round((CAST('5000.0' AS DOUBLE) - md) / se, 6) AS t_upper")
          .selectExpr("n1", "n2", "mean_diff_usd", "t_lower", "t_upper",
            """CASE WHEN t_lower > CAST('1.645' AS DOUBLE)
              |      AND t_upper > CAST('1.645' AS DOUBLE)
              | THEN 'EQUIVALENT' ELSE 'NOT_SHOWN' END AS verdict"""
              .stripMargin)
      },
      Some("""WITH b AS (
             |  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1
             |              ELSE 0 END AS g,
             |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x
             |  FROM customer
             |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
             |m AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(x) AS BIGINT) AS sx,
             |             sum(CAST(x AS HUGEINT) * x) AS sxx
             |      FROM b GROUP BY 1),
             |w AS (SELECT max(CASE WHEN g = 1 THEN n END) AS n1,
             |             max(CASE WHEN g = 1 THEN sx END) AS s1,
             |             max(CASE WHEN g = 1 THEN sxx END) AS q1,
             |             max(CASE WHEN g = 0 THEN n END) AS n2,
             |             max(CASE WHEN g = 0 THEN sx END) AS s2,
             |             max(CASE WHEN g = 0 THEN sxx END) AS q2
             |      FROM m),
             |c AS (SELECT n1, n2, s1, s2,
             |        CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1
             |          AS c1,
             |        CAST(n2 AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2
             |          AS c2 FROM w),
             |t AS (SELECT n1, n2,
             |        round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             |          / CAST('100.0' AS DOUBLE), 6) AS mean_diff_usd,
             |        sqrt(CAST(c1 AS DOUBLE) / (CAST(n1 AS DOUBLE)
             |          * CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE))
             |          + CAST(c2 AS DOUBLE) / (CAST(n2 AS DOUBLE)
             |          * CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)))
             |          AS se,
             |        (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS md
             |      FROM c),
             |tt AS (SELECT n1, n2, mean_diff_usd,
             |         round((md + CAST('5000.0' AS DOUBLE)) / se, 6)
             |           AS t_lower,
             |         round((CAST('5000.0' AS DOUBLE) - md) / se, 6)
             |           AS t_upper FROM t)
             |SELECT n1, n2, mean_diff_usd, t_lower, t_upper,
             |       CASE WHEN t_lower > CAST('1.645' AS DOUBLE)
             |             AND t_upper > CAST('1.645' AS DOUBLE)
             |       THEN 'EQUIVALENT' ELSE 'NOT_SHOWN' END AS verdict
             |FROM tt""".stripMargin)),

    // ── Engle–Granger: OLS level regression → integer-cent residuals
    //    → ADF t-stat on the residual series.
    QueryDef("q_engle_granger",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val monthly = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .where(col("n_regionkey").isin(0, 1))
          .groupBy(trunc(col("o_orderdate"), "month").as("mo"))
          .agg(sum(when(col("n_regionkey") === 0,
            floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .otherwise(0L)).as("y"),
            sum(when(col("n_regionkey") === 1,
              floor(col("o_totalprice") * 100 + 0.5).cast("long"))
              .otherwise(0L)).as("x"))
          .localCheckpoint(false) // OLS moments + residual window
        val mom = monthly.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(expr(s"CAST(x AS $dec) * x")).as("sxx"),
          sum(expr(s"CAST(x AS $dec) * y")).as("sxy"))
        val coef = mom.selectExpr(
          """round(CAST(CAST(n AS decimal(38,0)) * sxy
            | - CAST(sx AS decimal(38,0)) * sy AS DOUBLE)
            | / CAST(CAST(n AS decimal(38,0)) * sxx
            | - CAST(sx AS decimal(38,0)) * sx AS DOUBLE), 6) AS beta"""
            .stripMargin,
          "CAST(n AS BIGINT) AS n", "sx", "sy")
          .selectExpr("n", "beta",
            """round((CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
              | / CAST(n AS DOUBLE), 6) AS alpha""".stripMargin)
        val resid = monthly.crossJoin(broadcast(coef))
          .selectExpr("mo", "n", "beta", "alpha",
            """CAST(round(CAST(y AS DOUBLE) - alpha
              | - beta * CAST(x AS DOUBLE)) AS BIGINT) AS r"""
              .stripMargin)
        val p = resid
          .withColumn("rl", lag(col("r"), 1).over(Window.orderBy("mo")))
          .where(col("rl").isNotNull)
          .selectExpr("n AS n_months", "beta", "alpha",
            s"CAST(rl AS $dec) AS xx", s"CAST(r - rl AS $dec) AS yy")
        p.groupBy(col("n_months"), col("beta"), col("alpha"))
          .agg(count(lit(1)).cast(dec).as("m"), sum(col("xx")).as("sx"),
            sum(col("yy")).as("sy"),
            sum(col("xx") * col("xx")).as("sxx"),
            sum(col("xx") * col("yy")).as("sxy"),
            sum(col("yy") * col("yy")).as("syy"))
          .selectExpr("n_months", "beta", "alpha",
            """CASE WHEN m * sxx - sx * sx = 0 THEN NULL
              |     ELSE round(CAST(m * sxy - sx * sy AS DOUBLE)
              |          / CAST(m * sxx - sx * sx AS DOUBLE), 6)
              |END AS gamma""".stripMargin,
            """CASE WHEN m * sxx - sx * sx = 0 OR m <= 2 THEN NULL
              |     ELSE round((CAST(m * sxy - sx * sy AS DOUBLE)
              |            / CAST(m * sxx - sx * sx AS DOUBLE))
              |          / sqrt(((CAST(m * syy - sy * sy AS DOUBLE)
              |                  - CAST(m * sxy - sx * sy AS DOUBLE)
              |                    * CAST(m * sxy - sx * sy AS DOUBLE)
              |                    / CAST(m * sxx - sx * sx AS DOUBLE))
              |                 / CAST(m - 2 AS DOUBLE))
              |                / CAST(m * sxx - sx * sx AS DOUBLE)
              |                * CAST(m AS DOUBLE)), 6)
              |END AS adf_t""".stripMargin)
      },
      Some("""WITH monthly AS (
             |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
             |           AS mo,
             |         CAST(sum(CASE WHEN n_regionkey = 0 THEN
             |           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           ELSE 0 END) AS BIGINT) AS y,
             |         CAST(sum(CASE WHEN n_regionkey = 1 THEN
             |           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           ELSE 0 END) AS BIGINT) AS x
             |  FROM orders
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  WHERE n_regionkey IN (0, 1)
             |  GROUP BY 1),
             |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS HUGEINT) AS sx,
             |               CAST(sum(y) AS HUGEINT) AS sy,
             |               sum(CAST(x AS HUGEINT) * x) AS sxx,
             |               sum(CAST(x AS HUGEINT) * y) AS sxy
             |        FROM monthly),
             |coef AS (SELECT n,
             |           round(CAST(n * sxy - sx * sy AS DOUBLE)
             |             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS beta,
             |           sx, sy FROM mom),
             |coef2 AS (SELECT n, beta,
             |            round((CAST(sy AS DOUBLE)
             |              - beta * CAST(sx AS DOUBLE))
             |              / CAST(n AS DOUBLE), 6) AS alpha FROM coef),
             |resid AS (SELECT mo, n, beta, alpha,
             |            CAST(round(CAST(y AS DOUBLE) - alpha
             |              - beta * CAST(x AS DOUBLE)) AS BIGINT) AS r
             |          FROM monthly CROSS JOIN coef2),
             |p AS (SELECT n AS n_months, beta, alpha,
             |             CAST(rl AS HUGEINT) AS xx,
             |             CAST(r - rl AS HUGEINT) AS yy
             |      FROM (SELECT mo, n, beta, alpha, r,
             |              lag(r) OVER (ORDER BY mo) AS rl FROM resid)
             |      WHERE rl IS NOT NULL),
             |m AS (SELECT n_months, beta, alpha,
             |             CAST(count(*) AS HUGEINT) AS m, sum(xx) AS sx,
             |             sum(yy) AS sy, sum(xx * xx) AS sxx,
             |             sum(xx * yy) AS sxy, sum(yy * yy) AS syy
             |      FROM p GROUP BY 1, 2, 3)
             |SELECT n_months, beta, alpha,
             |       CASE WHEN m * sxx - sx * sx = 0 THEN NULL
             |            ELSE round(CAST(m * sxy - sx * sy AS DOUBLE)
             |                 / CAST(m * sxx - sx * sx AS DOUBLE), 6)
             |       END AS gamma,
             |       CASE WHEN m * sxx - sx * sx = 0 OR m <= 2 THEN NULL
             |            ELSE round((CAST(m * sxy - sx * sy AS DOUBLE)
             |                   / CAST(m * sxx - sx * sx AS DOUBLE))
             |                 / sqrt(((CAST(m * syy - sy * sy AS DOUBLE)
             |                         - CAST(m * sxy - sx * sy AS DOUBLE)
             |                           * CAST(m * sxy - sx * sy AS DOUBLE)
             |                           / CAST(m * sxx - sx * sx AS DOUBLE))
             |                        / CAST(m - 2 AS DOUBLE))
             |                       / CAST(m * sxx - sx * sx AS DOUBLE)
             |                       * CAST(m AS DOUBLE)), 6)
             |       END AS adf_t
             |FROM m""".stripMargin))
  )
}
