package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-126 batch: the Kuiper two-sample statistic (the rotation-
  * invariant D⁺+D⁻ companion to q_ks_test's sup-norm), the Siegel–Tukey
  * scale test (rank-sum on alternating-extreme ranks — the dispersion
  * analogue of q_mann_whitney), and Cohen's h (the arcsine-transformed
  * proportion effect size beside q_cliffs_delta's ordinal one). The
  * first two ride the bounded priority×month grid; ECDFs and ranks are
  * integer-exact with deterministic tie-breaks so both engines walk
  * identical permutations.
  */
object Round126Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Kuiper V between priorities 1 and 2 on monthly order volumes:
    //    per distinct volume v, cumulative group counts c1,c2 (ECDF
    //    numerators), D⁺ = max(c1·n2 − c2·n1), D⁻ = max(c2·n1 − c1·n2),
    //    V = (D⁺+D⁻)·1e6 div n1·n2 — pure integers on the ≤2·months
    //    distinct-value axis.
    QueryDef("q_kuiper",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .filter(substring(col("o_orderpriority"), 1, 1).isin("1", "2"))
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
        val byv = cell.groupBy(col("x"))
          .agg(sum(when(col("g") === "1", 1L).otherwise(0L)).as("a1"),
            sum(when(col("g") === "2", 1L).otherwise(0L)).as("a2"))
        // Unpartitioned window is safe: the axis is DISTINCT monthly
        // volumes of a 7-year calendar — bounded, never data-sized.
        val cum = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = byv.agg(sum(col("a1")).as("n1"), sum(col("a2")).as("n2"))
        byv
          .withColumn("c1", sum(col("a1")).over(cum))
          .withColumn("c2", sum(col("a2")).over(cum))
          .crossJoin(broadcast(tot))
          .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
            greatest(max(expr("c1 * n2 - c2 * n1")), lit(0L)).as("dplus_n"),
            greatest(max(expr("c2 * n1 - c1 * n2")), lit(0L)).as("dminus_n"))
          .selectExpr("CAST(n1 AS BIGINT) AS n1", "CAST(n2 AS BIGINT) AS n2",
            "CAST(dplus_n AS BIGINT) AS dplus_n",
            "CAST(dminus_n AS BIGINT) AS dminus_n",
            "(dplus_n + dminus_n) * 1000000 div (n1 * n2) AS v_e6")
      },
      Some("""WITH cell AS (
             |  SELECT substring(o_orderpriority, 1, 1) AS g,
             |         year(o_orderdate) * 100 + month(o_orderdate) AS mo,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM orders
             |  WHERE substring(o_orderpriority, 1, 1) IN ('1', '2')
             |  GROUP BY 1, 2),
             |byv AS (SELECT x,
             |               CAST(sum(CASE WHEN g = '1' THEN 1 ELSE 0
             |                 END) AS BIGINT) AS a1,
             |               CAST(sum(CASE WHEN g = '2' THEN 1 ELSE 0
             |                 END) AS BIGINT) AS a2
             |        FROM cell GROUP BY 1),
             |cum AS (SELECT x, a1, a2,
             |               CAST(sum(a1) OVER (ORDER BY x
             |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
             |               CAST(sum(a2) OVER (ORDER BY x
             |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2
             |        FROM byv),
             |t AS (SELECT CAST(sum(a1) AS BIGINT) AS n1,
             |             CAST(sum(a2) AS BIGINT) AS n2 FROM byv),
             |d AS (SELECT max(t.n1) AS n1, max(t.n2) AS n2,
             |             greatest(max(c1 * t.n2 - c2 * t.n1), 0)
             |               AS dplus_n,
             |             greatest(max(c2 * t.n1 - c1 * t.n2), 0)
             |               AS dminus_n
             |      FROM cum CROSS JOIN t)
             |SELECT n1, n2, CAST(dplus_n AS BIGINT) AS dplus_n,
             |       CAST(dminus_n AS BIGINT) AS dminus_n,
             |       CAST((dplus_n + dminus_n) * 1000000 // (n1 * n2)
             |         AS BIGINT) AS v_e6
             |FROM d""".stripMargin)),

    // ── Siegel–Tukey: pooled monthly volumes ranked outside-in
    //    (1,4,5,8,… from the bottom; 2,3,6,7,… from the top — ties
    //    broken by (x, g, mo), the exact-replay convention), W = rank
    //    sum of group 1, z from the EXACT permutation moments of the
    //    realized rank multiset (robust to the odd-n middle rank):
    //    z = (n·W − n1·S)·sqrt((n−1)/(n1·n2·(n·SS − S²))).
    QueryDef("q_siegel_tukey",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .filter(substring(col("o_orderpriority"), 1, 1).isin("1", "2"))
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
        // Unpartitioned window is safe: pooled axis = 2 priorities × a
        // 7-year month calendar — bounded, never data-sized.
        val pooled = cell
          .withColumn("p", row_number().over(
            Window.orderBy(col("x"), col("g"), col("mo"))))
          .withColumn("n", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .withColumn("st", expr(
            """CASE WHEN p <= n div 2 THEN 2 * p - p % 2
              |ELSE 2 * (n + 1 - p) - 1 + (n + 1 - p) % 2 END"""
              .stripMargin))
        pooled.agg(
            max(col("n")).as("n"),
            sum(when(col("g") === "1", 1L).otherwise(0L)).as("n1"),
            sum(when(col("g") === "2", 1L).otherwise(0L)).as("n2"),
            sum(when(col("g") === "1", col("st")).otherwise(0L)).as("w"),
            sum(col("st")).as("ss1"),
            sum(expr("st * st")).as("ss2"))
          .selectExpr("CAST(n1 AS BIGINT) AS n1", "CAST(n2 AS BIGINT) AS n2",
            "CAST(w AS BIGINT) AS w",
            """round((CAST(n AS DOUBLE) * CAST(w AS DOUBLE)
              |  - CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE))
              |  * sqrt(CAST(n - 1 AS DOUBLE)
              |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
              |       * (CAST(n AS DOUBLE) * CAST(ss2 AS DOUBLE)
              |          - CAST(ss1 AS DOUBLE) * CAST(ss1 AS DOUBLE)))), 6)
              |AS z""".stripMargin)
      },
      Some("""WITH cell AS (
             |  SELECT substring(o_orderpriority, 1, 1) AS g,
             |         year(o_orderdate) * 100 + month(o_orderdate) AS mo,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM orders
             |  WHERE substring(o_orderpriority, 1, 1) IN ('1', '2')
             |  GROUP BY 1, 2),
             |pooled AS (
             |  SELECT g,
             |         CAST(row_number() OVER (ORDER BY x, g, mo)
             |           AS BIGINT) AS p,
             |         CAST(count(*) OVER () AS BIGINT) AS n
             |  FROM cell),
             |st AS (SELECT g, n,
             |              CASE WHEN p <= n // 2 THEN 2 * p - p % 2
             |                   ELSE 2 * (n + 1 - p) - 1
             |                        + (n + 1 - p) % 2 END AS st
             |       FROM pooled),
             |agg AS (SELECT max(n) AS n,
             |               CAST(sum(CASE WHEN g = '1' THEN 1 ELSE 0
             |                 END) AS BIGINT) AS n1,
             |               CAST(sum(CASE WHEN g = '2' THEN 1 ELSE 0
             |                 END) AS BIGINT) AS n2,
             |               CAST(sum(CASE WHEN g = '1' THEN st ELSE 0
             |                 END) AS BIGINT) AS w,
             |               CAST(sum(st) AS BIGINT) AS ss1,
             |               CAST(sum(st * st) AS BIGINT) AS ss2
             |        FROM st)
             |SELECT n1, n2, w,
             |       round((CAST(n AS DOUBLE) * CAST(w AS DOUBLE)
             |         - CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE))
             |         * sqrt(CAST(n - 1 AS DOUBLE)
             |           / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             |              * (CAST(n AS DOUBLE) * CAST(ss2 AS DOUBLE)
             |                 - CAST(ss1 AS DOUBLE)
             |                   * CAST(ss1 AS DOUBLE)))), 6) AS z
             |FROM agg""".stripMargin)),

    // ── Cohen's h between the even- and odd-user purchase rates:
    //    h = 2·asin(√p_even) − 2·asin(√p_odd), e6 after ONE terminal
    //    round (asin/sqrt are sub-ulp IEEE in both engines; the only
    //    double work is the final scalar). One scan, one aggregate.
    QueryDef("q_cohens_h",
      (s, d) => {
        Tables.events(s, d)
          .select((col("user_id") % 2 === 0).as("even"),
            (col("event_type") === "purchase").as("conv"))
          .agg(
            sum(when(col("even"), 1L).otherwise(0L)).as("n_even"),
            sum(when(col("even") && col("conv"), 1L).otherwise(0L))
              .as("conv_even"),
            sum(when(!col("even"), 1L).otherwise(0L)).as("n_odd"),
            sum(when(!col("even") && col("conv"), 1L).otherwise(0L))
              .as("conv_odd"))
          .selectExpr("CAST(n_even AS BIGINT) AS n_even",
            "CAST(conv_even AS BIGINT) AS conv_even",
            "CAST(n_odd AS BIGINT) AS n_odd",
            "CAST(conv_odd AS BIGINT) AS conv_odd",
            """CAST(round((2 * asin(sqrt(CAST(conv_even AS DOUBLE)
              |         / CAST(n_even AS DOUBLE)))
              |  - 2 * asin(sqrt(CAST(conv_odd AS DOUBLE)
              |         / CAST(n_odd AS DOUBLE))))
              |  * CAST('1000000' AS DOUBLE), 0) AS BIGINT) AS h_e6"""
              .stripMargin)
          .selectExpr("n_even", "conv_even", "n_odd", "conv_odd", "h_e6",
            """CASE WHEN abs(h_e6) < 200000 THEN 'negligible'
              |     WHEN abs(h_e6) < 500000 THEN 'small'
              |     WHEN abs(h_e6) < 800000 THEN 'medium'
              |     ELSE 'large' END AS magnitude""".stripMargin)
      },
      Some("""WITH t AS (
             |  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0
             |           END) AS BIGINT) AS n_even,
             |         CAST(sum(CASE WHEN user_id % 2 = 0
             |             AND event_type = 'purchase' THEN 1 ELSE 0
             |           END) AS BIGINT) AS conv_even,
             |         CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0
             |           END) AS BIGINT) AS n_odd,
             |         CAST(sum(CASE WHEN user_id % 2 <> 0
             |             AND event_type = 'purchase' THEN 1 ELSE 0
             |           END) AS BIGINT) AS conv_odd
             |  FROM events),
             |h AS (SELECT n_even, conv_even, n_odd, conv_odd,
             |             CAST(round((2 * asin(sqrt(
             |                 CAST(conv_even AS DOUBLE)
             |                 / CAST(n_even AS DOUBLE)))
             |               - 2 * asin(sqrt(CAST(conv_odd AS DOUBLE)
             |                 / CAST(n_odd AS DOUBLE))))
             |               * CAST('1000000' AS DOUBLE), 0) AS BIGINT)
             |               AS h_e6
             |      FROM t)
             |SELECT n_even, conv_even, n_odd, conv_odd, h_e6,
             |       CASE WHEN abs(h_e6) < 200000 THEN 'negligible'
             |            WHEN abs(h_e6) < 500000 THEN 'small'
             |            WHEN abs(h_e6) < 800000 THEN 'medium'
             |            ELSE 'large' END AS magnitude
             |FROM h""".stripMargin))
  )
}
