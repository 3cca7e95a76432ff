package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-133 batch: bivariate/combined rank statistics on the
  * calendar-bounded month grid — Goodman–Kruskal gamma (the
  * ties-excluded ordinal association beside q_kendall_tau's tau-b),
  * the Lepage test (Wilcoxon location + Ansari–Bradley scale combined
  * into one quadratic statistic; both z's from the EXACT permutation
  * moments of the realized score vectors, the q_siegel_tukey
  * convention), and Hoeffding's D in the strict-rank variant (general
  * dependence beyond monotone — documented divergence: ranks count
  * strict inferiors + 1, no midranks, identically in both engines).
  * Pair grids are month×month — bounded by the 7-year calendar, never
  * data-sized.
  */
object Round133Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Gamma between priority-1 and priority-2 monthly order volumes
    //    (paired by month): concordant/discordant month pairs,
    //    γ = (C−D)/(C+D) sign-factored e6.
    QueryDef("q_gk_gamma",
      (s, d) => {
        val m = Tables.orders(s, d)
          .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)")
            .as("mo"))
          .agg(
            sum(when(substring(col("o_orderpriority"), 1, 1) === "1", 1L)
              .otherwise(0L)).as("x"),
            sum(when(substring(col("o_orderpriority"), 1, 1) === "2", 1L)
              .otherwise(0L)).as("y"))
          .localCheckpoint(false) // month axis: tiny; pair grid below
        m.as("a").join(m.as("b"), col("a.mo") < col("b.mo"))
          .agg(
            sum(when((col("a.x") < col("b.x") && col("a.y") < col("b.y"))
              || (col("a.x") > col("b.x") && col("a.y") > col("b.y")), 1L)
              .otherwise(0L)).as("c"),
            sum(when((col("a.x") < col("b.x") && col("a.y") > col("b.y"))
              || (col("a.x") > col("b.x") && col("a.y") < col("b.y")), 1L)
              .otherwise(0L)).as("dd"),
            count(lit(1)).as("n_pairs"))
          .selectExpr("CAST(n_pairs AS BIGINT) AS n_pairs",
            "CAST(c AS BIGINT) AS n_conc", "CAST(dd AS BIGINT) AS n_disc",
            """CASE WHEN c + dd = 0 THEN 0
              |     WHEN c >= dd THEN (c - dd) * 1000000 div (c + dd)
              |     ELSE -((dd - c) * 1000000 div (c + dd))
              |END AS gamma_e6""".stripMargin)
      },
      Some("""WITH m AS (
             |  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS mo,
             |         CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1)
             |             = '1' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1)
             |             = '2' THEN 1 ELSE 0 END) AS BIGINT) AS y
             |  FROM orders GROUP BY 1),
             |p AS (SELECT
             |        CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
             |            OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0
             |          END) AS BIGINT) AS c,
             |        CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
             |            OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0
             |          END) AS BIGINT) AS dd,
             |        CAST(count(*) AS BIGINT) AS n_pairs
             |      FROM m a JOIN m b ON a.mo < b.mo)
             |SELECT n_pairs, c AS n_conc, dd AS n_disc,
             |       CASE WHEN c + dd = 0 THEN 0
             |            WHEN c >= dd THEN (c - dd) * 1000000 // (c + dd)
             |            ELSE -((dd - c) * 1000000 // (c + dd))
             |       END AS gamma_e6
             |FROM p""".stripMargin)),

    // ── Lepage: priorities 1 vs 2, pooled monthly volumes ranked by
    //    (x, g, mo). Wilcoxon scores a=p and Ansari–Bradley scores
    //    a=min(p, n+1−p); each z uses the exact permutation moments of
    //    the realized score vector, L = z_w² + z_ab² in e6.
    QueryDef("q_lepage",
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
          .withColumn("aw", col("p"))
          .withColumn("ab", least(col("p"), col("n") + 1 - col("p")))
        val zterm = (w: String, s1: String, s2: String) =>
          s"""(CAST(n AS DOUBLE) * CAST($w AS DOUBLE)
             | - CAST(n1 AS DOUBLE) * CAST($s1 AS DOUBLE))
             | * sqrt(CAST(n - 1 AS DOUBLE)
             |   / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             |      * (CAST(n AS DOUBLE) * CAST($s2 AS DOUBLE)
             |         - CAST($s1 AS DOUBLE) * CAST($s1 AS DOUBLE))))"""
            .stripMargin
        pooled.agg(
            max(col("n")).as("n"),
            sum(when(col("g") === "1", 1L).otherwise(0L)).as("n1"),
            sum(when(col("g") === "2", 1L).otherwise(0L)).as("n2"),
            sum(when(col("g") === "1", col("aw")).otherwise(0L)).as("w_w"),
            sum(col("aw")).as("sw1"), sum(expr("aw * aw")).as("sw2"),
            sum(when(col("g") === "1", col("ab")).otherwise(0L)).as("w_ab"),
            sum(col("ab")).as("sab1"), sum(expr("ab * ab")).as("sab2"))
          .selectExpr("CAST(n1 AS BIGINT) AS n1", "CAST(n2 AS BIGINT) AS n2",
            "CAST(w_w AS BIGINT) AS w_wilcoxon",
            "CAST(w_ab AS BIGINT) AS w_ansari",
            s"""CAST(round((power(${zterm("w_w", "sw1", "sw2")}, 2)
               | + power(${zterm("w_ab", "sab1", "sab2")}, 2))
               | * CAST('1000000' AS DOUBLE), 0) AS BIGINT) AS l_e6"""
              .stripMargin)
      },
      Some {
        val zterm = (w: String, s1: String, s2: String) =>
          s"""(CAST(n AS DOUBLE) * CAST($w AS DOUBLE)
             | - CAST(n1 AS DOUBLE) * CAST($s1 AS DOUBLE))
             | * sqrt(CAST(n - 1 AS DOUBLE)
             |   / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             |      * (CAST(n AS DOUBLE) * CAST($s2 AS DOUBLE)
             |         - CAST($s1 AS DOUBLE) * CAST($s1 AS DOUBLE))))"""
            .stripMargin
        s"""WITH cell AS (
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
           |sc AS (SELECT g, n, p AS aw, least(p, n + 1 - p) AS ab
           |       FROM pooled),
           |agg AS (SELECT max(n) AS n,
           |               CAST(sum(CASE WHEN g = '1' THEN 1 ELSE 0
           |                 END) AS BIGINT) AS n1,
           |               CAST(sum(CASE WHEN g = '2' THEN 1 ELSE 0
           |                 END) AS BIGINT) AS n2,
           |               CAST(sum(CASE WHEN g = '1' THEN aw ELSE 0
           |                 END) AS BIGINT) AS w_w,
           |               CAST(sum(aw) AS BIGINT) AS sw1,
           |               CAST(sum(aw * aw) AS BIGINT) AS sw2,
           |               CAST(sum(CASE WHEN g = '1' THEN ab ELSE 0
           |                 END) AS BIGINT) AS w_ab,
           |               CAST(sum(ab) AS BIGINT) AS sab1,
           |               CAST(sum(ab * ab) AS BIGINT) AS sab2
           |        FROM sc)
           |SELECT n1, n2, w_w AS w_wilcoxon, w_ab AS w_ansari,
           |       CAST(round((power(${zterm("w_w", "sw1", "sw2")}, 2)
           |         + power(${zterm("w_ab", "sab1", "sab2")}, 2))
           |         * CAST('1000000' AS DOUBLE), 0) AS BIGINT) AS l_e6
           |FROM agg""".stripMargin
      }),

    // ── Hoeffding's D (strict-rank variant): R/S = strict inferiors +1
    //    per axis, Q = strict bivariate inferiors; D1 = ΣQ(Q−1),
    //    D2 = Σ(R−1)(R−2)(S−1)(S−2), D3 = Σ(R−2)(S−2)Q,
    //    D·denom = 30·((n−2)(n−3)D1 + D2 − 2(n−2)D3) — reported as
    //    d_e6 = that numerator ·1e6 div n(n−1)(n−2)(n−3)(n−4).
    QueryDef("q_hoeffding_d",
      (s, d) => {
        val m = Tables.orders(s, d)
          .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)")
            .as("mo"))
          .agg(
            sum(when(substring(col("o_orderpriority"), 1, 1) === "1", 1L)
              .otherwise(0L)).as("x"),
            sum(when(substring(col("o_orderpriority"), 1, 1) === "2", 1L)
              .otherwise(0L)).as("y"))
          .localCheckpoint(false) // month axis; self-join below
        val q = m.as("a").join(m.as("b"), col("a.mo") =!= col("b.mo"))
          .groupBy(col("a.mo").as("mo"))
          .agg(
            sum(when(col("b.x") < col("a.x"), 1L).otherwise(0L)).as("rx"),
            sum(when(col("b.y") < col("a.y"), 1L).otherwise(0L)).as("ry"),
            sum(when(col("b.x") < col("a.x") && col("b.y") < col("a.y"),
              1L).otherwise(0L)).as("qq"))
          .select((col("rx") + 1).as("r"), (col("ry") + 1).as("ss"),
            col("qq"))
        q.agg(count(lit(1)).as("n"),
            sum(expr("qq * (qq - 1)")).as("d1"),
            sum(expr("(r - 1) * (r - 2) * (ss - 1) * (ss - 2)")).as("d2"),
            sum(expr("(r - 2) * (ss - 2) * qq")).as("d3"))
          .selectExpr("CAST(n AS BIGINT) AS n",
            "CAST(d1 AS BIGINT) AS d1", "CAST(d2 AS BIGINT) AS d2",
            "CAST(d3 AS BIGINT) AS d3",
            """CAST(CASE WHEN 30 * ((n - 2) * (n - 3) * d1 + d2
              |       - 2 * (n - 2) * d3) >= 0
              |  THEN 30 * ((n - 2) * (n - 3) * d1 + d2
              |       - 2 * (n - 2) * d3) * 1000000
              |       div (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
              |  ELSE -((-(30 * ((n - 2) * (n - 3) * d1 + d2
              |       - 2 * (n - 2) * d3))) * 1000000
              |       div (n * (n - 1) * (n - 2) * (n - 3) * (n - 4)))
              |END AS BIGINT) AS d_e6""".stripMargin)
      },
      Some("""WITH m AS (
             |  SELECT year(o_orderdate) * 100 + month(o_orderdate) AS mo,
             |         CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1)
             |             = '1' THEN 1 ELSE 0 END) AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN substring(o_orderpriority, 1, 1)
             |             = '2' THEN 1 ELSE 0 END) AS BIGINT) AS y
             |  FROM orders GROUP BY 1),
             |q AS (SELECT a.mo,
             |             CAST(sum(CASE WHEN b.x < a.x THEN 1 ELSE 0
             |               END) + 1 AS BIGINT) AS r,
             |             CAST(sum(CASE WHEN b.y < a.y THEN 1 ELSE 0
             |               END) + 1 AS BIGINT) AS ss,
             |             CAST(sum(CASE WHEN b.x < a.x AND b.y < a.y
             |               THEN 1 ELSE 0 END) AS BIGINT) AS qq
             |      FROM m a JOIN m b ON a.mo <> b.mo
             |      GROUP BY 1),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(qq * (qq - 1)) AS BIGINT) AS d1,
             |               CAST(sum((r - 1) * (r - 2) * (ss - 1)
             |                 * (ss - 2)) AS BIGINT) AS d2,
             |               CAST(sum((r - 2) * (ss - 2) * qq) AS BIGINT)
             |                 AS d3
             |        FROM q)
             |SELECT n, d1, d2, d3,
             |       CAST(CASE WHEN 30 * ((n - 2) * (n - 3) * d1 + d2
             |              - 2 * (n - 2) * d3) >= 0
             |         THEN 30 * ((n - 2) * (n - 3) * d1 + d2
             |              - 2 * (n - 2) * d3) * 1000000
             |              // (n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
             |         ELSE -((-(30 * ((n - 2) * (n - 3) * d1 + d2
             |              - 2 * (n - 2) * d3))) * 1000000
             |              // (n * (n - 1) * (n - 2) * (n - 3) * (n - 4)))
             |       END AS BIGINT) AS d_e6
             |FROM agg""".stripMargin))
  )
}
