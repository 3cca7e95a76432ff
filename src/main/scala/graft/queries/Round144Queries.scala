package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-144 batch: the remaining two-sample rank arsenal on the
  * priority-1-vs-2 monthly grid — the Baumgartner–Weiß–Schindler test
  * (ECDF-weighted quadratic ranks; more power in the tails than
  * q_ks_test/q_ad_2samp, each term closed as an exact integer e6 so no
  * float ever sums), the Cucconi location–scale test (the quadratic
  * U/V combination predating q_lepage, one IEEE close on a 1-row
  * frame), and the rank-biserial effect size (the directional
  * companion q_mann_whitney's U implies). Ranks break ties by
  * (x, g, mo) — the exact-replay convention — so both engines walk
  * identical permutations.
  */
object Round144Queries {

  /** Pooled (g, mo, x) cells with deterministic pooled rank. */
  private val cellSql =
    """cell AS (
      |  SELECT substring(o_orderpriority, 1, 1) AS g,
      |         year(o_orderdate) * 100 + month(o_orderdate) AS mo,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM orders
      |  WHERE substring(o_orderpriority, 1, 1) IN ('1', '2')
      |  GROUP BY 1, 2),
      |pooled AS (
      |  SELECT g, mo, x,
      |         CAST(row_number() OVER (ORDER BY x, g, mo) AS BIGINT)
      |           AS r
      |  FROM cell)""".stripMargin

  private def pooled(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .filter(substring(col("o_orderpriority"), 1, 1).isin("1", "2"))
      .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
        expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
      .agg(count(lit(1)).as("x"))
      // Unpartitioned windows are safe: pooled axis = 2 priorities × a
      // 7-year month calendar — bounded, never data-sized.
      .withColumn("r", row_number().over(
        Window.orderBy(col("x"), col("g"), col("mo"))).cast("long"))

  def defs: Seq[QueryDef] = Seq(

    // ── BWS: within each group, i = rank of the member among its own
    //    group (by pooled rank); per-member term
    //    (n·R−i·(m+n))²·(n+1)²·1e6 div (n·i·(n+1−i)·m·(m+n)) — exact
    //    integers end to end (decimal against the ×1e6 headroom);
    //    B = (B_X + B_Y)/2 e6.
    QueryDef("q_bws_test",
      (s, d) => {
        val dec = "decimal(38,0)"
        val p = pooled(s, d)
          .withColumn("i", row_number().over(
            Window.partitionBy(col("g")).orderBy(col("r"))).cast("long"))
          .withColumn("n_own", count(lit(1)).over(
            Window.partitionBy(col("g"))))
          .withColumn("n_all", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        val terms = p.withColumn("term_e6", expr(
          s"""CAST(CAST(n_own * r - i * n_all AS $dec)
             |  * CAST(n_own * r - i * n_all AS $dec)
             |  * (n_own + 1) * (n_own + 1) * 1000000
             |  div (CAST(n_own AS $dec) * i * (n_own + 1 - i)
             |       * (n_all - n_own) * n_all) AS BIGINT)"""
            .stripMargin))
        terms.groupBy(col("g"))
          .agg(max(col("n_own")).as("n"),
            expr("sum(term_e6) div max(n_own)").as("b_e6"))
          .agg(sum(col("n")).as("n_total"),
            expr("sum(b_e6) div 2").as("bws_e6"))
          .selectExpr("CAST(n_total AS BIGINT) AS n_total",
            "CAST(bws_e6 AS BIGINT) AS bws_e6")
      },
      Some(s"""WITH $cellSql,
             |p AS (SELECT g, r,
             |             CAST(row_number() OVER (PARTITION BY g
             |               ORDER BY r) AS BIGINT) AS i,
             |             CAST(count(*) OVER (PARTITION BY g)
             |               AS BIGINT) AS n_own,
             |             CAST(count(*) OVER () AS BIGINT) AS n_all
             |      FROM pooled),
             |t AS (SELECT g, n_own,
             |             CAST(CAST(n_own * r - i * n_all AS HUGEINT)
             |               * CAST(n_own * r - i * n_all AS HUGEINT)
             |               * (n_own + 1) * (n_own + 1) * 1000000
             |               // (CAST(n_own AS HUGEINT) * i
             |                  * (n_own + 1 - i) * (n_all - n_own)
             |                  * n_all) AS BIGINT) AS term_e6
             |      FROM p),
             |bg AS (SELECT g, max(n_own) AS n,
             |              CAST(sum(term_e6) AS BIGINT) // max(n_own)
             |                AS b_e6
             |       FROM t GROUP BY 1)
             |SELECT CAST(sum(n) AS BIGINT) AS n_total,
             |       CAST(sum(b_e6) // 2 AS BIGINT) AS bws_e6
             |FROM bg""".stripMargin)),

    // ── Cucconi: U from Σ(rank of group 2)², V from Σ(contrary rank)²,
    //    ρ the closed-form correlation; C = (U²+V²−2ρUV)/(2(1−ρ²)),
    //    e6 after one IEEE close on exact integer sums.
    QueryDef("q_cucconi",
      (s, d) => {
        val p = pooled(s, d)
          .withColumn("nn", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        val agg = p.agg(max(col("nn")).as("nn"),
          sum(when(col("g") === "2", 1L).otherwise(0L)).as("n2"),
          sum(when(col("g") === "2", expr("r * r")).otherwise(0L))
            .as("sr2"),
          sum(when(col("g") === "2",
            expr("(nn + 1 - r) * (nn + 1 - r)")).otherwise(0L))
            .as("sc2"))
        agg.selectExpr("CAST(nn AS BIGINT) AS n_total",
            "CAST(n2 AS BIGINT) AS n2",
            """round((
              |  power((6 * CAST(sr2 AS DOUBLE)
              |    - CAST(n2 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
              |    / sqrt(CAST((nn - n2) AS DOUBLE) * n2 * (nn + 1)
              |      * (2 * nn + 1) * (8 * nn + 11) / 5), 2)
              |  + power((6 * CAST(sc2 AS DOUBLE)
              |    - CAST(n2 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
              |    / sqrt(CAST((nn - n2) AS DOUBLE) * n2 * (nn + 1)
              |      * (2 * nn + 1) * (8 * nn + 11) / 5), 2)
              |  - 2 * (2 * (CAST(nn AS DOUBLE) * nn - 4)
              |      / ((2 * nn + 1) * (8 * nn + 11)) - 1)
              |    * ((6 * CAST(sr2 AS DOUBLE)
              |      - CAST(n2 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
              |      / sqrt(CAST((nn - n2) AS DOUBLE) * n2 * (nn + 1)
              |        * (2 * nn + 1) * (8 * nn + 11) / 5))
              |    * ((6 * CAST(sc2 AS DOUBLE)
              |      - CAST(n2 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
              |      / sqrt(CAST((nn - n2) AS DOUBLE) * n2 * (nn + 1)
              |        * (2 * nn + 1) * (8 * nn + 11) / 5))
              |) / (2 * (1 - power(2 * (CAST(nn AS DOUBLE) * nn - 4)
              |    / ((2 * nn + 1) * (8 * nn + 11)) - 1, 2))), 6)
              |AS c_stat""".stripMargin)
      },
      Some(s"""WITH $cellSql,
             |p AS (SELECT g, r, CAST(count(*) OVER () AS BIGINT) AS nn
             |      FROM pooled),
             |agg AS (SELECT max(nn) AS nn,
             |               CAST(sum(CASE WHEN g = '2' THEN 1 ELSE 0
             |                 END) AS BIGINT) AS n2,
             |               CAST(sum(CASE WHEN g = '2' THEN r * r
             |                 ELSE 0 END) AS BIGINT) AS sr2,
             |               CAST(sum(CASE WHEN g = '2' THEN
             |                 (nn + 1 - r) * (nn + 1 - r) ELSE 0 END)
             |                 AS BIGINT) AS sc2
             |        FROM p)
             |SELECT CAST(nn AS BIGINT) AS n_total, n2,
             |       round((
             |         power((6 * CAST(sr2 AS DOUBLE)
             |           - CAST(n2 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
             |           / sqrt(CAST((nn - n2) AS DOUBLE) * n2 * (nn + 1)
             |             * (2 * nn + 1) * (8 * nn + 11) / 5), 2)
             |         + power((6 * CAST(sc2 AS DOUBLE)
             |           - CAST(n2 AS DOUBLE) * (nn + 1) * (2 * nn + 1))
             |           / sqrt(CAST((nn - n2) AS DOUBLE) * n2 * (nn + 1)
             |             * (2 * nn + 1) * (8 * nn + 11) / 5), 2)
             |         - 2 * (2 * (CAST(nn AS DOUBLE) * nn - 4)
             |             / ((2 * nn + 1) * (8 * nn + 11)) - 1)
             |           * ((6 * CAST(sr2 AS DOUBLE)
             |             - CAST(n2 AS DOUBLE) * (nn + 1)
             |               * (2 * nn + 1))
             |             / sqrt(CAST((nn - n2) AS DOUBLE) * n2
             |               * (nn + 1) * (2 * nn + 1) * (8 * nn + 11)
             |               / 5))
             |           * ((6 * CAST(sc2 AS DOUBLE)
             |             - CAST(n2 AS DOUBLE) * (nn + 1)
             |               * (2 * nn + 1))
             |             / sqrt(CAST((nn - n2) AS DOUBLE) * n2
             |               * (nn + 1) * (2 * nn + 1) * (8 * nn + 11)
             |               / 5))
             |       ) / (2 * (1 - power(2 * (CAST(nn AS DOUBLE) * nn
             |           - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1, 2))),
             |         6) AS c_stat
             |FROM agg""".stripMargin)),

    // ── Rank-biserial: r = 2U/(n1·n2) − 1 from the exact rank-sum U —
    //    the [−1, 1] effect size behind the Mann–Whitney decision,
    //    sign-factored e6.
    QueryDef("q_rank_biserial",
      (s, d) => {
        pooled(s, d).agg(
            sum(when(col("g") === "1", 1L).otherwise(0L)).as("n1"),
            sum(when(col("g") === "2", 1L).otherwise(0L)).as("n2"),
            sum(when(col("g") === "1", col("r")).otherwise(0L)).as("r1"))
          .selectExpr("CAST(n1 AS BIGINT) AS n1", "CAST(n2 AS BIGINT) AS n2",
            "r1 - n1 * (n1 + 1) div 2 AS u1",
            """CASE WHEN 2 * (r1 - n1 * (n1 + 1) div 2) >= n1 * n2
              |  THEN (2 * (r1 - n1 * (n1 + 1) div 2) - n1 * n2)
              |       * 1000000 div (n1 * n2)
              |  ELSE -((n1 * n2 - 2 * (r1 - n1 * (n1 + 1) div 2))
              |       * 1000000 div (n1 * n2))
              |END AS rank_biserial_e6""".stripMargin)
      },
      Some(s"""WITH $cellSql,
             |agg AS (SELECT
             |          CAST(sum(CASE WHEN g = '1' THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n1,
             |          CAST(sum(CASE WHEN g = '2' THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n2,
             |          CAST(sum(CASE WHEN g = '1' THEN r ELSE 0 END)
             |            AS BIGINT) AS r1
             |        FROM pooled)
             |SELECT n1, n2, r1 - n1 * (n1 + 1) // 2 AS u1,
             |       CASE WHEN 2 * (r1 - n1 * (n1 + 1) // 2) >= n1 * n2
             |         THEN (2 * (r1 - n1 * (n1 + 1) // 2) - n1 * n2)
             |              * 1000000 // (n1 * n2)
             |         ELSE -((n1 * n2 - 2 * (r1 - n1 * (n1 + 1) // 2))
             |              * 1000000 // (n1 * n2))
             |       END AS rank_biserial_e6
             |FROM agg""".stripMargin))
  )
}
