package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-115 batch: multiple-comparison machinery — Holm–Bonferroni
  * step-down over the per-nation urgency-rate z family (the FWER
  * control q_bh_fdr's FDR screen deliberately doesn't give), Tukey HSD
  * on the priority×month grid (which priority pairs actually differ
  * once q_anova rejects), and the Mantel–Haenszel common odds ratio
  * across region strata (the pooled-confounder 2×2 screen behind
  * q_simpson_reversal). Critical constants are two-sided α=0.05
  * inverse-normal / studentized-range quantiles embedded as e6/e3
  * literals, so no engine needs an erf.
  */
object Round115Queries {

  /** Φ⁻¹(1 − 0.025/d) in e6, d = 1..25 (python statistics.NormalDist,
    * floor-truncated) — Holm's step-down critical ladder at m ≤ 25. */
  private val zCritE6 = Seq(1959963L, 2241402L, 2393979L, 2497705L,
    2575829L, 2638257L, 2690109L, 2734368L, 2772921L, 2807033L, 2837596L,
    2865260L, 2890511L, 2913726L, 2935199L, 2955166L, 2973819L, 2991316L,
    3007786L, 3023341L, 3038074L, 3052065L, 3065383L, 3078088L, 3090232L)
  private def zCritArr: String = zCritE6.mkString("array(", ", ", ")")
  private def zCritList: String = zCritE6.mkString("[", ", ", "]")

  def defs: Seq[QueryDef] = Seq(

    // ── Holm–Bonferroni step-down on per-nation urgent-order rates vs
    //    the pooled rate: |z| ranked descending, step i compared against
    //    the α/(m−i+1) ladder, and rejection stops at the first failure
    //    (running-min over the rank order — the step-down contract).
    //    The z→e6 rounding happens identically in both engines, so the
    //    ladder comparison is exact-integer.
    QueryDef("q_holm_step",
      (s, d) => {
        val per = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"),
            col("c_nationkey")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderpriority") === "1-URGENT", 1L)
              .otherwise(0L)).as("k"))
          .localCheckpoint(false) // nation axis; reused by the pooled rollup
        val tot = per.agg(sum(col("n")).as("nn"), sum(col("k")).as("kk"),
          count(lit(1)).as("m"))
        per.crossJoin(broadcast(tot))
          .withColumn("z_e6", expr(
            """CAST(round((CAST(k AS DOUBLE) * CAST(nn AS DOUBLE)
              |        - CAST(n AS DOUBLE) * CAST(kk AS DOUBLE))
              |      / sqrt(CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
              |             * CAST(nn - kk AS DOUBLE))
              |   * CAST('1000000' AS DOUBLE), 0) AS BIGINT)""".stripMargin))
          .withColumn("rk", row_number().over(
            Window.orderBy(abs(col("z_e6")).desc, col("n_name"))))
          .withColumn("crit_e6",
            expr(s"$zCritArr[CAST(m - rk AS INT)]"))
          .withColumn("exceeds",
            when(abs(col("z_e6")) > col("crit_e6"), 1L).otherwise(0L))
          .withColumn("reject", min(col("exceeds")).over(
            Window.orderBy(col("rk"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .selectExpr("n_name AS nation", "CAST(n AS BIGINT) AS n",
            "CAST(k AS BIGINT) AS k", "z_e6", "CAST(rk AS BIGINT) AS rk",
            "crit_e6", "CAST(reject AS BIGINT) AS reject")
      },
      Some(s"""WITH per AS (
             |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS k
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |               CAST(sum(k) AS BIGINT) AS kk,
             |               CAST(count(*) AS BIGINT) AS m FROM per),
             |z AS (SELECT n_name, n, k,
             |             CAST(round((CAST(k AS DOUBLE) * CAST(nn AS DOUBLE)
             |                     - CAST(n AS DOUBLE) * CAST(kk AS DOUBLE))
             |                   / sqrt(CAST(n AS DOUBLE)
             |                          * CAST(kk AS DOUBLE)
             |                          * CAST(nn - kk AS DOUBLE))
             |                * CAST('1000000' AS DOUBLE), 0) AS BIGINT) AS z_e6,
             |             m
             |      FROM per CROSS JOIN tot),
             |rk AS (SELECT n_name, n, k, z_e6,
             |              CAST(row_number() OVER (ORDER BY abs(z_e6) DESC,
             |                n_name) AS BIGINT) AS rk,
             |              m
             |       FROM z),
             |lad AS (SELECT n_name, n, k, z_e6, rk,
             |               ($zCritList)[CAST(m - rk + 1 AS INT)] AS crit_e6,
             |               CASE WHEN abs(z_e6) > ($zCritList)
             |                      [CAST(m - rk + 1 AS INT)]
             |                    THEN 1 ELSE 0 END AS exceeds
             |        FROM rk)
             |SELECT n_name AS nation, n, k, z_e6, rk,
             |       CAST(crit_e6 AS BIGINT) AS crit_e6,
             |       CAST(min(exceeds) OVER (ORDER BY rk
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS reject
             |FROM lad""".stripMargin)),

    // ── Tukey HSD between order priorities on the zero-filled equal-n
    //    priority×month grid: pairwise mean gaps vs q₀.₀₅(k=5, df→∞) =
    //    3.858 · √(MSE/n), decided by the fully-integer inequality
    //    (Sᵢ−Sⱼ)²·k·(n−1)·1e6 > q²ₑ₆·Wn — no square roots until the
    //    reported statistic. All pair structure lives on the k=5 axis.
    QueryDef("q_tukey_hsd",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
        val axes = cell.select(col("g")).distinct()
          .crossJoin(cell.select(col("mo")).distinct())
        val grid = axes.join(cell, Seq("g", "mo"), "left")
          .select(col("g"), col("mo"), coalesce(col("x"), lit(0L)).as("x"))
        val per = grid.groupBy(col("g"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sg"),
            sum(expr("x * x")).as("qg"))
          .localCheckpoint(false) // pair sides + the pooled rollup
        val pool = per.agg(count(lit(1)).as("k"), max(col("n")).as("np"),
          sum(col("sg")).as("s"), sum(expr("sg * sg")).as("ss2"),
          sum(col("qg")).as("q"))
          .withColumn("wn", expr("np * q - ss2"))
        per.as("a").join(per.as("b"), col("a.g") < col("b.g"))
          .crossJoin(broadcast(pool))
          .withColumn("dabs", abs(col("a.sg") - col("b.sg")))
          .withColumn("sig", when(
            expr("dabs * dabs * k * (np - 1) * 1000000") >
              expr("14884164L * wn"), 1L).otherwise(0L))
          .withColumn("q_stat", expr(
            """CASE WHEN wn = 0 THEN CAST('0.0' AS DOUBLE)
              |ELSE round(sqrt(CAST(dabs * dabs * k * (np - 1) AS DOUBLE)
              |     / CAST(wn AS DOUBLE)), 6) END""".stripMargin))
          .selectExpr("a.g AS g1", "b.g AS g2",
            "CAST(dabs AS BIGINT) AS mean_gap_xn", "q_stat",
            "CAST(sig AS BIGINT) AS significant")
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
             |per AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sg,
             |               CAST(sum(x * x) AS BIGINT) AS qg
             |        FROM grid GROUP BY 1),
             |pool AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |                CAST(max(n) AS BIGINT) AS np,
             |                CAST(sum(sg * sg) AS BIGINT) AS ss2,
             |                CAST(sum(qg) AS BIGINT) AS q
             |         FROM per),
             |pw AS (SELECT a.g AS g1, b.g AS g2,
             |              abs(a.sg - b.sg) AS dabs, k, np,
             |              np * q - ss2 AS wn
             |       FROM per a JOIN per b ON a.g < b.g
             |       CROSS JOIN pool)
             |SELECT g1, g2, dabs AS mean_gap_xn,
             |       CASE WHEN wn = 0 THEN CAST('0.0' AS DOUBLE)
             |            ELSE round(sqrt(CAST(dabs * dabs * k * (np - 1)
             |                     AS DOUBLE) / CAST(wn AS DOUBLE)), 6)
             |       END AS q_stat,
             |       CAST(CASE WHEN dabs * dabs * k * (np - 1) * 1000000
             |                    > 14884164 * wn
             |                 THEN 1 ELSE 0 END AS BIGINT) AS significant
             |FROM pw""".stripMargin)),

    // ── Mantel–Haenszel common odds ratio across region strata:
    //    exposure = urgent priority, outcome = finished status. The MH
    //    pooled ratio Σaᵢdᵢ/nᵢ ÷ Σbᵢcᵢ/nᵢ carries each per-stratum
    //    term at e9 truncated (decimal(38,0) products — identical
    //    truncation both engines), so or_mh_e6 is engine-identical
    //    integer arithmetic end to end.
    QueryDef("q_mantel_haenszel",
      (s, d) => {
        val dec = "decimal(38,0)"
        val strat = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"),
            col("c_nationkey")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").as("reg"))
          .agg(
            sum(when(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderstatus") === "F", 1L).otherwise(0L)).as("a"),
            sum(when(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderstatus") =!= "F", 1L).otherwise(0L)).as("b"),
            sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderstatus") === "F", 1L).otherwise(0L)).as("c"),
            sum(when(col("o_orderpriority") =!= "1-URGENT" &&
              col("o_orderstatus") =!= "F", 1L).otherwise(0L)).as("d"))
          .withColumn("ni", expr("a + b + c + d"))
        val tot = strat.agg(
          sum(expr(s"CAST(a AS $dec) * CAST(d AS $dec)" +
            s" * CAST(1000000000 AS $dec) div CAST(ni AS $dec)"))
            .as("num_e9"),
          sum(expr(s"CAST(b AS $dec) * CAST(c AS $dec)" +
            s" * CAST(1000000000 AS $dec) div CAST(ni AS $dec)"))
            .as("den_e9"),
          count(lit(1)).as("n_strata"), sum(col("a")).as("sum_a"))
        tot.selectExpr("CAST(n_strata AS BIGINT) AS n_strata",
          "CAST(sum_a AS BIGINT) AS sum_a",
          s"""CASE WHEN den_e9 = 0 THEN CAST(NULL AS BIGINT)
             |ELSE CAST(CAST(num_e9 AS $dec) * CAST(1000000 AS $dec)
             |       div CAST(den_e9 AS $dec) AS BIGINT)
             |END AS or_mh_e6""".stripMargin)
      },
      Some("""WITH strat AS (
             |  SELECT n_regionkey AS reg,
             |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
             |                        AND o_orderstatus = 'F'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
             |                        AND o_orderstatus <> 'F'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
             |                        AND o_orderstatus = 'F'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |         CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
             |                        AND o_orderstatus <> 'F'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1),
             |t AS (SELECT
             |        sum(CAST(a AS HUGEINT) * CAST(d AS HUGEINT)
             |            * 1000000000 // CAST(a + b + c + d AS HUGEINT))
             |          AS num_e9,
             |        sum(CAST(b AS HUGEINT) * CAST(c AS HUGEINT)
             |            * 1000000000 // CAST(a + b + c + d AS HUGEINT))
             |          AS den_e9,
             |        CAST(count(*) AS BIGINT) AS n_strata,
             |        CAST(sum(a) AS BIGINT) AS sum_a
             |      FROM strat)
             |SELECT n_strata, sum_a,
             |       CASE WHEN den_e9 = 0 THEN CAST(NULL AS BIGINT)
             |            ELSE CAST(num_e9 * 1000000 // den_e9 AS BIGINT)
             |       END AS or_mh_e6
             |FROM t""".stripMargin))
  )
}
