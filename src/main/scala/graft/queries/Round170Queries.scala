package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Sketches}
import org.apache.spark.sql.functions._

/** Round-170 batch — reliability-parameter fitting, the canonical
  * product-growth decomposition, and copula tail dependence:
  *
  *  - Weibull fit (`q_weibull_fit`): shape/scale by the log-moment
  *    method — if X~Weibull(k,λ), ln X is Gumbel(min) with
  *    Var = π²/(6k²) and E = lnλ − γ/k, so k̂ = π/(√6·s_lnX) and
  *    log₂λ̂ = mean_log₂X + (γ√6/π)·s_log₂X. Per-row logs ride the
  *    integer log₂ ladder ([[Bm25.log2E6]]) so ALL cross-row sums are
  *    integer sums; λ̂ reconstructs through the inverse ladder
  *    ([[Sketches.pow2E6Expr]]) — no libm exp/log anywhere (engine
  *    parity; only sqrt, which is IEEE-pinned). Companion to
  *    q_block_maxima's Gumbel MoM and q_lognormal_fit.
  *  - Growth accounting (`q_growth_accounting`): the monthly
  *    new / retained / resurrected / churned MAU decomposition (and
  *    quick ratio) — the standard operating read of any activity
  *    stream. new = first-active month; retained = active in m−1 and
  *    m; resurrected = returning after a gap; churned = active in m−1,
  *    silent in m. All joins are keyed (user, month) equi-joins on the
  *    distinct-activity frame — partial+final aggregable, no windows.
  *  - Tail dependence (`q_tail_dependence`): empirical copula
  *    λ_U(q) = P(Y-rank > k | X-rank > k) and λ_L mirror at
  *    q ∈ {0.75, 0.90} for customer (spend, order-count) — do big
  *    spenders and frequent buyers coincide in the EXTREMES (what
  *    q_spearman's whole-range average hides)? Ranks via row_number
  *    over the VISIBLE custkey aggregate with full tie-break order, so
  *    exceedance sets are engine-exact; the independence reference
  *    (n−k)/n rides along per row.
  */
object Round170Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Weibull(k, λ) from integer log₂ moments of order totals.
    QueryDef("q_weibull_fit",
      (s, d) => {
        val m = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("y"))
          .where(col("y") > 0)
          .withColumn("l", Bm25.log2E6(col("y")))
          .agg(count(lit(1)).as("n"), sum(col("l")).as("sl"),
            sum(expr("CAST(l AS decimal(38,0)) * l")).as("ql"))
        m.selectExpr("n",
            """sqrt(CAST(CAST(n AS decimal(38,0)) * ql
              | - CAST(sl AS decimal(38,0)) * sl AS DOUBLE))
              | / CAST(n AS DOUBLE) AS sl2""".stripMargin,
            "CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) AS ml2")
          .selectExpr("n",
            """round(CAST('1.2825498' AS DOUBLE)
              | * CAST('1000000.0' AS DOUBLE)
              | / (sl2 * CAST('0.693147' AS DOUBLE)), 6) AS k_hat"""
              .stripMargin,
            """CAST(round(ml2 + CAST('0.450054' AS DOUBLE) * sl2)
              | AS BIGINT) AS l2lam""".stripMargin,
            "round(sl2, 6) AS s_log2_e6")
          .withColumn("lambda_cents", Sketches.pow2E6Expr("l2lam"))
          .selectExpr("n", "k_hat", "s_log2_e6", "lambda_cents")
      },
      Some {
        val l = Bm25.log2E6Sql("y")
        val lam = Sketches.pow2E6Sql("l2lam")
        s"""WITH b AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
           |  FROM orders
           |  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > 0),
           |lg AS (SELECT $l AS l FROM b),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |             CAST(sum(l) AS HUGEINT) AS sl,
           |             sum(CAST(l AS HUGEINT) * l) AS ql FROM lg),
           |t AS (SELECT n,
           |        sqrt(CAST(CAST(n AS HUGEINT) * ql - sl * sl
           |          AS DOUBLE)) / CAST(n AS DOUBLE) AS sl2,
           |        CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) AS ml2
           |      FROM m),
           |r AS (SELECT n,
           |        round(CAST('1.2825498' AS DOUBLE)
           |          * CAST('1000000.0' AS DOUBLE)
           |          / (sl2 * CAST('0.693147' AS DOUBLE)), 6) AS k_hat,
           |        CAST(round(ml2 + CAST('0.450054' AS DOUBLE) * sl2)
           |          AS BIGINT) AS l2lam,
           |        round(sl2, 6) AS s_log2_e6
           |      FROM t)
           |SELECT n, k_hat, s_log2_e6, $lam AS lambda_cents
           |FROM r""".stripMargin
      }),

    // ── Monthly new/retained/resurrected/churned decomposition.
    QueryDef("q_growth_accounting",
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id").as("u"),
            expr("unix_micros(ts) div 2592000000000").as("m"))
          .distinct()
          .localCheckpoint(false) // mau + retained join + first month
        val firstM = act.groupBy(col("u")).agg(min(col("m")).as("fm"))
        val prev = act.select(col("u"), (col("m") + 1).as("m"),
          lit(1L).as("was_active"))
        val cur = act.join(broadcast(firstM), "u")
          .join(prev, Seq("u", "m"), "left")
          .groupBy(col("m"))
          .agg(count(lit(1)).as("mau"),
            sum(expr("CASE WHEN fm = m THEN 1 ELSE 0 END")).as("new_u"),
            sum(expr("CASE WHEN was_active = 1 THEN 1 ELSE 0 END"))
              .as("retained"))
          .withColumn("resurrected",
            expr("mau - new_u - retained"))
        val churn = act.select(col("u"), (col("m") + 1).as("m"))
          .join(act.select(col("u"), col("m"), lit(1L).as("still")),
            Seq("u", "m"), "left")
          .groupBy(col("m"))
          .agg(sum(expr("CASE WHEN still IS NULL THEN 1 ELSE 0 END"))
            .as("churned"))
        cur.join(churn, Seq("m"), "left")
          .selectExpr("m", "mau", "new_u", "retained", "resurrected",
            "coalesce(churned, 0L) AS churned",
            """CASE WHEN coalesce(churned, 0L) = 0 THEN NULL
              |ELSE (new_u + resurrected) * 1000000
              |  div coalesce(churned, 0L) END AS quick_ratio_e6"""
              .stripMargin)
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id AS u,
             |         epoch_us(ts) // 2592000000000 AS m
             |  FROM events),
             |fm AS (SELECT u, min(m) AS fm FROM act GROUP BY 1),
             |cur AS (SELECT a.m AS m, CAST(count(*) AS BIGINT) AS mau,
             |          CAST(sum(CASE WHEN f.fm = a.m THEN 1 ELSE 0 END)
             |            AS BIGINT) AS new_u,
             |          CAST(sum(CASE WHEN p.u IS NOT NULL THEN 1
             |                        ELSE 0 END) AS BIGINT) AS retained
             |        FROM act a
             |        JOIN fm f ON f.u = a.u
             |        LEFT JOIN act p ON p.u = a.u AND p.m = a.m - 1
             |        GROUP BY 1),
             |churn AS (SELECT a.m + 1 AS m,
             |            CAST(sum(CASE WHEN nx.u IS NULL THEN 1
             |                          ELSE 0 END) AS BIGINT) AS churned
             |          FROM act a
             |          LEFT JOIN act nx ON nx.u = a.u AND nx.m = a.m + 1
             |          GROUP BY 1)
             |SELECT c.m AS m, mau, new_u, retained,
             |       mau - new_u - retained AS resurrected,
             |       coalesce(churned, 0) AS churned,
             |       CASE WHEN coalesce(churned, 0) = 0 THEN NULL
             |       ELSE (new_u + (mau - new_u - retained)) * 1000000
             |         // coalesce(churned, 0) END AS quick_ratio_e6
             |FROM cur c LEFT JOIN churn ch ON ch.m = c.m""".stripMargin)),

    // ── Upper/lower tail dependence of (spend, order count) ranks.
    QueryDef("q_tail_dependence",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val per = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("x"), count(lit(1)).as("yc"))
        val ranked = per
          .withColumn("rx", row_number().over(
            Window.orderBy(col("x"), col("o_custkey"))).cast("long"))
          .withColumn("ry", row_number().over(
            Window.orderBy(col("yc"), col("o_custkey"))).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy()).cast("long"))
        val qs = s.range(0, 2).select(
          expr("element_at(array(750L, 900L), CAST(id + 1 AS INT))")
            .as("q_e3"))
        ranked.crossJoin(broadcast(qs))
          .withColumn("k", expr("(q_e3 * n) div 1000"))
          .groupBy(col("q_e3"))
          .agg(max(col("n")).as("n"), max(col("k")).as("k"),
            sum(expr("CASE WHEN rx > k AND ry > k THEN 1 ELSE 0 END"))
              .as("joint_hi"),
            sum(expr("CASE WHEN rx <= n - k AND ry <= n - k THEN 1" +
              " ELSE 0 END")).as("joint_lo"))
          .selectExpr("q_e3", "n", "k", "joint_hi", "joint_lo",
            "joint_hi * 1000000 div greatest(1L, n - k) AS lambda_u_e6",
            "joint_lo * 1000000 div greatest(1L, n - k) AS lambda_l_e6",
            "(n - k) * 1000000 div n AS indep_e6")
      },
      Some("""WITH per AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x,
             |         CAST(count(*) AS BIGINT) AS yc
             |  FROM orders GROUP BY 1),
             |rk AS (SELECT o_custkey, x, yc,
             |         CAST(row_number() OVER (ORDER BY x, o_custkey)
             |           AS BIGINT) AS rx,
             |         CAST(row_number() OVER (ORDER BY yc, o_custkey)
             |           AS BIGINT) AS ry,
             |         CAST(count(*) OVER () AS BIGINT) AS n
             |       FROM per),
             |g AS (SELECT q_e3, rx, ry, n, (q_e3 * n) // 1000 AS k
             |      FROM rk CROSS JOIN (VALUES (CAST(750 AS BIGINT)),
             |        (CAST(900 AS BIGINT))) t(q_e3))
             |SELECT q_e3, max(n) AS n, max(k) AS k,
             |       CAST(sum(CASE WHEN rx > k AND ry > k THEN 1
             |                     ELSE 0 END) AS BIGINT) AS joint_hi,
             |       CAST(sum(CASE WHEN rx <= n - k AND ry <= n - k
             |                     THEN 1 ELSE 0 END) AS BIGINT)
             |         AS joint_lo,
             |       CAST(sum(CASE WHEN rx > k AND ry > k THEN 1
             |                     ELSE 0 END) AS BIGINT) * 1000000
             |         // greatest(1, max(n) - max(k)) AS lambda_u_e6,
             |       CAST(sum(CASE WHEN rx <= n - k AND ry <= n - k
             |                     THEN 1 ELSE 0 END) AS BIGINT) * 1000000
             |         // greatest(1, max(n) - max(k)) AS lambda_l_e6,
             |       (max(n) - max(k)) * 1000000 // max(n) AS indep_e6
             |FROM g GROUP BY 1""".stripMargin))
  )
}
