package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Sketches}
import org.apache.spark.sql.functions._

/** Round-169 batch — doubly-robust causal inference, GLM fitting, and
  * the welfare-economics closer of the inequality family:
  *
  *  - AIPW ATT (`q_aipw_att`): augmented IPW — propensity from the
  *    mktsegment strata (as q_ipw_att) but the outcome model μ₀ from a
  *    DIFFERENT partition (acctbal bands), so the augmentation term is
  *    non-trivial and the estimator is genuinely doubly robust:
  *    consistent if EITHER model is right. One checkpointed
  *    orders⋈customer base feeds the propensity map, the outcome map,
  *    and the residual aggregate; both maps join back as broadcasts.
  *  - Poisson IRLS (`q_poisson_irls`): one Newton/IRLS step for daily
  *    order counts on a weekend indicator, from the intercept-only
  *    start β=(ln ȳ, 0) — where the step has a CLOSED exact-rational
  *    form (constant weights): β₁' = (ȳ₁−ȳ₀)/ȳ. Reported next to the
  *    exact MLE β₁* = ln(ȳ₁/ȳ₀) via the fixed-point log₂ ladder
  *    ([[Bm25.log2E6]]) — the one-step-vs-converged gap is the query's
  *    read-out. Day axis = epoch-day; weekend = day%7 ∈ {2,3} (the
  *    house dow convention, Round46).
  *  - Atkinson index (`q_atkinson`): A(ε=1) = 1 − geomean/mean over
  *    positive customer spend — the inequality measure with an explicit
  *    social-welfare interpretation, closing the family next to
  *    q_gini / q_theil_index / q_mld / q_palma_ratio. The geometric
  *    mean runs entirely on the integer log₂/2^x ladders
  *    ([[Bm25.log2E6]], [[Sketches.pow2E6Expr]]) — engine-portable by
  *    construction, cross-row sums are integer sums.
  */
object Round169Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── AIPW: e(seg) propensity, μ₀(band) outcome model.
    QueryDef("q_aipw_att",
      (s, d) => {
        val base = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment").as("seg"),
              expr("(CAST(floor(c_acctbal) AS BIGINT) + 1000) div 2000")
                .as("band"))),
            col("o_custkey") === col("c_custkey"))
          .selectExpr("seg", "band",
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END" +
              " AS g",
            "CAST(floor(o_totalprice) AS BIGINT) div 100 AS y")
          .localCheckpoint(false) // propensity map + outcome map + terms
        val prop = base.groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("g")).as("n1"))
          .selectExpr("seg",
            """least(1000000000L, (n1 * 1000000 div n) * 1000000
              | div greatest(1L, 1000000 - n1 * 1000000 div n))
              | AS w_e6""".stripMargin)
        val mu0 = base.where(col("g") === 0).groupBy(col("band"))
          .agg(expr("sum(y) div count(*)").as("m0"))
        base.join(broadcast(prop), "seg")
          .join(broadcast(mu0), Seq("band"), "left")
          .selectExpr("g", "w_e6", "y", "coalesce(m0, 0L) AS m0")
          .agg(sum(col("g")).as("n_treated"),
            sum(lit(1L) - col("g")).as("n_control"),
            sum(expr("g * (y - m0)")).as("t_resid"),
            sum(expr("(1 - g) * w_e6 * (y - m0)")).as("c_resid_e6"))
          .selectExpr("n_treated", "n_control", "t_resid", "c_resid_e6",
            """round((CAST(t_resid AS DOUBLE)
              | - CAST(c_resid_e6 AS DOUBLE)
              |   / CAST('1000000.0' AS DOUBLE))
              | / CAST(n_treated AS DOUBLE), 6) AS att_aipw_h"""
              .stripMargin)
      },
      Some("""WITH base AS (
             |  SELECT c_mktsegment AS seg,
             |         (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 2000
             |           AS band,
             |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1
             |              ELSE 0 END AS g,
             |         CAST(floor(o_totalprice) AS BIGINT) // 100 AS y
             |  FROM orders JOIN customer ON c_custkey = o_custkey),
             |prop AS (SELECT seg,
             |           least(1000000000,
             |             (CAST(sum(g) AS BIGINT) * 1000000
             |               // CAST(count(*) AS BIGINT)) * 1000000
             |             // greatest(1, 1000000
             |               - CAST(sum(g) AS BIGINT) * 1000000
             |                 // CAST(count(*) AS BIGINT))) AS w_e6
             |         FROM base GROUP BY 1),
             |mu0 AS (SELECT band,
             |          CAST(sum(y) AS BIGINT)
             |            // CAST(count(*) AS BIGINT) AS m0
             |        FROM base WHERE g = 0 GROUP BY 1),
             |j AS (SELECT g, w_e6, y, coalesce(m0, 0) AS m0
             |      FROM base
             |      JOIN prop USING (seg)
             |      LEFT JOIN mu0 USING (band)),
             |agg AS (SELECT CAST(sum(g) AS BIGINT) AS n_treated,
             |               CAST(sum(1 - g) AS BIGINT) AS n_control,
             |               CAST(sum(g * (y - m0)) AS BIGINT) AS t_resid,
             |               CAST(sum((1 - g) * w_e6 * (y - m0))
             |                 AS BIGINT) AS c_resid_e6
             |        FROM j)
             |SELECT n_treated, n_control, t_resid, c_resid_e6,
             |       round((CAST(t_resid AS DOUBLE)
             |         - CAST(c_resid_e6 AS DOUBLE)
             |           / CAST('1000000.0' AS DOUBLE))
             |         / CAST(n_treated AS DOUBLE), 6) AS att_aipw_h
             |FROM agg""".stripMargin)),

    // ── One Poisson IRLS step vs the exact MLE on a binary covariate.
    QueryDef("q_poisson_irls",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            .as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("y"))
          .selectExpr("CASE WHEN day % 7 IN (2, 3) THEN 1L ELSE 0L END" +
            " AS x", "y")
        val g = daily.groupBy(col("x"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        val w = g.agg(
          max(when(col("x") === 1, col("n"))).as("n1"),
          max(when(col("x") === 1, col("sy"))).as("s1"),
          max(when(col("x") === 0, col("n"))).as("n0"),
          max(when(col("x") === 0, col("sy"))).as("s0"))
        w.withColumn("l1", Bm25.log2E6(expr("s1 * n0")))
          .withColumn("l0", Bm25.log2E6(expr("s0 * n1")))
          .selectExpr("n1 AS n_weekend_days", "n0 AS n_weekday_days",
            "s1 AS orders_weekend", "s0 AS orders_weekday",
            """round(CAST((s1 * n0 - s0 * n1) * (n0 + n1) AS DOUBLE)
              | / CAST(n1 * n0 AS DOUBLE)
              | / CAST(s0 + s1 AS DOUBLE), 6) AS beta1_step"""
              .stripMargin,
            """round(CAST(l1 - l0 AS DOUBLE)
              | * CAST('0.693147' AS DOUBLE)
              | / CAST('1000000.0' AS DOUBLE), 6) AS beta1_mle"""
              .stripMargin)
      },
      Some {
        val l1 = Bm25.log2E6Sql("s1 * n0")
        val l0 = Bm25.log2E6Sql("s0 * n1")
        s"""WITH daily AS (
           |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
           |         CAST(count(*) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |lab AS (SELECT CASE WHEN day % 7 IN (2, 3) THEN 1 ELSE 0 END
           |                 AS x, y
           |        FROM daily),
           |g AS (SELECT x, CAST(count(*) AS BIGINT) AS n,
           |             CAST(sum(y) AS BIGINT) AS sy
           |      FROM lab GROUP BY 1),
           |w AS (SELECT max(CASE WHEN x = 1 THEN n END) AS n1,
           |             max(CASE WHEN x = 1 THEN sy END) AS s1,
           |             max(CASE WHEN x = 0 THEN n END) AS n0,
           |             max(CASE WHEN x = 0 THEN sy END) AS s0
           |      FROM g)
           |SELECT n1 AS n_weekend_days, n0 AS n_weekday_days,
           |       s1 AS orders_weekend, s0 AS orders_weekday,
           |       round(CAST((s1 * n0 - s0 * n1) * (n0 + n1) AS DOUBLE)
           |         / CAST(n1 * n0 AS DOUBLE)
           |         / CAST(s0 + s1 AS DOUBLE), 6) AS beta1_step,
           |       round(CAST($l1 - $l0 AS DOUBLE)
           |         * CAST('0.693147' AS DOUBLE)
           |         / CAST('1000000.0' AS DOUBLE), 6) AS beta1_mle
           |FROM w""".stripMargin
      }),

    // ── Atkinson A(1) = 1 − geomean/mean over positive customer spend.
    QueryDef("q_atkinson",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("y"))
          .where(col("y") > 0)
        val m = spend
          .withColumn("l", Bm25.log2E6(col("y")))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("l")).as("sl"))
          .selectExpr("n", "sy div n AS mean_cents", "sl div n AS mlog")
        m.withColumn("geo", Sketches.pow2E6Expr("mlog"))
          .selectExpr("n", "mean_cents", "geo AS geomean_cents",
            "1000000 - geo * 1000000 div mean_cents AS atkinson_e6")
      },
      Some {
        val l = Bm25.log2E6Sql("y")
        val geo = Sketches.pow2E6Sql("mlog")
        s"""WITH spend AS (
           |  SELECT o_custkey,
           |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
           |           AS BIGINT)) AS BIGINT) AS y
           |  FROM orders GROUP BY 1),
           |pos AS (SELECT y, $l AS l FROM spend WHERE y > 0),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |             CAST(sum(y) AS BIGINT) AS sy,
           |             CAST(sum(l) AS BIGINT) AS sl
           |      FROM pos),
           |r AS (SELECT n, sy // n AS mean_cents, sl // n AS mlog FROM m)
           |SELECT n, mean_cents, $geo AS geomean_cents,
           |       1000000 - $geo * 1000000 // mean_cents AS atkinson_e6
           |FROM r""".stripMargin
      })
  )
}
