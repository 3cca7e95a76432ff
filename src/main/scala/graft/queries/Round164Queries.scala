package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-164: inverse-propensity-weighted ATT (`q_ipw_att`) — the
  * third leg of the causal-estimator family next to q_nn_matching_att
  * (matching) and q_stratified_ate (stratification). Propensity is the
  * exact empirical treatment rate per stratum (mktsegment), control
  * rows reweight by e/(1−e) toward the treated covariate distribution,
  * and the ATT is treated mean minus the weighted control mean — all
  * integer (weights e6, clamped at 1e9 like q_meta_fixed so a
  * near-degenerate stratum cannot overflow a moment). The naive
  * unadjusted difference rides along as the confounding read-out.
  */
object Round164Queries {

  def defs: Seq[QueryDef] = Seq(

    QueryDef("q_ipw_att",
      (s, d) => {
        val o = Tables.orders(s, d).selectExpr("o_custkey",
          "CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END AS g",
          "CAST(floor(o_totalprice) AS BIGINT) div 100 AS y")
        val cust = Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"),
            col("c_mktsegment").as("seg"))
        val strata = o.join(broadcast(cust), "o_custkey")
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("g")).as("n1"),
            sum(col("g") * col("y")).as("sy1"),
            sum((lit(1L) - col("g")) * col("y")).as("sy0"))
          .withColumn("n0", col("n") - col("n1"))
          .withColumn("e_e6", expr("n1 * 1000000 div n"))
          // ATT weight for controls: e/(1−e), e6, clamped (degenerate
          // all-treated strata would otherwise blow the moment)
          .withColumn("w_e6", least(lit(1000000000L),
            expr("e_e6 * 1000000 div greatest(1L, 1000000 - e_e6)")))
        strata.agg(sum(col("n1")).as("n_treated"),
            sum(col("n0")).as("n_control"),
            expr("sum(sy1) div greatest(1L, sum(n1))").as("mt"),
            expr("sum(sy0) div greatest(1L, sum(n0))").as("mc_naive"),
            expr("sum(w_e6 * sy0) div greatest(1L, sum(w_e6 * n0))")
              .as("mc_ipw"))
          .selectExpr("n_treated", "n_control",
            "mt AS treated_mean_h", "mc_naive AS control_mean_h",
            "mc_ipw AS control_mean_ipw_h",
            "mt - mc_naive AS naive_diff_h", "mt - mc_ipw AS att_h")
      },
      Some("""WITH o AS (SELECT o_custkey,
             |                 CASE WHEN o_orderpriority = '1-URGENT'
             |                   THEN 1 ELSE 0 END AS g,
             |                 CAST(floor(o_totalprice) AS BIGINT) // 100
             |                   AS y
             |           FROM orders),
             |cust AS (SELECT c_custkey AS o_custkey, c_mktsegment AS seg
             |         FROM customer),
             |st AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(g) AS BIGINT) AS n1,
             |              CAST(sum(g * y) AS BIGINT) AS sy1,
             |              CAST(sum((1 - g) * y) AS BIGINT) AS sy0
             |       FROM o JOIN cust USING (o_custkey) GROUP BY 1),
             |w AS (SELECT *, n - n1 AS n0,
             |             least(1000000000,
             |               (n1 * 1000000 // n) * 1000000
             |                 // greatest(1, 1000000 - n1 * 1000000 // n))
             |               AS w_e6
             |      FROM st)
             |SELECT CAST(sum(n1) AS BIGINT) AS n_treated,
             |       CAST(sum(n0) AS BIGINT) AS n_control,
             |       CAST(sum(sy1) AS BIGINT) // greatest(1,
             |         CAST(sum(n1) AS BIGINT)) AS treated_mean_h,
             |       CAST(sum(sy0) AS BIGINT) // greatest(1,
             |         CAST(sum(n0) AS BIGINT)) AS control_mean_h,
             |       CAST(sum(w_e6 * sy0) AS BIGINT) // greatest(1,
             |         CAST(sum(w_e6 * n0) AS BIGINT))
             |         AS control_mean_ipw_h,
             |       CAST(sum(sy1) AS BIGINT) // greatest(1,
             |         CAST(sum(n1) AS BIGINT))
             |         - CAST(sum(sy0) AS BIGINT) // greatest(1,
             |           CAST(sum(n0) AS BIGINT)) AS naive_diff_h,
             |       CAST(sum(sy1) AS BIGINT) // greatest(1,
             |         CAST(sum(n1) AS BIGINT))
             |         - CAST(sum(w_e6 * sy0) AS BIGINT) // greatest(1,
             |           CAST(sum(w_e6 * n0) AS BIGINT)) AS att_h
             |FROM w""".stripMargin))
  )
}
