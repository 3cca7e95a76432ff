package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-172 batch — the diagnostics that make the causal family
  * OPERABLE (every weighting pipeline ships these two read-outs next to
  * its estimate), plus a multi-criteria decision operator:
  *
  *  - Effective sample size (`q_ess_weights`): ESS = (Σw)²/Σw² and the
  *    design effect n/ESS for the ATT control weights of q_ipw_att /
  *    q_aipw_att, per stratum and pooled — how much information the
  *    reweighting actually left. Stratum-constant weights make every
  *    term a closed product of (n₀, w); one keyed agg, one tiny rollup.
  *  - Standardized mean difference (`q_smd_balance`): the
  *    covariate-balance table (love-plot row) for acctbal —
  *    SMD = (m_t−m_c)/√((v_t+v_c)/2) BEFORE and AFTER IPW weighting.
  *    The weighted moments stay integer (w_e6 × cents products in
  *    decimal(38,0)); each SMD closes in one double chain.
  *  - TOPSIS (`q_topsis_suppliers`): rank suppliers by closeness to the
  *    ideal point over three criteria (revenue ↑, avg discount given ↓,
  *    part variety ↑), min-max normalized to e6 integers; d⁺/d⁻ are
  *    per-row scalar √ chains (portable), top-10 by closeness with a
  *    full tie-break. The standard MCDM read absent from the ranking
  *    family (q_skyline gives the frontier, TOPSIS gives the order).
  */
object Round172Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── ESS / design effect of the per-stratum ATT control weights.
    QueryDef("q_ess_weights",
      (s, d) => {
        val st = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
          .selectExpr("seg",
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END" +
              " AS g")
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("g")).as("n1"))
          .selectExpr("seg", "n - n1 AS n0",
            """least(1000000000L, (n1 * 1000000 div n) * 1000000
              | div greatest(1L, 1000000 - n1 * 1000000 div n))
              | AS w_e6""".stripMargin)
          .localCheckpoint(false) // per-stratum rows + pooled rollup
        val per = st.selectExpr("seg", "n0", "w_e6",
          s"CAST(n0 AS $dec) * w_e6 AS sw",
          s"CAST(n0 AS $dec) * w_e6 * w_e6 AS sww")
        val pooled = per.agg(sum(col("n0")).as("n0"),
            sum(col("sw")).as("sw"), sum(col("sww")).as("sww"))
          .selectExpr("'ALL' AS seg", "CAST(n0 AS BIGINT) AS n0",
            "CAST(NULL AS BIGINT) AS w_e6", "sw", "sww")
        per.selectExpr("seg", "CAST(n0 AS BIGINT) AS n0", "w_e6",
            "sw", "sww")
          .unionByName(pooled)
          .selectExpr("seg", "n0", "w_e6",
            """CASE WHEN sww = 0 THEN NULL
              |ELSE round(CAST(sw * sw AS DOUBLE) / CAST(sww AS DOUBLE),
              |  6) END AS ess""".stripMargin,
            """CASE WHEN sw = 0 THEN NULL
              |ELSE round(CAST(n0 AS DOUBLE) * CAST(sww AS DOUBLE)
              |  / CAST(sw AS DOUBLE) / CAST(sw AS DOUBLE), 6)
              |END AS deff""".stripMargin)
      },
      Some("""WITH st AS (
             |  SELECT c_mktsegment AS seg,
             |         CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n1
             |  FROM orders JOIN customer ON c_custkey = o_custkey
             |  GROUP BY 1),
             |w AS (SELECT seg, n - n1 AS n0,
             |        least(1000000000, (n1 * 1000000 // n) * 1000000
             |          // greatest(1, 1000000 - n1 * 1000000 // n))
             |          AS w_e6
             |      FROM st),
             |per AS (SELECT seg, n0, w_e6,
             |          CAST(n0 AS HUGEINT) * w_e6 AS sw,
             |          CAST(n0 AS HUGEINT) * w_e6 * w_e6 AS sww
             |        FROM w),
             |pooled AS (SELECT 'ALL' AS seg,
             |             CAST(sum(n0) AS BIGINT) AS n0,
             |             CAST(NULL AS BIGINT) AS w_e6,
             |             sum(sw) AS sw, sum(sww) AS sww FROM per),
             |u AS (SELECT seg, n0, w_e6, sw, sww FROM per
             |      UNION ALL SELECT * FROM pooled)
             |SELECT seg, n0, w_e6,
             |       CASE WHEN sww = 0 THEN NULL
             |       ELSE round(CAST(sw * sw AS DOUBLE)
             |         / CAST(sww AS DOUBLE), 6) END AS ess,
             |       CASE WHEN sw = 0 THEN NULL
             |       ELSE round(CAST(n0 AS DOUBLE) * CAST(sww AS DOUBLE)
             |         / CAST(sw AS DOUBLE) / CAST(sw AS DOUBLE), 6)
             |       END AS deff
             |FROM u""".stripMargin)),

    // ── SMD before/after IPW weighting, one pooled row.
    QueryDef("q_smd_balance",
      (s, d) => {
        val base = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment").as("seg"),
              floor(col("c_acctbal") * 100 + 0.5).cast("long").as("x"))),
            col("o_custkey") === col("c_custkey"))
          .selectExpr("seg", "x",
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END" +
              " AS g")
          .localCheckpoint(false) // weight map + moment agg
        val wmap = base.groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("g")).as("n1"))
          .selectExpr("seg",
            """least(1000000000L, (n1 * 1000000 div n) * 1000000
              | div greatest(1L, 1000000 - n1 * 1000000 div n))
              | AS w_e6""".stripMargin)
        val m = base.join(broadcast(wmap), "seg")
          .selectExpr("g", "x",
            "CASE WHEN g = 1 THEN 1000000L ELSE w_e6 END AS w")
          .agg(
            sum(col("g")).as("nt"), sum(lit(1L) - col("g")).as("nc"),
            sum(expr("g * x")).as("sxt"),
            sum(expr("(1 - g) * x")).as("sxc"),
            sum(expr(s"g * CAST(x AS $dec) * x")).as("qxt"),
            sum(expr(s"(1 - g) * CAST(x AS $dec) * x")).as("qxc"),
            sum(expr(s"(1 - g) * CAST(w AS $dec)")).as("swc"),
            sum(expr(s"(1 - g) * CAST(w AS $dec) * x")).as("swxc"),
            sum(expr(s"(1 - g) * CAST(w AS $dec) * x * x")).as("swxxc"))
        m.selectExpr("nt", "nc",
            """round((CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)
              | - CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE))
              | / sqrt(((CAST(qxt AS DOUBLE) / CAST(nt AS DOUBLE)
              |   - (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE))
              |     * (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)))
              |  + (CAST(qxc AS DOUBLE) / CAST(nc AS DOUBLE)
              |   - (CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE))
              |     * (CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE))))
              |  / CAST('2.0' AS DOUBLE)), 6) AS smd_before"""
              .stripMargin,
            """round((CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)
              | - CAST(swxc AS DOUBLE) / CAST(swc AS DOUBLE))
              | / sqrt(((CAST(qxt AS DOUBLE) / CAST(nt AS DOUBLE)
              |   - (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE))
              |     * (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)))
              |  + (CAST(swxxc AS DOUBLE) / CAST(swc AS DOUBLE)
              |   - (CAST(swxc AS DOUBLE) / CAST(swc AS DOUBLE))
              |     * (CAST(swxc AS DOUBLE) / CAST(swc AS DOUBLE))))
              |  / CAST('2.0' AS DOUBLE)), 6) AS smd_after"""
              .stripMargin)
      },
      Some("""WITH base AS (
             |  SELECT c_mktsegment AS seg,
             |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x,
             |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1
             |              ELSE 0 END AS g
             |  FROM orders JOIN customer ON c_custkey = o_custkey),
             |wm AS (SELECT seg,
             |         least(1000000000,
             |           (CAST(sum(g) AS BIGINT) * 1000000
             |             // CAST(count(*) AS BIGINT)) * 1000000
             |           // greatest(1, 1000000
             |             - CAST(sum(g) AS BIGINT) * 1000000
             |               // CAST(count(*) AS BIGINT))) AS w_e6
             |       FROM base GROUP BY 1),
             |j AS (SELECT g, x,
             |        CASE WHEN g = 1 THEN 1000000 ELSE w_e6 END AS w
             |      FROM base JOIN wm USING (seg)),
             |m AS (SELECT CAST(sum(g) AS BIGINT) AS nt,
             |             CAST(sum(1 - g) AS BIGINT) AS nc,
             |             CAST(sum(g * x) AS BIGINT) AS sxt,
             |             CAST(sum((1 - g) * x) AS BIGINT) AS sxc,
             |             sum(g * CAST(x AS HUGEINT) * x) AS qxt,
             |             sum((1 - g) * CAST(x AS HUGEINT) * x) AS qxc,
             |             sum((1 - g) * CAST(w AS HUGEINT)) AS swc,
             |             sum((1 - g) * CAST(w AS HUGEINT) * x) AS swxc,
             |             sum((1 - g) * CAST(w AS HUGEINT) * x * x)
             |               AS swxxc
             |      FROM j)
             |SELECT nt, nc,
             |       round((CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)
             |         - CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE))
             |         / sqrt(((CAST(qxt AS DOUBLE) / CAST(nt AS DOUBLE)
             |           - (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE))
             |             * (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)))
             |          + (CAST(qxc AS DOUBLE) / CAST(nc AS DOUBLE)
             |           - (CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE))
             |             * (CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE))))
             |          / CAST('2.0' AS DOUBLE)), 6) AS smd_before,
             |       round((CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)
             |         - CAST(swxc AS DOUBLE) / CAST(swc AS DOUBLE))
             |         / sqrt(((CAST(qxt AS DOUBLE) / CAST(nt AS DOUBLE)
             |           - (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE))
             |             * (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE)))
             |          + (CAST(swxxc AS DOUBLE) / CAST(swc AS DOUBLE)
             |           - (CAST(swxc AS DOUBLE) / CAST(swc AS DOUBLE))
             |             * (CAST(swxc AS DOUBLE) / CAST(swc AS DOUBLE))))
             |          / CAST('2.0' AS DOUBLE)), 6) AS smd_after
             |FROM m""".stripMargin)),

    // ── TOPSIS: top-10 suppliers by closeness to the ideal point.
    QueryDef("q_topsis_suppliers",
      (s, d) => {
        val crit = Tables.lineitem(s, d)
          .groupBy(col("l_suppkey"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)
            .cast("long")).as("rev"),
            expr("sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))" +
              " * 100 div count(*)").as("disc_e2"),
            expr("CAST(count(DISTINCT l_partkey) AS BIGINT)")
              .as("variety"))
          .localCheckpoint(false) // bounds + normalize
        val bounds = crit.agg(
          min(col("rev")).as("rev_lo"), max(col("rev")).as("rev_hi"),
          min(col("disc_e2")).as("d_lo"), max(col("disc_e2")).as("d_hi"),
          min(col("variety")).as("v_lo"), max(col("variety")).as("v_hi"))
        crit.crossJoin(broadcast(bounds))
          .selectExpr("l_suppkey",
            "(rev - rev_lo) * 1000000 div greatest(1L, rev_hi - rev_lo)" +
              " AS n1",
            // cost criterion: flip so 1e6 is best (lowest discount)
            "(d_hi - disc_e2) * 1000000 div greatest(1L, d_hi - d_lo)" +
              " AS n2",
            "(variety - v_lo) * 1000000 div greatest(1L, v_hi - v_lo)" +
              " AS n3")
          .selectExpr("l_suppkey", "n1", "n2", "n3",
            """sqrt(CAST((1000000 - n1) * (1000000 - n1)
              | + (1000000 - n2) * (1000000 - n2)
              | + (1000000 - n3) * (1000000 - n3) AS DOUBLE)) AS dp"""
              .stripMargin,
            """sqrt(CAST(n1 * n1 + n2 * n2 + n3 * n3 AS DOUBLE))
              | AS dm""".stripMargin)
          .selectExpr("l_suppkey", "n1", "n2", "n3",
            """CAST(round(dm * CAST('1000000.0' AS DOUBLE) / (dp + dm))
              | AS BIGINT) AS closeness_e6""".stripMargin)
          .orderBy(col("closeness_e6").desc, col("l_suppkey"))
          .limit(10)
      },
      Some("""WITH crit AS (
             |  SELECT l_suppkey,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS rev,
             |         CAST(sum(CAST(floor(l_discount * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) * 100
             |           // CAST(count(*) AS BIGINT) AS disc_e2,
             |         CAST(count(DISTINCT l_partkey) AS BIGINT)
             |           AS variety
             |  FROM lineitem GROUP BY 1),
             |b AS (SELECT min(rev) AS rev_lo, max(rev) AS rev_hi,
             |             min(disc_e2) AS d_lo, max(disc_e2) AS d_hi,
             |             min(variety) AS v_lo, max(variety) AS v_hi
             |      FROM crit),
             |nrm AS (SELECT l_suppkey,
             |          (rev - rev_lo) * 1000000
             |            // greatest(1, rev_hi - rev_lo) AS n1,
             |          (d_hi - disc_e2) * 1000000
             |            // greatest(1, d_hi - d_lo) AS n2,
             |          (variety - v_lo) * 1000000
             |            // greatest(1, v_hi - v_lo) AS n3
             |        FROM crit CROSS JOIN b),
             |dist AS (SELECT l_suppkey, n1, n2, n3,
             |           sqrt(CAST((1000000 - n1) * (1000000 - n1)
             |             + (1000000 - n2) * (1000000 - n2)
             |             + (1000000 - n3) * (1000000 - n3) AS DOUBLE))
             |             AS dp,
             |           sqrt(CAST(n1 * n1 + n2 * n2 + n3 * n3
             |             AS DOUBLE)) AS dm
             |         FROM nrm)
             |SELECT l_suppkey, n1, n2, n3,
             |       CAST(round(dm * CAST('1000000.0' AS DOUBLE)
             |         / (dp + dm)) AS BIGINT) AS closeness_e6
             |FROM dist
             |ORDER BY closeness_e6 DESC, l_suppkey
             |LIMIT 10""".stripMargin))
  )
}
