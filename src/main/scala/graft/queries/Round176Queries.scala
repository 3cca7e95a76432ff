package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-176 batch — entropic optimal transport, autocorrelation-robust
  * regression, and a distributed matching primitive:
  *
  *  - Sinkhorn plan (`q_sinkhorn_plan`): two row/column scaling
  *    iterations toward the region×segment transport plan between the
  *    order-count marginals, on a bounded 5×5 matrix. The kernel is
  *    the rational Cauchy kernel 1e6/(1+|i−j|) (deterministic integer —
  *    a Gibbs kernel would need libm exp; the SCALING ALGEBRA, which is
  *    what the operator demonstrates, is kernel-agnostic). Each
  *    half-iteration is one bounded groupBy + a broadcast join-back;
  *    marginal L1 errors after each pass are the convergence read.
  *  - Cochrane–Orcutt (`q_cochrane_orcutt`): one FGLS round for monthly
  *    revenue y on x with AR(1) errors — OLS slope on exact moments,
  *    ρ̂ from integer-cent residual lag products (q_engle_granger's
  *    integerization), then the quasi-differenced refit
  *    (y_t−ρ̂y_{t−1} on x_t−ρ̂x_{t−1}, e6-scaled to stay integer).
  *    The slope-before vs slope-after gap is the serial-correlation
  *    bias read; Durbin–Watson rides along.
  *  - Handshake matching (`q_handshake_matching`): three unrolled
  *    rounds of the classic distributed matching step — an edge joins
  *    the matching iff it is the min-hash-priority edge at BOTH
  *    endpoints; matched vertices drop out and the next round runs on
  *    the residual graph. Per round: TWO per-endpoint min aggregates +
  *    one equi-join — the O(1)-round primitive behind distributed
  *    maximal matching (vs q_luby_mis's independent-set dual). Round
  *    count is a fixed unroll: each round matches ≥ a constant
  *    fraction in expectation; 3 rounds is the demo contract, the
  *    residual edge count is reported honestly.
  */
object Round176Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Two Sinkhorn iterations on the region×segment matrix.
    QueryDef("q_sinkhorn_plan",
      (s, d) => {
        val base = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"),
              col("c_mktsegment").as("seg"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_regionkey").as("rg"))),
            col("c_nationkey") === col("n_nationkey"))
          .selectExpr("CAST(rg AS BIGINT) AS rg", "seg")
          .localCheckpoint(false) // row + column marginals
        val rowM = base.groupBy(col("rg")).agg(count(lit(1)).as("r"))
        val colM = base.groupBy(col("seg")).agg(count(lit(1)).as("cm"))
        val segIdx = colM.selectExpr("seg", "cm",
          """CAST(CASE seg WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
            |WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
            |ELSE 4 END AS BIGINT) AS sj""".stripMargin)
        // kernel grid: K = 1e6 div (1 + |rg − sj|), plan p0 = K
        val grid = rowM.crossJoin(broadcast(segIdx))
          .selectExpr("rg", "seg", "r", "cm",
            "1000000 div (1 + abs(rg - sj)) AS p")
        // iteration 1: row scale then column scale (integer e6 ratios)
        val r1 = grid
          .withColumn("rs", sum(col("p")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("rg")))
          .selectExpr("rg", "seg", "r", "cm",
            s"CAST(p AS $dec) * r * 1000000 div rs AS p")
        val c1 = r1
          .withColumn("cs", sum(col("p")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("seg")))
          .selectExpr("rg", "seg", "r", "cm",
            s"CAST(p AS $dec) * cm * 1000000 div cs AS p")
        val r2 = c1
          .withColumn("rs", sum(col("p")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("rg")))
          .selectExpr("rg", "seg", "r", "cm",
            s"CAST(p AS $dec) * r * 1000000 div rs AS p")
        val c2 = r2
          .withColumn("cs", sum(col("p")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("seg")))
          .selectExpr("rg", "seg", "r", "cm",
            s"CAST(p AS $dec) * cm * 1000000 div cs AS p")
          .localCheckpoint(false)
        // marginal errors of the final plan (plan mass is e6 units)
        val rowErr = c2.groupBy(col("rg"), col("r"))
          .agg(sum(col("p")).as("rs"))
          .agg(sum(expr(s"abs(rs - CAST(r AS $dec) * 1000000)"))
            .as("row_l1_e6"))
        val colErr = c2.groupBy(col("seg"), col("cm"))
          .agg(sum(col("p")).as("cs"))
          .agg(sum(expr(s"abs(cs - CAST(cm AS $dec) * 1000000)"))
            .as("col_l1_e6"))
        c2.selectExpr("rg", "seg", "CAST(p AS BIGINT) AS plan_e6")
          .crossJoin(broadcast(rowErr
            .selectExpr("CAST(row_l1_e6 AS BIGINT) AS row_l1_e6")))
          .crossJoin(broadcast(colErr
            .selectExpr("CAST(col_l1_e6 AS BIGINT) AS col_l1_e6")))
      },
      Some("""WITH base AS (
             |  SELECT CAST(n_regionkey AS BIGINT) AS rg,
             |         c_mktsegment AS seg
             |  FROM orders
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey),
             |rm AS (SELECT rg, CAST(count(*) AS BIGINT) AS r
             |       FROM base GROUP BY 1),
             |cm0 AS (SELECT seg, CAST(count(*) AS BIGINT) AS cm
             |        FROM base GROUP BY 1),
             |si AS (SELECT seg, cm,
             |         CAST(CASE seg WHEN 'AUTOMOBILE' THEN 0
             |           WHEN 'BUILDING' THEN 1 WHEN 'FURNITURE' THEN 2
             |           WHEN 'HOUSEHOLD' THEN 3 ELSE 4 END AS BIGINT)
             |           AS sj
             |       FROM cm0),
             |grid AS (SELECT rg, seg, r, cm,
             |           CAST(1000000 // (1 + abs(rg - sj)) AS HUGEINT)
             |             AS p
             |         FROM rm CROSS JOIN si),
             |r1 AS (SELECT rg, seg, r, cm,
             |         p * r * 1000000 // (sum(p) OVER (PARTITION BY rg))
             |           AS p FROM grid),
             |c1 AS (SELECT rg, seg, r, cm,
             |         p * cm * 1000000 // (sum(p) OVER (PARTITION BY seg))
             |           AS p FROM r1),
             |r2 AS (SELECT rg, seg, r, cm,
             |         p * r * 1000000 // (sum(p) OVER (PARTITION BY rg))
             |           AS p FROM c1),
             |c2 AS (SELECT rg, seg, r, cm,
             |         p * cm * 1000000 // (sum(p) OVER (PARTITION BY seg))
             |           AS p FROM r2),
             |re AS (SELECT CAST(sum(abs(rs - CAST(r AS HUGEINT)
             |         * 1000000)) AS BIGINT) AS row_l1_e6
             |       FROM (SELECT rg, r, sum(p) AS rs FROM c2
             |             GROUP BY 1, 2)),
             |ce AS (SELECT CAST(sum(abs(cs - CAST(cm AS HUGEINT)
             |         * 1000000)) AS BIGINT) AS col_l1_e6
             |       FROM (SELECT seg, cm, sum(p) AS cs FROM c2
             |             GROUP BY 1, 2))
             |SELECT rg, seg, CAST(p AS BIGINT) AS plan_e6,
             |       row_l1_e6, col_l1_e6
             |FROM c2 CROSS JOIN re CROSS JOIN ce""".stripMargin)),

    // ── Cochrane–Orcutt FGLS round on monthly (y = region0, x = region1).
    QueryDef("q_cochrane_orcutt",
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
          .groupBy(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
            " div 2592000000000").as("mo"))
          .agg(sum(when(col("n_regionkey") === 0,
            floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .otherwise(0L)).as("y"),
            sum(when(col("n_regionkey") === 1,
              floor(col("o_totalprice") * 100 + 0.5).cast("long"))
              .otherwise(0L)).as("x"))
          .localCheckpoint(false) // OLS + residual ρ + refit
        def slope(df: org.apache.spark.sql.DataFrame, xc: String,
                  yc: String, out: String) = df
          .agg(count(lit(1)).as("n"), sum(col(xc)).as("sx"),
            sum(col(yc)).as("sy"),
            sum(expr(s"CAST($xc AS $dec) * $xc")).as("sxx"),
            sum(expr(s"CAST($xc AS $dec) * $yc")).as("sxy"))
          .selectExpr("CAST(n AS BIGINT) AS n", "sx", "sy",
            s"""CASE WHEN CAST(n AS $dec) * sxx
               | - CAST(sx AS $dec) * sx = 0 THEN NULL
               |ELSE round(CAST(CAST(n AS $dec) * sxy
               |    - CAST(sx AS $dec) * sy AS DOUBLE)
               |  / CAST(CAST(n AS $dec) * sxx
               |    - CAST(sx AS $dec) * sx AS DOUBLE), 6)
               |END AS $out""".stripMargin)
        val ols = slope(monthly, "x", "y", "beta_ols")
          .selectExpr("n", "beta_ols",
            """round((CAST(sy AS DOUBLE) - beta_ols
              | * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
              | AS alpha_ols""".stripMargin)
        val resid = monthly.crossJoin(broadcast(ols))
          .selectExpr("mo", "x", "y", "n", "beta_ols", "alpha_ols",
            """CAST(round(CAST(y AS DOUBLE) - alpha_ols
              | - beta_ols * CAST(x AS DOUBLE)) AS BIGINT) AS e"""
              .stripMargin)
          .withColumn("el", lag(col("e"), 1).over(Window.orderBy("mo")))
          .withColumn("xl", lag(col("x"), 1).over(Window.orderBy("mo")))
          .withColumn("yl", lag(col("y"), 1).over(Window.orderBy("mo")))
          .localCheckpoint(false) // ρ moments + quasi-differenced refit
        val rho = resid.where(col("el").isNotNull)
          .agg(sum(expr(s"CAST(e AS $dec) * el")).as("num"),
            sum(expr(s"CAST(el AS $dec) * el")).as("den"),
            sum(expr(s"CAST(e - el AS $dec) * (e - el)")).as("dsq"),
            sum(expr(s"CAST(e AS $dec) * e")).as("ess"))
          .selectExpr(
            """CASE WHEN den = 0 THEN NULL
              |ELSE round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
              |END AS rho""".stripMargin,
            """CASE WHEN ess = 0 THEN NULL
              |ELSE round(CAST(dsq AS DOUBLE) / CAST(ess AS DOUBLE), 6)
              |END AS durbin_watson""".stripMargin)
        val quasi = resid.where(col("xl").isNotNull)
          .crossJoin(broadcast(rho))
          .selectExpr("rho", "durbin_watson", "n", "beta_ols",
            """CAST(round(CAST(x AS DOUBLE)
              | - rho * CAST(xl AS DOUBLE)) AS BIGINT) AS xq"""
              .stripMargin,
            """CAST(round(CAST(y AS DOUBLE)
              | - rho * CAST(yl AS DOUBLE)) AS BIGINT) AS yq"""
              .stripMargin)
        slope(quasi, "xq", "yq", "beta_co")
          .selectExpr("beta_co")
          .crossJoin(broadcast(quasi.select(col("rho"),
            col("durbin_watson"), col("beta_ols")).limit(1)))
          .selectExpr("beta_ols", "rho", "durbin_watson", "beta_co")
      },
      Some("""WITH monthly AS (
             |  SELECT epoch_us(o_orderdate) // 2592000000000 AS mo,
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
             |m1 AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(x) AS HUGEINT) AS sx,
             |              CAST(sum(y) AS HUGEINT) AS sy,
             |              sum(CAST(x AS HUGEINT) * x) AS sxx,
             |              sum(CAST(x AS HUGEINT) * y) AS sxy
             |       FROM monthly),
             |ols AS (SELECT n,
             |          round(CAST(n * sxy - sx * sy AS DOUBLE)
             |            / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             |            AS beta_ols, sx, sy FROM m1),
             |ols2 AS (SELECT n, beta_ols,
             |           round((CAST(sy AS DOUBLE) - beta_ols
             |             * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             |             AS alpha_ols FROM ols),
             |resid AS (SELECT mo, x, y, n, beta_ols, alpha_ols,
             |            CAST(round(CAST(y AS DOUBLE) - alpha_ols
             |              - beta_ols * CAST(x AS DOUBLE)) AS BIGINT)
             |              AS e,
             |            lag(CAST(round(CAST(y AS DOUBLE) - alpha_ols
             |              - beta_ols * CAST(x AS DOUBLE)) AS BIGINT))
             |              OVER (ORDER BY mo) AS el,
             |            lag(x) OVER (ORDER BY mo) AS xl,
             |            lag(y) OVER (ORDER BY mo) AS yl
             |          FROM monthly CROSS JOIN ols2),
             |rho AS (SELECT
             |          CASE WHEN sum(CAST(el AS HUGEINT) * el) = 0
             |            THEN NULL
             |          ELSE round(CAST(sum(CAST(e AS HUGEINT) * el)
             |              AS DOUBLE)
             |            / CAST(sum(CAST(el AS HUGEINT) * el)
             |              AS DOUBLE), 6) END AS rho,
             |          CASE WHEN sum(CAST(e AS HUGEINT) * e) = 0
             |            THEN NULL
             |          ELSE round(CAST(sum(CAST(e - el AS HUGEINT)
             |              * (e - el)) AS DOUBLE)
             |            / CAST(sum(CAST(e AS HUGEINT) * e) AS DOUBLE),
             |            6) END AS durbin_watson
             |        FROM resid WHERE el IS NOT NULL),
             |quasi AS (SELECT rho, durbin_watson, beta_ols,
             |            CAST(round(CAST(x AS DOUBLE)
             |              - rho * CAST(xl AS DOUBLE)) AS BIGINT) AS xq,
             |            CAST(round(CAST(y AS DOUBLE)
             |              - rho * CAST(yl AS DOUBLE)) AS BIGINT) AS yq
             |          FROM resid CROSS JOIN rho
             |          WHERE xl IS NOT NULL),
             |m2 AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(xq) AS HUGEINT) AS sx,
             |              CAST(sum(yq) AS HUGEINT) AS sy,
             |              sum(CAST(xq AS HUGEINT) * xq) AS sxx,
             |              sum(CAST(xq AS HUGEINT) * yq) AS sxy
             |       FROM quasi),
             |co AS (SELECT CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |         ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
             |           / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             |         END AS beta_co FROM m2)
             |SELECT beta_ols, rho, durbin_watson, beta_co
             |FROM co CROSS JOIN (SELECT rho, durbin_watson, beta_ols
             |                    FROM quasi LIMIT 1)""".stripMargin)),

    // ── Three handshake-matching rounds on the co-event graph.
    QueryDef("q_handshake_matching",
      (s, d) => {
        def round(edges: org.apache.spark.sql.DataFrame) = {
          val minA = edges.groupBy(col("a"))
            .agg(min(col("pri")).as("pa"))
          val minB = edges.groupBy(col("b"))
            .agg(min(col("pri")).as("pb"))
          val matched = edges.join(minA, "a").join(minB, "b")
            .where(col("pri") === col("pa") && col("pri") === col("pb"))
            .select(col("a"), col("b"))
            .localCheckpoint(false)
          val mv = matched.select(col("a").as("v"))
            .unionByName(matched.select(col("b").as("v")))
            .distinct()
            .localCheckpoint(false)
          val rest = edges
            .join(mv.select(col("v").as("a")), Seq("a"), "left_anti")
            .join(mv.select(col("v").as("b")), Seq("b"), "left_anti")
            .localCheckpoint(false)
          (matched, rest)
        }
        val e0 = Tables.events(s, d)
          .selectExpr("least(user_id % 500, event_id % 500) AS a",
            "greatest(user_id % 500, event_id % 500) AS b")
          .where(col("a") =!= col("b")).distinct()
          .selectExpr("a", "b",
            "md5(concat(CAST(a AS STRING), '_', CAST(b AS STRING)))" +
              " AS pri")
          .localCheckpoint(false)
        val (m1, r1) = round(e0)
        val (m2, r2) = round(r1)
        val (m3, r3) = round(r2)
        val nm = m1.unionByName(m2).unionByName(m3)
          .agg(count(lit(1)).as("matched_edges"))
        val stats = e0.agg(count(lit(1)).as("edges_total"))
        val rest = r3.agg(count(lit(1)).as("edges_residual"))
        val perRound = Seq(m1, m2, m3).zipWithIndex.map { case (m, i) =>
          m.agg(count(lit(1)).as("c"))
            .selectExpr(s"CAST(${i + 1} AS BIGINT) AS round", "c")
        }.reduce(_ unionByName _)
        perRound.crossJoin(broadcast(nm)).crossJoin(broadcast(stats))
          .crossJoin(broadcast(rest))
          .selectExpr("round", "c AS matched_in_round", "matched_edges",
            "edges_total", "edges_residual")
      },
      Some("""WITH e0 AS (
             |  SELECT a, b,
             |         md5(concat(CAST(a AS VARCHAR), '_',
             |           CAST(b AS VARCHAR))) AS pri
             |  FROM (SELECT DISTINCT
             |          least(user_id % 500, event_id % 500) AS a,
             |          greatest(user_id % 500, event_id % 500) AS b
             |        FROM events
             |        WHERE user_id % 500 <> event_id % 500)),
             |m1 AS MATERIALIZED (SELECT a, b FROM (
             |  SELECT e.a, e.b, e.pri,
             |         min(e.pri) OVER (PARTITION BY e.a) AS pa,
             |         min(e.pri) OVER (PARTITION BY e.b) AS pb
             |  FROM e0 e) WHERE pri = pa AND pri = pb),
             |v1 AS (SELECT a AS v FROM m1 UNION SELECT b FROM m1),
             |r1 AS MATERIALIZED (SELECT * FROM e0
             |  WHERE a NOT IN (SELECT v FROM v1)
             |    AND b NOT IN (SELECT v FROM v1)),
             |m2 AS MATERIALIZED (SELECT a, b FROM (
             |  SELECT e.a, e.b, e.pri,
             |         min(e.pri) OVER (PARTITION BY e.a) AS pa,
             |         min(e.pri) OVER (PARTITION BY e.b) AS pb
             |  FROM r1 e) WHERE pri = pa AND pri = pb),
             |v2 AS (SELECT a AS v FROM m2 UNION SELECT b FROM m2),
             |r2 AS MATERIALIZED (SELECT * FROM r1
             |  WHERE a NOT IN (SELECT v FROM v2)
             |    AND b NOT IN (SELECT v FROM v2)),
             |m3 AS MATERIALIZED (SELECT a, b FROM (
             |  SELECT e.a, e.b, e.pri,
             |         min(e.pri) OVER (PARTITION BY e.a) AS pa,
             |         min(e.pri) OVER (PARTITION BY e.b) AS pb
             |  FROM r2 e) WHERE pri = pa AND pri = pb),
             |v3 AS (SELECT a AS v FROM m3 UNION SELECT b FROM m3),
             |r3 AS (SELECT * FROM r2
             |  WHERE a NOT IN (SELECT v FROM v3)
             |    AND b NOT IN (SELECT v FROM v3)),
             |pr AS (SELECT CAST(1 AS BIGINT) AS round,
             |              CAST(count(*) AS BIGINT) AS c FROM m1
             |       UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM m2
             |       UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM m3),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS edges_total
             |        FROM e0),
             |nm AS (SELECT CAST(sum(c) AS BIGINT) AS matched_edges
             |       FROM pr),
             |rr AS (SELECT CAST(count(*) AS BIGINT) AS edges_residual
             |       FROM r3)
             |SELECT round, c AS matched_in_round, matched_edges,
             |       edges_total, edges_residual
             |FROM pr CROSS JOIN nm CROSS JOIN tot CROSS JOIN rr"""
        .stripMargin))
  )
}
