package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-193 batch — extreme-value tail estimation (two routes),
  * records theory, and a customer-value rollup:
  *
  *  - Hill estimator (`q_hill_estimator`): tail index of order value
  *    from the top-k=100 order statistics, ξ̂ = (1/k)Σ ln(x_(i)/x_(k+1)).
  *    The top-(k+1) extraction is a TakeOrderedAndProject (never a
  *    global sort); ties at the boundary are value-identical so row
  *    choice cannot change the estimate. Logs via the shared integer
  *    log₂, ln2 e6 close.
  *  - GPD moment fit (`q_pot_gpd`): peaks-over-threshold with
  *    u = $400k — method-of-moments ξ̂ = ½(1−ȳ²/s²), σ̂ = ½ȳ(ȳ²/s²+1)
  *    over exceedances. Exact BIGINT moments (n·Σy² − (Σy)² form), two
  *    double closes. The parametric tail companion to
  *    q_hill_estimator's nonparametric index.
  *  - Running records (`q_records_count`): number of record-high
  *    revenue days vs the H_n = Σ1/t expectation under exchangeability
  *    — a distribution-free trend probe (records ≫ H_n ⇒ growth). Day
  *    index and record flag from ONE calendar-bounded broadcast
  *    self-join; the harmonic sum is exact integer e6 per term.
  *  - CLV rollup (`q_clv`): per customer nation — average order value,
  *    orders per customer, repeat-customer share, and the
  *    geometric-retention CLV aov·freq·r/(1−r); every factor an exact
  *    integer e6 ratio, composed in decimal.
  *
  * Scale shapes: top-k and grouped aggregates only; the records
  * self-join is days² with the ≤few-thousand-row daily frame broadcast
  * (calendar-bounded, documented); orders⋈customer is a shuffle
  * equi-join. */
object Round193Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Hill tail-index from the top-101 order values.
    QueryDef("q_hill_estimator",
      (s, d) => {
        val topk = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("x"))
          .orderBy(col("x").desc).limit(101)
          .localCheckpoint(false) // 101 rows
        val thr = topk.agg(min(col("x")).as("xk"))
        topk.crossJoin(broadcast(thr))
          .where(col("x") > col("xk"))
          .agg(count(lit(1)).as("k"),
            sum(Bm25.log2E6(col("x")) - Bm25.log2E6(col("xk")))
              .as("sl"))
          .selectExpr("k",
            """CASE WHEN k = 0 THEN NULL
              |ELSE (sl div k) * 693147 div 1000000
              |END AS hill_xi_e6""".stripMargin)
      },
      Some {
        def L(v: String) = s"CAST(${Bm25.log2E6Sql(v)} AS BIGINT)"
        s"""WITH topk AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
           |  FROM orders ORDER BY x DESC LIMIT 101),
           |thr AS (SELECT min(x) AS xk FROM topk),
           |ag AS (SELECT CAST(count(*) AS BIGINT) AS k,
           |         CAST(sum(${L("x")} - ${L("xk")}) AS BIGINT) AS sl
           |       FROM topk CROSS JOIN thr WHERE x > xk)
           |SELECT k,
           |       CASE WHEN k = 0 THEN NULL
           |       ELSE (sl // k) * 693147 // 1000000
           |       END AS hill_xi_e6
           |FROM ag""".stripMargin
      }),

    // ── GPD moment estimators over $400k exceedances.
    QueryDef("q_pot_gpd",
      (s, d) => {
        val y = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)" +
            " - 40000000").as("y"))
          .where(col("y") > 0L)
        y.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(expr(s"CAST(y AS $dec) * y")).as("sy2"))
          .selectExpr("n", "sy div n AS mean_y",
            s"""CASE WHEN n < 2 OR CAST(n AS $dec) * sy2
               |    - CAST(sy AS $dec) * sy <= 0 THEN NULL
               |ELSE CAST(round((CAST('1.0' AS DOUBLE)
               |  - CAST(CAST(sy AS $dec) * sy AS DOUBLE) * (n - 1)
               |    / CAST(n AS DOUBLE)
               |    / CAST(CAST(n AS $dec) * sy2 - CAST(sy AS $dec) * sy
               |        AS DOUBLE))
               |  * CAST('500000.0' AS DOUBLE)) AS BIGINT)
               |END AS xi_e6""".stripMargin,
            s"""CASE WHEN n < 2 OR CAST(n AS $dec) * sy2
               |    - CAST(sy AS $dec) * sy <= 0 THEN NULL
               |ELSE CAST(round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
               |  * (CAST(CAST(sy AS $dec) * sy AS DOUBLE) * (n - 1)
               |     / CAST(n AS DOUBLE)
               |     / CAST(CAST(n AS $dec) * sy2 - CAST(sy AS $dec) * sy
               |         AS DOUBLE)
               |     + CAST('1.0' AS DOUBLE))
               |  * CAST('0.5' AS DOUBLE)) AS BIGINT)
               |END AS sigma_cents""".stripMargin)
      },
      Some("""WITH y AS (
             |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           - 40000000 AS y
             |  FROM orders
             |  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |          - 40000000 > 0),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(y) AS BIGINT) AS sy,
             |         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS sy2
             |       FROM y)
             |SELECT n, sy // n AS mean_y,
             |       CASE WHEN n < 2 OR CAST(n AS HUGEINT) * sy2
             |           - CAST(sy AS HUGEINT) * sy <= 0 THEN NULL
             |       ELSE CAST(round((CAST('1.0' AS DOUBLE)
             |         - CAST(CAST(sy AS HUGEINT) * sy AS DOUBLE) * (n - 1)
             |           / CAST(n AS DOUBLE)
             |           / CAST(CAST(n AS HUGEINT) * sy2
             |               - CAST(sy AS HUGEINT) * sy AS DOUBLE))
             |         * CAST('500000.0' AS DOUBLE)) AS BIGINT)
             |       END AS xi_e6,
             |       CASE WHEN n < 2 OR CAST(n AS HUGEINT) * sy2
             |           - CAST(sy AS HUGEINT) * sy <= 0 THEN NULL
             |       ELSE CAST(round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             |         * (CAST(CAST(sy AS HUGEINT) * sy AS DOUBLE) * (n - 1)
             |            / CAST(n AS DOUBLE)
             |            / CAST(CAST(n AS HUGEINT) * sy2
             |                - CAST(sy AS HUGEINT) * sy AS DOUBLE)
             |            + CAST('1.0' AS DOUBLE))
             |         * CAST('0.5' AS DOUBLE)) AS BIGINT)
             |       END AS sigma_cents
             |FROM ag""".stripMargin)),

    // ── Record-high revenue days vs the H_n expectation.
    QueryDef("q_records_count",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
            .as("x"))
          .localCheckpoint(false) // calendar-bounded, self-joined
        val idx = daily.as("a")
          .join(broadcast(daily.as("b")), col("b.dt") < col("a.dt"),
            "left")
          .groupBy(col("a.dt").as("dt"), col("a.x").as("x"))
          .agg((count(col("b.dt")) + 1L).as("t"),
            sum(when(col("b.x") >= col("a.x"), 1L).otherwise(0L))
              .as("geq"))
        idx.agg(count(lit(1)).as("n_days"),
            sum(when(col("geq").isNull || col("geq") === 0L, 1L)
              .otherwise(0L)).as("records"),
            sum(expr("(1000000000 div t)")).as("h_e9"))
          .selectExpr("n_days", "records", "h_e9 div 1000 AS expected_e6")
      },
      Some("""WITH daily AS (
             |  SELECT o_orderdate AS dt,
             |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |idx AS (SELECT a.dt, a.x,
             |          CAST(count(b.dt) + 1 AS BIGINT) AS t,
             |          CAST(sum(CASE WHEN b.x >= a.x THEN 1 ELSE 0 END)
             |            AS BIGINT) AS geq
             |        FROM daily a LEFT JOIN daily b ON b.dt < a.dt
             |        GROUP BY 1, 2)
             |SELECT CAST(count(*) AS BIGINT) AS n_days,
             |       CAST(sum(CASE WHEN geq IS NULL OR geq = 0
             |         THEN 1 ELSE 0 END) AS BIGINT) AS records,
             |       CAST(sum(1000000000 // t) AS BIGINT) // 1000
             |         AS expected_e6
             |FROM idx""".stripMargin)),

    // ── CLV rollup per customer nation.
    QueryDef("q_clv",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"),
              col("c_nationkey").as("nk")), Seq("o_custkey"))
          .groupBy(col("nk"), col("o_custkey"))
          .agg(count(lit(1)).as("no"),
            sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
              .as("v"))
        perCust.groupBy(col("nk"))
          .agg(count(lit(1)).as("custs"), sum(col("no")).as("orders"),
            sum(col("v")).as("rev"),
            sum(when(col("no") >= 2L, 1L).otherwise(0L)).as("repeats"))
          .selectExpr("nk", "custs", "orders",
            "rev div orders AS aov_cents",
            "orders * 1000000 div custs AS freq_e6",
            "repeats * 1000000 div custs AS retention_e6")
          .selectExpr("nk", "custs", "orders", "aov_cents", "freq_e6",
            "retention_e6",
            s"""CASE WHEN retention_e6 >= 1000000 THEN NULL
               |ELSE CAST(CAST(aov_cents AS $dec) * freq_e6
               |  * retention_e6
               |  div (CAST(1000000 AS $dec)
               |       * (1000000 - retention_e6)) AS BIGINT)
               |END AS clv_cents""".stripMargin)
      },
      Some("""WITH pc AS (
             |  SELECT c_nationkey AS nk, o_custkey,
             |         CAST(count(*) AS BIGINT) AS no,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS v
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |ag AS (SELECT nk, CAST(count(*) AS BIGINT) AS custs,
             |         CAST(sum(no) AS BIGINT) AS orders,
             |         CAST(sum(v) AS BIGINT) AS rev,
             |         CAST(sum(CASE WHEN no >= 2 THEN 1 ELSE 0 END)
             |           AS BIGINT) AS repeats
             |       FROM pc GROUP BY 1),
             |k AS (SELECT nk, custs, orders,
             |        rev // orders AS aov_cents,
             |        orders * 1000000 // custs AS freq_e6,
             |        repeats * 1000000 // custs AS retention_e6
             |      FROM ag)
             |SELECT nk, custs, orders, aov_cents, freq_e6, retention_e6,
             |       CASE WHEN retention_e6 >= 1000000 THEN NULL
             |       ELSE CAST(CAST(aov_cents AS HUGEINT) * freq_e6
             |         * retention_e6
             |         // (CAST(1000000 AS HUGEINT)
             |              * (1000000 - retention_e6)) AS BIGINT)
             |       END AS clv_cents
             |FROM k""".stripMargin))
  )
}
