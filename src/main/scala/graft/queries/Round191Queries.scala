package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-191 batch — segregation exposure, forecast-accuracy ratios,
  * forecast-comparison testing, and pooled-marginal agreement:
  *
  *  - Isolation/interaction (`q_isolation_index`): Bell's exposure
  *    indices of high-value orders across customer nations — xPx* =
  *    Σ(h_i/H)(h_i/t_i) and xPy* = Σ(h_i/H)((t_i−h_i)/t_i). The
  *    EXPOSURE half of the segregation toolkit (q_hellinger_tv's TV is
  *    the evenness half). Per-nation terms are exact integer e6
  *    divisions; the two must sum to 1e6 up to per-term truncation.
  *  - Theil's U2 (`q_theil_forecast`): seasonal-naive (lag-12) vs
  *    naive (lag-1) squared-error ratio over monthly revenue — U2 < 1
  *    means seasonality beats persistence. Exact BIGINT error sums on
  *    the SAME month set (both lags must exist), one per-element sqrt.
  *  - Diebold–Mariano (`q_diebold_mariano`): is the lag-12 forecaster
  *    SIGNIFICANTLY better than lag-1? Loss differential d_t = e₁²−e₂²,
  *    DM = d̄/√(γ₀/T) at lag 0 (documented: no HAC correction — monthly
  *    grain, small T). T²γ₀ = T·Σd²−(Σd)² stays exact in decimal; one
  *    double close at the end.
  *  - Scott's π (`q_scott_pi`): chance-corrected first-vs-last line
  *    band agreement per order, with POOLED-marginal chance (π) next to
  *    per-rater-marginal chance (Cohen's κ) — the two classic Ae
  *    conventions on one table, both exact integer e6.
  *
  * Scale shapes: orders⋈customer is a plain shuffle equi-join (both
  * sides SF-bound, co-partitioned on the key); monthly frames are
  * calendar-bounded; the agreement table reuses the Bowker first/last
  * extraction (two shuffle equi-joins on l_orderkey). */
object Round191Queries {

  private val dec = "decimal(38,0)"

  /** month-indexed revenue in hecto-dollars (calendar-bounded). */
  private val monthlySql =
    """WITH monthly AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) * 12
      |           + CAST(month(o_orderdate) AS BIGINT) AS m,
      |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT))
      |           AS BIGINT) AS x
      |  FROM orders GROUP BY 1)""".stripMargin

  private def monthly(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .groupBy((expr("CAST(year(o_orderdate) AS BIGINT)") * 12 +
        expr("CAST(month(o_orderdate) AS BIGINT)")).as("m"))
      .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
        .as("x"))
      .localCheckpoint(false) // calendar-bounded, joined at two lags

  /** per-month (x, naive lag-1, seasonal lag-12), months with both. */
  private def lagged(s: org.apache.spark.sql.SparkSession, d: String) = {
    val mo = monthly(s, d)
    mo.join(broadcast(mo.select((col("m") + 1).as("m"),
        col("x").as("x1"))), Seq("m"))
      .join(broadcast(mo.select((col("m") + 12).as("m"),
        col("x").as("x12"))), Seq("m"))
  }

  private val laggedSql =
    monthlySql +
      """,
        |lagged AS (
        |  SELECT a.m, a.x, b.x AS x1, c.x AS x12
        |  FROM monthly a
        |  JOIN monthly b ON b.m = a.m - 1
        |  JOIN monthly c ON c.m = a.m - 12)""".stripMargin

  /** first-vs-last line quantity band per order (the Bowker table). */
  private def bandPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
        expr("least(CAST(floor(l_quantity + 0.5) AS BIGINT) div 10, 5)")
          .as("g"))
    val ends = li.groupBy(col("ok"))
      .agg(min(col("ln")).as("a"), max(col("ln")).as("b"))
    val fi = ends.join(li.select(col("ok"), col("ln"), col("g").as("i")),
      Seq("ok")).where(col("ln") === col("a")).select(col("ok"), col("i"))
    val la = ends.join(li.select(col("ok"), col("ln"), col("g").as("j")),
      Seq("ok")).where(col("ln") === col("b")).select(col("ok"), col("j"))
    fi.join(la, Seq("ok")).groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // ≤ 36 cells
  }

  private val bandPairsSql =
    """WITH li AS (
      |  SELECT l_orderkey AS ok, l_linenumber AS ln,
      |    least(CAST(floor(l_quantity + 0.5) AS BIGINT) // 10, 5) AS g
      |  FROM lineitem),
      |ends AS (SELECT ok, min(ln) AS a, max(ln) AS b FROM li GROUP BY 1),
      |fi AS (SELECT li.ok, li.g AS i FROM ends
      |       JOIN li ON li.ok = ends.ok AND li.ln = ends.a),
      |la AS (SELECT li.ok, li.g AS j FROM ends
      |       JOIN li ON li.ok = ends.ok AND li.ln = ends.b),
      |pairs AS (SELECT i, j, CAST(count(*) AS BIGINT) AS c
      |          FROM fi JOIN la ON fi.ok = la.ok GROUP BY 1, 2)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Isolation + interaction of high-value orders across nations.
    QueryDef("q_isolation_index",
      (s, d) => {
        val nat = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"),
              col("c_nationkey").as("nk")), Seq("o_custkey"))
          .groupBy(col("nk"))
          .agg(count(lit(1)).as("t"),
            sum(when(col("o_totalprice") >= lit(150000.0), 1L)
              .otherwise(0L)).as("h"))
          .localCheckpoint(false) // 25 nations
        val tot = nat.agg(sum(col("h")).as("hh"))
        nat.crossJoin(broadcast(tot))
          .agg(count(lit(1)).as("n_nations"), max(col("hh")).as("hh"),
            sum(expr("h * h * 1000000 div (hh * t)")).as("isolation_e6"),
            sum(expr("h * (t - h) * 1000000 div (hh * t)"))
              .as("interaction_e6"))
      },
      Some("""WITH nat AS (
             |  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS t,
             |         CAST(sum(CASE WHEN o_totalprice >= 150000.0
             |           THEN 1 ELSE 0 END) AS BIGINT) AS h
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1),
             |tot AS (SELECT CAST(sum(h) AS BIGINT) AS hh FROM nat)
             |SELECT CAST(count(*) AS BIGINT) AS n_nations,
             |       max(hh) AS hh,
             |       CAST(sum(h * h * 1000000 // (hh * t)) AS BIGINT)
             |         AS isolation_e6,
             |       CAST(sum(h * (t - h) * 1000000 // (hh * t))
             |         AS BIGINT) AS interaction_e6
             |FROM nat CROSS JOIN tot""".stripMargin)),

    // ── Theil's U2: seasonal-naive vs naive squared-error ratio.
    QueryDef("q_theil_forecast",
      (s, d) => {
        lagged(s, d)
          .agg(count(lit(1)).as("t_months"),
            sum(expr("(x - x1) * (x - x1)")).as("s1"),
            sum(expr("(x - x12) * (x - x12)")).as("s12"))
          .selectExpr("t_months", "s1", "s12",
            """CASE WHEN s1 = 0 THEN NULL
              |ELSE CAST(round(sqrt(CAST(s12 AS DOUBLE)
              |  / CAST(s1 AS DOUBLE)) * CAST('1000000.0' AS DOUBLE))
              |  AS BIGINT) END AS u2_e6""".stripMargin)
      },
      Some(laggedSql +
        """
          |SELECT CAST(count(*) AS BIGINT) AS t_months,
          |       CAST(sum((x - x1) * (x - x1)) AS BIGINT) AS s1,
          |       CAST(sum((x - x12) * (x - x12)) AS BIGINT) AS s12,
          |       CASE WHEN CAST(sum((x - x1) * (x - x1)) AS BIGINT) = 0
          |       THEN NULL
          |       ELSE CAST(round(sqrt(
          |         CAST(CAST(sum((x - x12) * (x - x12)) AS BIGINT)
          |           AS DOUBLE)
          |         / CAST(CAST(sum((x - x1) * (x - x1)) AS BIGINT)
          |           AS DOUBLE)) * CAST('1000000.0' AS DOUBLE))
          |         AS BIGINT) END AS u2_e6
          |FROM lagged""".stripMargin)),

    // ── Diebold–Mariano on the naive-vs-seasonal loss differential.
    QueryDef("q_diebold_mariano",
      (s, d) => {
        lagged(s, d)
          .withColumn("dd",
            expr("(x - x1) * (x - x1) - (x - x12) * (x - x12)"))
          .agg(count(lit(1)).as("t"), sum(col("dd")).as("sd"),
            sum(expr(s"CAST(dd AS $dec) * dd")).as("sd2"))
          .selectExpr("t", "sd",
            s"""CASE WHEN t < 2 OR CAST(t AS $dec) * sd2
               |    - CAST(sd AS $dec) * sd <= 0 THEN NULL
               |ELSE CAST(round(CAST(sd AS DOUBLE)
               |  * sqrt(CAST(t AS DOUBLE))
               |  / sqrt(CAST(CAST(t AS $dec) * sd2
               |      - CAST(sd AS $dec) * sd AS DOUBLE))
               |  * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
               |END AS dm_e6""".stripMargin)
      },
      Some(laggedSql +
        """,
          |dl AS (SELECT (x - x1) * (x - x1) - (x - x12) * (x - x12)
          |         AS dd FROM lagged),
          |ag AS (SELECT CAST(count(*) AS BIGINT) AS t,
          |         CAST(sum(dd) AS BIGINT) AS sd,
          |         CAST(sum(CAST(dd AS HUGEINT) * dd) AS HUGEINT) AS sd2
          |       FROM dl)
          |SELECT t, sd,
          |       CASE WHEN t < 2 OR CAST(t AS HUGEINT) * sd2
          |           - CAST(sd AS HUGEINT) * sd <= 0 THEN NULL
          |       ELSE CAST(round(CAST(sd AS DOUBLE)
          |         * sqrt(CAST(t AS DOUBLE))
          |         / sqrt(CAST(CAST(t AS HUGEINT) * sd2
          |             - CAST(sd AS HUGEINT) * sd AS DOUBLE))
          |         * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
          |       END AS dm_e6
          |FROM ag""".stripMargin)),

    // ── Scott's pi vs Cohen's kappa on the first/last band table.
    QueryDef("q_scott_pi",
      (s, d) => {
        val pairs = bandPairs(s, d)
        val rows = pairs.groupBy(col("i")).agg(sum(col("c")).as("ri"))
        val cols = pairs.groupBy(col("j")).agg(sum(col("c")).as("cj"))
        val marg = rows.join(cols, col("i") === col("j"), "full")
          .selectExpr("coalesce(i, j) AS g", "coalesce(ri, 0L) AS ri",
            "coalesce(cj, 0L) AS cj")
        val base = pairs.agg(sum(col("c")).as("n"),
          sum(when(col("i") === col("j"), col("c")).otherwise(0L))
            .as("agree"))
        val chance = marg.agg(
          sum(expr(s"CAST(ri + cj AS $dec) * (ri + cj)")).as("spool"),
          sum(expr(s"CAST(ri AS $dec) * cj")).as("sprod"))
        base.crossJoin(broadcast(chance))
          .selectExpr("n", "agree * 1000000 div n AS ao_e6",
            s"CAST(CAST(spool AS $dec) * 1000000 div (CAST(n AS $dec)" +
              " * n * 4) AS BIGINT) AS ae_pool_e6",
            s"CAST(CAST(sprod AS $dec) * 1000000 div (CAST(n AS $dec)" +
              " * n) AS BIGINT) AS ae_cohen_e6")
          .selectExpr("n", "ao_e6", "ae_pool_e6", "ae_cohen_e6",
            """CASE WHEN ae_pool_e6 >= 1000000 THEN NULL
              |WHEN ao_e6 >= ae_pool_e6
              |THEN (ao_e6 - ae_pool_e6) * 1000000
              |  div (1000000 - ae_pool_e6)
              |ELSE -((ae_pool_e6 - ao_e6) * 1000000
              |  div (1000000 - ae_pool_e6))
              |END AS pi_e6""".stripMargin,
            """CASE WHEN ae_cohen_e6 >= 1000000 THEN NULL
              |WHEN ao_e6 >= ae_cohen_e6
              |THEN (ao_e6 - ae_cohen_e6) * 1000000
              |  div (1000000 - ae_cohen_e6)
              |ELSE -((ae_cohen_e6 - ao_e6) * 1000000
              |  div (1000000 - ae_cohen_e6))
              |END AS kappa_e6""".stripMargin)
      },
      Some(bandPairsSql +
        """,
          |rows_ AS (SELECT i, CAST(sum(c) AS BIGINT) AS ri
          |          FROM pairs GROUP BY 1),
          |cols_ AS (SELECT j, CAST(sum(c) AS BIGINT) AS cj
          |          FROM pairs GROUP BY 1),
          |marg AS (SELECT coalesce(i, j) AS g,
          |           coalesce(ri, 0) AS ri, coalesce(cj, 0) AS cj
          |         FROM rows_ FULL JOIN cols_ ON i = j),
          |base AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          |           CAST(sum(CASE WHEN i = j THEN c ELSE 0 END)
          |             AS BIGINT) AS agree FROM pairs),
          |chance AS (SELECT
          |    CAST(sum(CAST(ri + cj AS HUGEINT) * (ri + cj)) AS HUGEINT)
          |      AS spool,
          |    CAST(sum(CAST(ri AS HUGEINT) * cj) AS HUGEINT) AS sprod
          |  FROM marg),
          |k AS (SELECT n, agree * 1000000 // n AS ao_e6,
          |        CAST(CAST(spool AS HUGEINT) * 1000000
          |          // (CAST(n AS HUGEINT) * n * 4) AS BIGINT)
          |          AS ae_pool_e6,
          |        CAST(CAST(sprod AS HUGEINT) * 1000000
          |          // (CAST(n AS HUGEINT) * n) AS BIGINT)
          |          AS ae_cohen_e6
          |      FROM base CROSS JOIN chance)
          |SELECT n, ao_e6, ae_pool_e6, ae_cohen_e6,
          |       CASE WHEN ae_pool_e6 >= 1000000 THEN NULL
          |       WHEN ao_e6 >= ae_pool_e6
          |       THEN (ao_e6 - ae_pool_e6) * 1000000
          |         // (1000000 - ae_pool_e6)
          |       ELSE -((ae_pool_e6 - ao_e6) * 1000000
          |         // (1000000 - ae_pool_e6))
          |       END AS pi_e6,
          |       CASE WHEN ae_cohen_e6 >= 1000000 THEN NULL
          |       WHEN ao_e6 >= ae_cohen_e6
          |       THEN (ao_e6 - ae_cohen_e6) * 1000000
          |         // (1000000 - ae_cohen_e6)
          |       ELSE -((ae_cohen_e6 - ao_e6) * 1000000
          |         // (1000000 - ae_cohen_e6))
          |       END AS kappa_e6
          |FROM k""".stripMargin))
  )
}
