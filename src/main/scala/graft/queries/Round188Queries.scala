package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-188 batch — ordinal association, directional dependence, and
  * two inequality readouts the q_gini/q_theil_index/q_atkinson family
  * lacked:
  *
  *  - Goodman–Kruskal γ (`q_gamma_kruskal`): concordant-vs-discordant
    * association between the quantity decile and the discount band —
  *    the ordinal-table companion to q_kendall_tau (which ranks rows;
  *    γ works on the ≤36-cell contingency table, so the pair scan is a
  *    bounded cell×cell self-join, never rows²). C, D exact BIGINTs;
  *    the close clears e6 through decimal headroom.
  *  - Theil's U (`q_theil_u`): the uncertainty coefficient U(Y|V) =
  *    I(V;Y)/H(Y) plus the symmetric variant 2I/(H(V)+H(Y)) — the
  *    DIRECTIONAL dependence readout next to q_info_gain's gain ratio
  *    (which normalizes by H(V) instead); same four-term integer log₂
  *    identity.
  *  - Hoover index (`q_hoover_index`): the Robin-Hood share — what
  *    fraction of total customer spend would have to move to equalize:
  *    H = Σ⁺(x_i·n − X) div (n·X), one positive-part aggregate over
  *    per-customer spend, exact integers with a decimal e6 close.
  *  - Mean log deviation (`q_mean_log_deviation`): GE(0) inequality
  *    n·MLD = n·log μ − Σ log x over positive customer spends, in the
  *    shared integer log₂ (·ln2 e6 close) — the decomposable
  *    inequality measure q_theil_index (GE(1)) pairs with.
  *
  * Scale shapes: one grouped aggregate each (≤36-cell table, 10-cell
  * table, per-customer spend rollup) + broadcast scalar totals; the γ
  * pair scan is cells² ≤ 36², bounded by the band grid, not data. */
object Round188Queries {

  private val dec = "decimal(38,0)"

  /** quantity-decile × discount-band cells (≤ 36 at any SF). */
  private val qdCellsSql =
    """WITH cells AS (
      |  SELECT least(CAST(floor(l_quantity + 0.5) AS BIGINT) // 10, 5)
      |           AS i,
      |         least(CAST(floor(l_discount * 100 + 0.5) AS BIGINT) // 2,
      |           5) AS j,
      |         CAST(count(*) AS BIGINT) AS o
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  private def qdCells(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select(expr("least(CAST(floor(l_quantity + 0.5) AS BIGINT)" +
        " div 10, 5)").as("i"),
        expr("least(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)" +
          " div 2, 5)").as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("o"))
      .localCheckpoint(false) // ≤ 36 cells, self-joined

  /** priority × high-value cells (≤ 10 at any SF) + per-customer spend
    * in hecto-dollars — shared shapes for U and the inequality pair. */
  private val prioCellsSql =
    """WITH cells AS (
      |  SELECT o_orderpriority AS v,
      |         o_totalprice >= 150000.0 AS yy,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1, 2)""".stripMargin

  private val spendSql =
    """WITH sp AS (
      |  SELECT CAST(sum(CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT))
      |           AS BIGINT) AS x
      |  FROM orders GROUP BY o_custkey)""".stripMargin

  private def spend(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
        .as("x"))
      .select(col("x"))

  def defs: Seq[QueryDef] = Seq(

    // ── Goodman–Kruskal gamma on the quantity×discount cell table.
    QueryDef("q_gamma_kruskal",
      (s, d) => {
        val cells = qdCells(s, d)
        val p = cells.as("a").join(broadcast(cells.as("b")),
          col("a.i") =!= col("b.i") && col("a.j") =!= col("b.j"))
        p.agg(
            sum(when((col("b.i") > col("a.i")) === (col("b.j") > col("a.j")),
              col("a.o") * col("b.o")).otherwise(0L)).as("c2"),
            sum(when((col("b.i") > col("a.i")) =!= (col("b.j") > col("a.j")),
              col("a.o") * col("b.o")).otherwise(0L)).as("d2"))
          .selectExpr("c2 div 2 AS conc", "d2 div 2 AS disc",
            s"""CASE WHEN c2 + d2 = 0 THEN NULL
               |WHEN c2 >= d2 THEN CAST(CAST(c2 - d2 AS $dec) * 1000000
               |  div (c2 + d2) AS BIGINT)
               |ELSE -CAST(CAST(d2 - c2 AS $dec) * 1000000 div (c2 + d2)
               |  AS BIGINT)
               |END AS gamma_e6""".stripMargin)
      },
      Some(qdCellsSql +
        """,
          |p AS (SELECT
          |  CAST(sum(CASE WHEN (b.i > a.i) = (b.j > a.j)
          |    THEN a.o * b.o ELSE 0 END) AS BIGINT) AS c2,
          |  CAST(sum(CASE WHEN (b.i > a.i) <> (b.j > a.j)
          |    THEN a.o * b.o ELSE 0 END) AS BIGINT) AS d2
          |FROM cells a JOIN cells b ON a.i <> b.i AND a.j <> b.j)
          |SELECT c2 // 2 AS conc, d2 // 2 AS disc,
          |       CASE WHEN c2 + d2 = 0 THEN NULL
          |       WHEN c2 >= d2 THEN CAST(CAST(c2 - d2 AS HUGEINT)
          |         * 1000000 // (c2 + d2) AS BIGINT)
          |       ELSE -CAST(CAST(d2 - c2 AS HUGEINT) * 1000000
          |         // (c2 + d2) AS BIGINT)
          |       END AS gamma_e6
          |FROM p""".stripMargin)),

    // ── Theil's U: directional + symmetric uncertainty coefficients.
    QueryDef("q_theil_u",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .select(col("o_orderpriority").as("v"),
            (col("o_totalprice") >= 150000.0).as("yy"))
          .groupBy(col("v"), col("yy")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false)
        val tc = cells.agg(sum(col("c")).as("n"),
          sum(col("c") * Bm25.log2E6(col("c"))).as("t_cells"))
        val tv = cells.groupBy(col("v")).agg(sum(col("c")).as("nv"))
          .agg(sum(col("nv") * Bm25.log2E6(col("nv"))).as("t_v"))
        val ty = cells.groupBy(col("yy")).agg(sum(col("c")).as("cy"))
          .agg(sum(col("cy") * Bm25.log2E6(col("cy"))).as("t_y"))
        tc.crossJoin(broadcast(tv)).crossJoin(broadcast(ty))
          .withColumn("t_n", col("n") * Bm25.log2E6(col("n")))
          .withColumn("mi", expr("t_cells - t_v - t_y + t_n"))
          .withColumn("hy", expr("t_n - t_y"))
          .withColumn("hv", expr("t_n - t_v"))
          .selectExpr("n",
            s"""CASE WHEN hy <= 0 THEN NULL
               |WHEN mi >= 0 THEN CAST(CAST(mi AS $dec) * 1000000 div hy
               |  AS BIGINT)
               |ELSE -CAST(CAST(-mi AS $dec) * 1000000 div hy AS BIGINT)
               |END AS u_yv_e6""".stripMargin,
            s"""CASE WHEN hv + hy <= 0 THEN NULL
               |WHEN mi >= 0 THEN CAST(CAST(mi AS $dec) * 2000000
               |  div (hv + hy) AS BIGINT)
               |ELSE -CAST(CAST(-mi AS $dec) * 2000000 div (hv + hy)
               |  AS BIGINT)
               |END AS u_sym_e6""".stripMargin)
      },
      Some {
        def L(v: String) = Bm25.log2E6Sql(v)
        prioCellsSql +
          s""",
             |tc AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             |         CAST(sum(c * CAST(${L("c")} AS BIGINT)) AS BIGINT)
             |           AS t_cells FROM cells),
             |tv AS (SELECT CAST(sum(nv * CAST(${L("nv")} AS BIGINT))
             |           AS BIGINT) AS t_v
             |       FROM (SELECT CAST(sum(c) AS BIGINT) AS nv FROM cells
             |             GROUP BY v)),
             |ty AS (SELECT CAST(sum(cy * CAST(${L("cy")} AS BIGINT))
             |           AS BIGINT) AS t_y
             |       FROM (SELECT CAST(sum(c) AS BIGINT) AS cy FROM cells
             |             GROUP BY yy)),
             |j AS (SELECT n, t_cells - t_v - t_y
             |        + n * CAST(${L("n")} AS BIGINT) AS mi,
             |        n * CAST(${L("n")} AS BIGINT) - t_y AS hy,
             |        n * CAST(${L("n")} AS BIGINT) - t_v AS hv
             |      FROM tc CROSS JOIN tv CROSS JOIN ty)
             |SELECT n,
             |       CASE WHEN hy <= 0 THEN NULL
             |       WHEN mi >= 0 THEN CAST(CAST(mi AS HUGEINT) * 1000000
             |         // hy AS BIGINT)
             |       ELSE -CAST(CAST(-mi AS HUGEINT) * 1000000 // hy
             |         AS BIGINT)
             |       END AS u_yv_e6,
             |       CASE WHEN hv + hy <= 0 THEN NULL
             |       WHEN mi >= 0 THEN CAST(CAST(mi AS HUGEINT) * 2000000
             |         // (hv + hy) AS BIGINT)
             |       ELSE -CAST(CAST(-mi AS HUGEINT) * 2000000 // (hv + hy)
             |         AS BIGINT)
             |       END AS u_sym_e6
             |FROM j""".stripMargin
      }),

    // ── Hoover (Robin Hood) index over per-customer spend.
    QueryDef("q_hoover_index",
      (s, d) => {
        val sp = spend(s, d).localCheckpoint(false) // totals + positive part
        val tot = sp.agg(count(lit(1)).as("n"), sum(col("x")).as("xt"))
        sp.crossJoin(broadcast(tot))
          .agg(max(col("n")).as("n"), max(col("xt")).as("xt"),
            sum(greatest(lit(0L), col("x") * col("n") - col("xt")))
              .as("pp"))
          .selectExpr("n",
            s"""CASE WHEN n * xt = 0 THEN NULL
               |ELSE CAST(CAST(pp AS $dec) * 1000000 div (n * xt)
               |  AS BIGINT) END AS hoover_e6""".stripMargin)
      },
      Some(spendSql +
        """,
          |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |          CAST(sum(x) AS BIGINT) AS xt FROM sp),
          |pp AS (SELECT max(n) AS n, max(xt) AS xt,
          |         CAST(sum(greatest(0, x * n - xt)) AS BIGINT) AS pp
          |       FROM sp CROSS JOIN tot)
          |SELECT n,
          |       CASE WHEN n * xt = 0 THEN NULL
          |       ELSE CAST(CAST(pp AS HUGEINT) * 1000000 // (n * xt)
          |         AS BIGINT) END AS hoover_e6
          |FROM pp""".stripMargin)),

    // ── Mean log deviation GE(0) over positive customer spends.
    QueryDef("q_mean_log_deviation",
      (s, d) => {
        val sp = spend(s, d).filter(col("x") >= 1L).localCheckpoint(false)
        val tot = sp.agg(count(lit(1)).as("n"), sum(col("x")).as("xt"),
          sum(Bm25.log2E6(col("x"))).as("slx"))
        tot
          .withColumn("mu", expr("greatest(1L, xt div n)"))
          .withColumn("num",
            col("n") * Bm25.log2E6(col("mu")) - col("slx"))
          .selectExpr("n",
            """CASE WHEN num >= 0
              |THEN (num div n) * 693147 div 1000000
              |ELSE -(((-num) div n) * 693147 div 1000000)
              |END AS mld_e6""".stripMargin)
      },
      Some {
        def L(v: String) = Bm25.log2E6Sql(v)
        spendSql +
          s""",
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |          CAST(sum(x) AS BIGINT) AS xt,
             |          CAST(sum(CAST(${L("x")} AS BIGINT)) AS BIGINT)
             |            AS slx
             |        FROM sp WHERE x >= 1),
             |k AS (SELECT n,
             |        n * CAST(${L("greatest(1, xt // n)")} AS BIGINT)
             |          - slx AS num
             |      FROM tot)
             |SELECT n,
             |       CASE WHEN num >= 0
             |       THEN (num // n) * 693147 // 1000000
             |       ELSE -(((-num) // n) * 693147 // 1000000)
             |       END AS mld_e6
             |FROM k""".stripMargin
      })
  )
}
