package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Graph}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-186 batch — feature-selection scores, regression diagnostics
  * on bounded time axes, and one global network readout:
  *
  *  - Information gain + gain ratio (`q_info_gain`): I(V;Y) of order
  *    priority against the high-value outcome via the four-term count
  *    identity n·I = Σc·L(c) − Σn_v·L(n_v) − Σc_y·L(c_y) + n·L(n),
  *    all in the shared integer log₂ (L = log2E6) — the decision-tree
  *    split score next to q_chi2_feature's frequentist take.
  *  - χ² feature score (`q_chi2_feature`): χ² = Σ O²·n div (r·c) − n
  *    over the 5×2 priority×outcome table, per-cell exact integer
  *    (decimal headroom), df = (|V|−1)(|Y|−1).
  *  - Von Neumann ratio (`q_von_neumann`): successive-difference /
  *    variance η = n·Σd² div (n·Σx² − (Σx)²) on daily event counts —
  *    the randomness-against-trend companion to q_runs_test and
  *    q_durbin_watson, exact integers end to end.
  *  - Quandt sup-F break scan (`q_quandt_break`): the Chow F statistic
  *    at EVERY admissible month split of the monthly-revenue OLS (the
  *    unknown-breakpoint generalization of a single fixed-split test),
  *    prefix/suffix moments from ONE cumulative window; top-5 breaks.
  *    SSRs close through IEEE doubles from exact BIGINT moments,
  *    textually identical in both engines.
  *  - Global Theil–Sen slope (`q_sen_slope`): the median of ALL
  *    pairwise monthly-revenue slopes (q_siegel_slope is the per-point
  *    median-of-medians variant) — slopes e6 sign-split exact, median
  *    by rank over the bounded month-pair set.
  *  - Global efficiency (`q_global_efficiency`): Σ 1/d over sampled
  *    source pairs of the ring graph div (seeds·(n−1)) — the
  *    one-number connectivity readout on top of [[Graph.multiSourceBfs]]
  *    (unreached pairs contribute 0, the standard convention).
  *
  * Scale shapes: count tables of ≤10 cells, month axes of ≤80 rows and
  * their ≤3160 bounded pairs, one labeled BFS frontier — nothing
  * data-volume-bound past the first aggregate's exchange.
  */
object Round186Queries {

  private val dec = "decimal(38,0)"

  /** Centered-moment SSR of an OLS segment, as an engine-portable
    * double expression over exact integer moment columns. */
  private def ssrExpr(n: String, sx: String, sy: String, sxx: String,
                      sxy: String, syy: String): String =
    s"""((CAST($syy AS DOUBLE) - CAST($sy AS DOUBLE) * $sy / $n)
       | - (CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * $sy / $n)
       |   * (CAST($sxy AS DOUBLE) - CAST($sx AS DOUBLE) * $sy / $n)
       |   / (CAST($sxx AS DOUBLE) - CAST($sx AS DOUBLE) * $sx / $n))"""
      .stripMargin

  private val monthAxisSql =
    """WITH mo AS (
      |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mk,
      |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT))
      |           AS BIGINT) AS y
      |  FROM orders GROUP BY 1)""".stripMargin

  private def monthAxis(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .select((year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
        .cast("long").as("mk"),
        expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)").as("h"))
      .groupBy(col("mk")).agg(sum(col("h")).as("y"))

  /** priority × high-value count cells (≤ 10 at any SF). */
  private val prioCellsSql =
    """WITH cells AS (
      |  SELECT o_orderpriority AS v,
      |         o_totalprice >= 150000.0 AS yy,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1, 2)""".stripMargin

  private def prioCells(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("v"),
        (col("o_totalprice") >= 150000.0).as("yy"))
      .groupBy(col("v"), col("yy")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // ≤ 10 cells, reused by every margin

  def defs: Seq[QueryDef] = Seq(

    // ── Mutual information (= info gain) + gain ratio of priority.
    QueryDef("q_info_gain",
      (s, d) => {
        val cells = prioCells(s, d)
        val tc = cells.agg(sum(col("c")).as("n"),
          sum(col("c") * Bm25.log2E6(col("c"))).as("t_cells"))
        val tv = cells.groupBy(col("v")).agg(sum(col("c")).as("nv"))
          .agg(sum(col("nv") * Bm25.log2E6(col("nv"))).as("t_v"))
        val ty = cells.groupBy(col("yy")).agg(sum(col("c")).as("cy"))
          .agg(sum(col("cy") * Bm25.log2E6(col("cy"))).as("t_y"))
        tc.crossJoin(broadcast(tv)).crossJoin(broadcast(ty))
          .withColumn("t_n", col("n") * Bm25.log2E6(col("n")))
          .withColumn("mi_num",
            expr("t_cells - t_v - t_y + t_n"))
          .withColumn("hv_num", expr("t_n - t_v"))
          .selectExpr("n",
            """CASE WHEN mi_num >= 0 THEN mi_num div n
              |ELSE -((-mi_num) div n) END AS ig_e6""".stripMargin,
            s"""CASE WHEN hv_num <= 0 THEN NULL
               |WHEN mi_num >= 0 THEN CAST(CAST(mi_num AS $dec) * 1000000
               |  div hv_num AS BIGINT)
               |ELSE -CAST(CAST(-mi_num AS $dec) * 1000000 div hv_num
               |  AS BIGINT)
               |END AS gain_ratio_e6""".stripMargin)
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
             |j AS (SELECT n, t_cells, t_v, t_y,
             |        n * CAST(${L("n")} AS BIGINT) AS t_n
             |      FROM tc CROSS JOIN tv CROSS JOIN ty),
             |k AS (SELECT n, t_cells - t_v - t_y + t_n AS mi_num,
             |        t_n - t_v AS hv_num FROM j)
             |SELECT n,
             |       CASE WHEN mi_num >= 0 THEN mi_num // n
             |       ELSE -((-mi_num) // n) END AS ig_e6,
             |       CASE WHEN hv_num <= 0 THEN NULL
             |       WHEN mi_num >= 0 THEN CAST(CAST(mi_num AS HUGEINT)
             |         * 1000000 // hv_num AS BIGINT)
             |       ELSE -CAST(CAST(-mi_num AS HUGEINT) * 1000000
             |         // hv_num AS BIGINT)
             |       END AS gain_ratio_e6
             |FROM k""".stripMargin
      }),

    // ── χ² independence score on the same 5×2 table.
    QueryDef("q_chi2_feature",
      (s, d) => {
        val cells = prioCells(s, d)
        val nv = cells.groupBy(col("v")).agg(sum(col("c")).as("nv"))
        val cy = cells.groupBy(col("yy")).agg(sum(col("c")).as("cy"))
        val n = cells.agg(sum(col("c")).as("n"),
          countDistinct(col("v")).as("kv"),
          countDistinct(col("yy")).as("ky"))
        cells.join(broadcast(nv), "v").join(broadcast(cy), "yy")
          .crossJoin(broadcast(n))
          .select(col("n"), col("kv"), col("ky"),
            expr(s"CAST(CAST(c AS $dec) * c * n * 1000000 div (nv * cy)" +
              " AS BIGINT)").as("cell"))
          .groupBy(col("n"), col("kv"), col("ky"))
          .agg(sum(col("cell")).as("s"))
          .selectExpr("n", "(kv - 1) * (ky - 1) AS df",
            "s - n * 1000000 AS chi2_e6")
      },
      Some(prioCellsSql +
        """,
          |nv AS (SELECT v, CAST(sum(c) AS BIGINT) AS nv FROM cells
          |       GROUP BY 1),
          |cy AS (SELECT yy, CAST(sum(c) AS BIGINT) AS cy FROM cells
          |       GROUP BY 1),
          |n AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          |             CAST(count(DISTINCT v) AS BIGINT) AS kv,
          |             CAST(count(DISTINCT yy) AS BIGINT) AS ky
          |      FROM cells),
          |pc AS (SELECT n.n, n.kv, n.ky,
          |         CAST(CAST(c AS HUGEINT) * c * n.n * 1000000
          |           // (nv.nv * cy.cy) AS BIGINT) AS cell
          |       FROM cells JOIN nv USING (v) JOIN cy USING (yy)
          |       CROSS JOIN n)
          |SELECT n, (kv - 1) * (ky - 1) AS df,
          |       CAST(sum(cell) AS BIGINT) - n * 1000000 AS chi2_e6
          |FROM pc GROUP BY n, kv, ky""".stripMargin)),

    // ── Von Neumann successive-difference ratio on daily event counts.
    QueryDef("q_von_neumann",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(date_trunc("day", col("ts")).as("dy"))
          .groupBy(col("dy")).agg(count(lit(1)).as("x"))
        days
          .withColumn("px", lag(col("x"), 1).over(Window.orderBy(col("dy"))))
          .agg(count(lit(1)).as("n_days"),
            sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"),
            sum(when(col("px").isNotNull,
              (col("x") - col("px")) * (col("x") - col("px")))
              .otherwise(0L)).as("d2_sum"))
          .selectExpr("n_days", "d2_sum",
            """CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
              |ELSE n_days * d2_sum * 1000000
              |  div (n_days * sxx - sx * sx) END AS vn_e6""".stripMargin)
      },
      Some("""WITH days AS (
             |  SELECT date_trunc('day', ts) AS dy,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |lg AS (SELECT x, lag(x) OVER (ORDER BY dy) AS px FROM days),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
             |        CAST(sum(x) AS BIGINT) AS sx,
             |        CAST(sum(x * x) AS BIGINT) AS sxx,
             |        CAST(sum(CASE WHEN px IS NOT NULL
             |          THEN (x - px) * (x - px) ELSE 0 END) AS BIGINT)
             |          AS d2_sum
             |      FROM lg)
             |SELECT n_days, d2_sum,
             |       CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
             |       ELSE n_days * d2_sum * 1000000
             |         // (n_days * sxx - sx * sx) END AS vn_e6
             |FROM m""".stripMargin)),

    // ── Quandt sup-F structural-break scan over the month axis.
    QueryDef("q_quandt_break",
      (s, d) => {
        val mo = monthAxis(s, d)
          .withColumn("t", row_number().over(Window.orderBy(col("mk")))
            .cast("long"))
        val w = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = mo
          .withColumn("cn", col("t"))
          .withColumn("csx", sum(col("t")).over(w))
          .withColumn("csy", sum(col("y")).over(w))
          .withColumn("csxx", sum(col("t") * col("t")).over(w))
          .withColumn("csxy", sum(col("t") * col("y")).over(w))
          .withColumn("csyy", sum(col("y") * col("y")).over(w))
        val tot = mo.agg(count(lit(1)).as("n"), sum(col("t")).as("tsx"),
          sum(col("y")).as("tsy"), sum(col("t") * col("t")).as("tsxx"),
          sum(col("t") * col("y")).as("tsxy"),
          sum(col("y") * col("y")).as("tsyy"))
        val ssr1 = ssrExpr("cn", "csx", "csy", "csxx", "csxy", "csyy")
        val ssr2 = ssrExpr("(n - cn)", "(tsx - csx)", "(tsy - csy)",
          "(tsxx - csxx)", "(tsxy - csxy)", "(tsyy - csyy)")
        val ssrP = ssrExpr("n", "tsx", "tsy", "tsxx", "tsxy", "tsyy")
        cum.crossJoin(broadcast(tot))
          .where(col("cn") >= 3 && col("cn") <= col("n") - 3)
          .selectExpr("t AS m",
            s"""CASE WHEN ($ssr1 + $ssr2) <= 0 THEN NULL
               |ELSE CAST(floor(($ssrP - $ssr1 - $ssr2) / 2
               |  / (($ssr1 + $ssr2) / (n - 4)) * 1000000) AS BIGINT)
               |END AS f_e6""".stripMargin)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("f_e6").desc_nulls_last, col("m"))))
          .where(col("rk") <= 5)
      },
      Some {
        val ssr1 = ssrExpr("cn", "csx", "csy", "csxx", "csxy", "csyy")
        val ssr2 = ssrExpr("(n - cn)", "(tsx - csx)", "(tsy - csy)",
          "(tsxx - csxx)", "(tsxy - csxy)", "(tsyy - csyy)")
        val ssrP = ssrExpr("n", "tsx", "tsy", "tsxx", "tsxy", "tsyy")
        monthAxisSql +
          s""",
             |ax AS (SELECT CAST(row_number() OVER (ORDER BY mk)
             |           AS BIGINT) AS t, y FROM mo),
             |cum AS (SELECT t, y, t AS cn,
             |          CAST(sum(t) OVER w AS BIGINT) AS csx,
             |          CAST(sum(y) OVER w AS BIGINT) AS csy,
             |          CAST(sum(t * t) OVER w AS BIGINT) AS csxx,
             |          CAST(sum(t * y) OVER w AS BIGINT) AS csxy,
             |          CAST(sum(y * y) OVER w AS BIGINT) AS csyy
             |        FROM ax
             |        WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |          CAST(sum(t) AS BIGINT) AS tsx,
             |          CAST(sum(y) AS BIGINT) AS tsy,
             |          CAST(sum(t * t) AS BIGINT) AS tsxx,
             |          CAST(sum(t * y) AS BIGINT) AS tsxy,
             |          CAST(sum(y * y) AS BIGINT) AS tsyy
             |        FROM ax),
             |f AS (SELECT t AS m,
             |        CASE WHEN ($ssr1 + $ssr2) <= 0 THEN NULL
             |        ELSE CAST(floor(($ssrP - $ssr1 - $ssr2) / 2
             |          / (($ssr1 + $ssr2) / (n - 4)) * 1000000) AS BIGINT)
             |        END AS f_e6
             |      FROM cum CROSS JOIN tot
             |      WHERE cn >= 3 AND cn <= n - 3)
             |SELECT m, f_e6, rk FROM (
             |  SELECT m, f_e6, CAST(row_number() OVER (ORDER BY f_e6
             |    DESC NULLS LAST, m) AS BIGINT) AS rk FROM f)
             |WHERE rk <= 5""".stripMargin
      }),

    // ── Global Theil–Sen: median of all pairwise month slopes.
    QueryDef("q_sen_slope",
      (s, d) => {
        val ax = monthAxis(s, d)
          .withColumn("t", row_number().over(Window.orderBy(col("mk")))
            .cast("long"))
          .select(col("t"), col("y"))
          .localCheckpoint(false) // bounded month axis, self-joined
        val pairs = ax.as("i").join(ax.as("j"),
            col("i.t") < col("j.t"))
          .selectExpr(
            """CASE WHEN j.y >= i.y
              |THEN (j.y - i.y) * 1000000 div (j.t - i.t)
              |ELSE -((i.y - j.y) * 1000000 div (j.t - i.t))
              |END AS slope_e6""".stripMargin)
        val n = pairs.agg(count(lit(1)).as("n_pairs"))
        pairs
          .withColumn("rk", row_number().over(Window.orderBy(col("slope_e6"))))
          .crossJoin(broadcast(n))
          .where(col("rk") === expr("(n_pairs + 1) div 2"))
          .selectExpr("n_pairs", "slope_e6 AS sen_slope_e6")
      },
      Some(monthAxisSql +
        """,
          |ax AS (SELECT CAST(row_number() OVER (ORDER BY mk) AS BIGINT)
          |         AS t, y FROM mo),
          |pairs AS (SELECT CASE WHEN j.y >= i.y
          |            THEN (j.y - i.y) * 1000000 // (j.t - i.t)
          |            ELSE -((i.y - j.y) * 1000000 // (j.t - i.t))
          |            END AS slope_e6
          |          FROM ax i JOIN ax j ON i.t < j.t),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
          |r AS (SELECT slope_e6,
          |        CAST(row_number() OVER (ORDER BY slope_e6) AS BIGINT)
          |          AS rk
          |      FROM pairs)
          |SELECT n_pairs, slope_e6 AS sen_slope_e6
          |FROM r CROSS JOIN n WHERE rk = (n_pairs + 1) // 2"""
          .stripMargin)),

    // ── Global efficiency of the ring graph over sampled sources.
    QueryDef("q_global_efficiency",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val edges = nodes
          .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"))
          .unionByName(nodes.filter(col("id") % 3 === 0)
            .select(col("id").as("src"),
              ((col("id") * col("id") + 7) % 100).as("dst")))
          .distinct()
        val meta = nodes.agg(count(lit(1)).as("n_nodes"),
          sum(when(col("id") % 5 === 0, 1L).otherwise(0L)).as("n_seeds"))
        Graph.multiSourceBfs(
            nodes.withColumn("is_seed", col("id") % 5 === 0),
            edges, "is_seed", 20)
          .filter(col("dist") > 0)
          .agg(count(lit(1)).as("n_reached"),
            sum(expr("1000000 div dist")).as("sum_inv"))
          .crossJoin(broadcast(meta))
          .selectExpr("n_nodes", "n_seeds", "n_reached",
            "sum_inv div (n_seeds * (n_nodes - 1)) AS eff_e6")
      },
      Some(("""WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id
             |              FROM part),
             |e AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes
             |      UNION
             |      SELECT id AS src, (id * id + 7) % 100 AS dst
             |      FROM nodes WHERE id % 3 = 0),
             |bfs AS (
             |  SELECT id AS seed, id, 0 AS d FROM nodes WHERE id % 5 = 0
             |  UNION
             |  SELECT bfs.seed, e.dst AS id, bfs.d + 1 AS d
             |  FROM bfs JOIN e ON e.src = bfs.id WHERE bfs.d < 20),
             |md AS (SELECT seed, id, CAST(min(d) AS BIGINT) AS dist
             |       FROM bfs GROUP BY 1, 2),
             |meta AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             |           CAST(sum(CASE WHEN id % 5 = 0 THEN 1 ELSE 0 END)
             |             AS BIGINT) AS n_seeds
             |         FROM nodes),
             |r AS (SELECT CAST(count(*) AS BIGINT) AS n_reached,
             |        CAST(sum(1000000 // dist) AS BIGINT) AS sum_inv
             |      FROM md WHERE dist > 0)
             |SELECT n_nodes, n_seeds, n_reached,
             |       sum_inv // (n_seeds * (n_nodes - 1)) AS eff_e6
             |FROM r CROSS JOIN meta""".stripMargin)
        .replaceFirst("WITH ", "WITH RECURSIVE ")))
  )
}
