package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-190 batch — SPC counts, the power-mean ladder, decision-tree
  * impurity, and a spatial-statistics lag sweep:
  *
  *  - c-chart (`q_c_chart`): Shewhart count chart over monthly returned
  *    lineitems — CL = c̄, limits c̄ ± 3√c̄. The count-data companion to
  *    q_p_chart (proportions) and q_cusum (drift): √c̄ is ONE scalar
  *    per-element rounded before any comparison, every flag decision is
  *    an integer compare.
  *  - Power means (`q_power_mean`): harmonic ≤ geometric ≤ arithmetic ≤
  *    quadratic over order values in one pass. HM via per-row scaled
  *    integer reciprocals (1e12 div x, deterministic truncation), GM as
  *    its exact integer log₂ (slx div n), QM via a decimal Σx² and one
  *    per-element sqrt; the ladder inequality is re-checked in-query.
  *  - Gini impurity split (`q_gini_impurity`): root/weighted-child Gini
  *    AND entropy impurity of the priority→high-value split — the
  *    CART-style twin of q_info_gain (which reports MI/gain-ratio);
  *    Gini needs only Σc² ratios so it is exact integer e6 end to end.
  *  - Madogram + variogram (`q_madogram`): γ_M(h) = ½E|x_t − x_{t+h}|
  *    and γ(h) = ½E(x_t − x_{t+h})² of daily revenue for lags 1..7 —
  *    the robust/classical dependence-by-lag pair (q_acf's rank-free
  *    cousins). Exact integer diffs on hecto-dollar revenue, decimal
  *    close for the squared sum.
  *
  * Scale shapes: monthly/daily frames are one exchange each and
  * calendar-bounded (they grow with years, not SF), so the lag
  * self-join broadcasts the ≤few-thousand-row daily side; impurity and
  * means are single grouped aggregates with broadcast scalar totals. */
object Round190Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── c-chart: monthly returned-lineitem counts vs c̄ ± 3√c̄.
    QueryDef("q_c_chart",
      (s, d) => {
        val mo = Tables.lineitem(s, d)
          .where(col("l_returnflag") === "R")
          .select(trunc(col("l_shipdate"), "month").as("mo"))
          .groupBy(col("mo")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // calendar-bounded, reused for c̄
        val pool = mo.agg(count(lit(1)).as("m"), sum(col("c")).as("ct"))
        mo.crossJoin(broadcast(pool))
          .selectExpr("mo", "c",
            "ct * 1000000 div m AS cbar_e6",
            """CAST(round(CAST('3000000.0' AS DOUBLE) * sqrt(
              |  CAST(ct AS DOUBLE) / CAST(m AS DOUBLE))) AS BIGINT)
              |  AS sigma3_e6""".stripMargin)
          .selectExpr("mo", "c", "cbar_e6", "sigma3_e6",
            """CASE WHEN c * 1000000 > cbar_e6 + sigma3_e6 THEN 'HIGH'
              |     WHEN c * 1000000 < cbar_e6 - sigma3_e6 THEN 'LOW'
              |     ELSE 'IN' END AS control""".stripMargin)
      },
      Some("""WITH mo AS (
             |  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mo,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
             |pool AS (SELECT CAST(count(*) AS BIGINT) AS m,
             |           CAST(sum(c) AS BIGINT) AS ct FROM mo)
             |SELECT mo, c,
             |       ct * 1000000 // m AS cbar_e6,
             |       CAST(round(CAST('3000000.0' AS DOUBLE) * sqrt(
             |         CAST(ct AS DOUBLE) / CAST(m AS DOUBLE))) AS BIGINT)
             |         AS sigma3_e6,
             |       CASE WHEN c * 1000000 > ct * 1000000 // m
             |              + CAST(round(CAST('3000000.0' AS DOUBLE)
             |              * sqrt(CAST(ct AS DOUBLE) / CAST(m AS DOUBLE)))
             |              AS BIGINT) THEN 'HIGH'
             |            WHEN c * 1000000 < ct * 1000000 // m
             |              - CAST(round(CAST('3000000.0' AS DOUBLE)
             |              * sqrt(CAST(ct AS DOUBLE) / CAST(m AS DOUBLE)))
             |              AS BIGINT) THEN 'LOW'
             |            ELSE 'IN' END AS control
             |FROM mo CROSS JOIN pool""".stripMargin)),

    // ── Power-mean ladder HM ≤ GM ≤ AM ≤ QM over order value cents.
    QueryDef("q_power_mean",
      (s, d) => {
        val x = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
            .as("x"))
          .where(col("x") >= 1L)
        x.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(Bm25.log2E6(col("x"))).as("slx"),
            sum(expr("1000000000000 div x")).as("sr"),
            sum(expr(s"CAST(x AS $dec) * x")).as("s2"))
          .selectExpr("n",
            "sx div n AS am_cents",
            "slx div n AS gm_log2_e6",
            s"CAST(CAST(n AS $dec) * 1000000000000 div sr AS BIGINT)" +
              " AS hm_cents",
            "CAST(round(sqrt(CAST(s2 div n AS DOUBLE))) AS BIGINT)" +
              " AS qm_cents")
          .withColumn("am_log2_e6", Bm25.log2E6(col("am_cents")))
          .selectExpr("n", "am_cents", "gm_log2_e6", "am_log2_e6",
            "hm_cents", "qm_cents",
            "hm_cents <= am_cents AND am_cents <= qm_cents" +
              " AND gm_log2_e6 <= am_log2_e6 AS ladder_ok")
      },
      Some {
        def L(v: String) = s"CAST(${Bm25.log2E6Sql(v)} AS BIGINT)"
        s"""WITH x AS (
           |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x
           |  FROM orders
           |  WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) >= 1),
           |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |          CAST(sum(x) AS BIGINT) AS sx,
           |          CAST(sum(${L("x")}) AS BIGINT) AS slx,
           |          CAST(sum(1000000000000 // x) AS BIGINT) AS sr,
           |          CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
           |        FROM x),
           |k AS (SELECT n, sx // n AS am_cents, slx // n AS gm_log2_e6,
           |        CAST(CAST(n AS HUGEINT) * 1000000000000 // sr
           |          AS BIGINT) AS hm_cents,
           |        CAST(round(sqrt(CAST(s2 // n AS DOUBLE))) AS BIGINT)
           |          AS qm_cents
           |      FROM agg)
           |SELECT n, am_cents, gm_log2_e6,
           |       ${L("am_cents")} AS am_log2_e6,
           |       hm_cents, qm_cents,
           |       hm_cents <= am_cents AND am_cents <= qm_cents
           |         AND gm_log2_e6 <= ${L("am_cents")} AS ladder_ok
           |FROM k""".stripMargin
      }),

    // ── Gini + entropy impurity of the priority→high-value split.
    QueryDef("q_gini_impurity",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .select(col("o_orderpriority").as("v"),
            (col("o_totalprice") >= 150000.0).as("yy"))
          .groupBy(col("v"), col("yy")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // ≤ 10 cells
        val perV = cells.groupBy(col("v"))
          .agg(sum(col("c")).as("nv"), sum(col("c") * col("c")).as("s2v"),
            sum(col("c") * Bm25.log2E6(col("c"))).as("slcv"))
          .withColumn("gv_e6",
            expr("1000000 - s2v * 1000000 div (nv * nv)"))
          .withColumn("hv_e6",
            Bm25.log2E6(col("nv")) - expr("slcv div nv"))
        val split = perV.agg(sum(col("nv")).as("n"),
          sum(col("nv") * col("gv_e6")).as("wg"),
          sum(col("nv") * col("hv_e6")).as("wh"))
        val root = cells.groupBy(col("yy")).agg(sum(col("c")).as("cy"))
          .agg(sum(expr(s"CAST(cy AS $dec) * cy")).as("s2y"),
            sum(col("cy") * Bm25.log2E6(col("cy"))).as("slcy"))
        split.crossJoin(broadcast(root))
          .withColumn("gini_root_e6",
            expr(s"CAST(1000000 - CAST(s2y AS $dec) * 1000000" +
              s" div (CAST(n AS $dec) * n) AS BIGINT)"))
          .withColumn("ent_root_e6",
            Bm25.log2E6(col("n")) - expr("slcy div n"))
          .selectExpr("n", "gini_root_e6",
            "wg div n AS gini_split_e6",
            "gini_root_e6 - wg div n AS gini_gain_e6",
            "ent_root_e6",
            "wh div n AS ent_split_e6",
            "ent_root_e6 - wh div n AS ent_gain_e6")
      },
      Some {
        def L(v: String) = s"CAST(${Bm25.log2E6Sql(v)} AS BIGINT)"
        s"""WITH cells AS (
           |  SELECT o_orderpriority AS v,
           |         o_totalprice >= 150000.0 AS yy,
           |         CAST(count(*) AS BIGINT) AS c
           |  FROM orders GROUP BY 1, 2),
           |perv AS (SELECT v, CAST(sum(c) AS BIGINT) AS nv,
           |           CAST(sum(c * c) AS BIGINT) AS s2v,
           |           CAST(sum(c * ${L("c")}) AS BIGINT) AS slcv
           |         FROM cells GROUP BY 1),
           |pv2 AS (SELECT nv,
           |          1000000 - s2v * 1000000 // (nv * nv) AS gv_e6,
           |          ${L("nv")} - slcv // nv AS hv_e6
           |        FROM perv),
           |sp AS (SELECT CAST(sum(nv) AS BIGINT) AS n,
           |         CAST(sum(nv * gv_e6) AS BIGINT) AS wg,
           |         CAST(sum(nv * hv_e6) AS BIGINT) AS wh FROM pv2),
           |rt AS (SELECT CAST(sum(CAST(cy AS HUGEINT) * cy) AS HUGEINT)
           |           AS s2y,
           |         CAST(sum(cy * ${L("cy")}) AS BIGINT) AS slcy
           |       FROM (SELECT CAST(sum(c) AS BIGINT) AS cy FROM cells
           |             GROUP BY yy)),
           |j AS (SELECT n, wg, wh,
           |        CAST(1000000 - CAST(s2y AS HUGEINT) * 1000000
           |          // (CAST(n AS HUGEINT) * n) AS BIGINT)
           |          AS gini_root_e6,
           |        ${L("n")} - slcy // n AS ent_root_e6
           |      FROM sp CROSS JOIN rt)
           |SELECT n, gini_root_e6,
           |       wg // n AS gini_split_e6,
           |       gini_root_e6 - wg // n AS gini_gain_e6,
           |       ent_root_e6,
           |       wh // n AS ent_split_e6,
           |       ent_root_e6 - wh // n AS ent_gain_e6
           |FROM j""".stripMargin
      }),

    // ── Madogram + variogram of daily revenue at lags 1..7.
    QueryDef("q_madogram",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
            .as("x"))
          .localCheckpoint(false) // calendar-bounded (~days, not SF)
        val lagged = daily
          .withColumn("h", explode(array((1 to 7).map(lit(_)): _*)))
          .withColumn("dt2", date_add(col("dt"), col("h")))
        lagged.join(broadcast(daily.select(col("dt").as("dt2"),
            col("x").as("x2"))), Seq("dt2"))
          .groupBy(col("h"))
          .agg(count(lit(1)).as("nh"),
            sum(expr("abs(x - x2)")).as("sad"),
            sum(expr(s"CAST(x - x2 AS $dec) * (x - x2)")).as("ssq"))
          .selectExpr("h", "nh",
            "sad * 1000000 div (2 * nh) AS mado_e6",
            s"CAST(CAST(ssq AS $dec) * 1000000 div (2 * nh) AS BIGINT)" +
              " AS vario_e6")
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS dt,
             |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |lagged AS (SELECT a.x, a.dt + l.h AS dt2, l.h
             |           FROM daily a CROSS JOIN
             |             (SELECT unnest([1,2,3,4,5,6,7]) AS h) l)
             |SELECT l.h AS h, CAST(count(*) AS BIGINT) AS nh,
             |       CAST(sum(abs(l.x - b.x)) AS BIGINT) * 1000000
             |         // (2 * count(*)) AS mado_e6,
             |       CAST(CAST(sum(CAST(l.x - b.x AS HUGEINT)
             |           * (l.x - b.x)) AS HUGEINT) * 1000000
             |         // (2 * count(*)) AS BIGINT) AS vario_e6
             |FROM lagged l JOIN daily b ON b.dt = l.dt2
             |GROUP BY 1""".stripMargin))
  )
}
