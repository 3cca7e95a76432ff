package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Round-179 batch — three follow-ups from the round-10 retro list
  * (SURVEY §7.4q), each turning a landed operator into a calibrated
  * instrument:
  *
  *  - C-index band sweep (`q_harrell_band_sweep`): q_harrell_c at
  *    three score-band widths in ONE query — the band width is the
  *    approximation knob (finer bands = fewer score ties = higher
  *    resolution, more grid cells); the sweep turns the single number
  *    into an accuracy-vs-cost curve, q_ivf_nprobe_curve-style. One
  *    scan; the three grids share it via a width×row explode.
  *  - Gibbs-kernel Sinkhorn (`q_sinkhorn_gibbs`): the entropic-OT-
  *    faithful kernel K = e^(−cost/ε) = 2^(−cost·log₂e/ε) through the
  *    integer 2^(−x) ladder ([[Sketches.pow2NegE6Expr]]) — replacing
  *    q_sinkhorn_plan's rational placeholder kernel; same two
  *    scaling iterations, same marginal-L1 convergence read, so the
  *    two queries differ ONLY in the kernel (a controlled contrast).
  *  - Kemeny objective (`q_kemeny_objective`): Σ pairwise-majority
  *    violations of three candidate consensus orders — Borda,
  *    Copeland, and raw total revenue — against the monthly duel
  *    matrix. Which aggregation lands closest to the Kemeny optimum
  *    (whose exact computation is NP-hard; these are its standard
  *    polynomial surrogates, now scored on their shared objective).
  */
object Round179Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Harrell's C at band widths 100/10000/40000 cents.
    QueryDef("q_harrell_band_sweep",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base0 = Tables.orders(s, d).selectExpr(
          "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000" +
            " AS dday",
          "CASE WHEN o_orderstatus = 'F' THEN 1L ELSE 0L END AS ev",
          "CAST(floor(o_totalprice) AS BIGINT) AS p")
        val mx = base0.agg(max(col("dday")).as("mxd"))
        val ws = s.range(0, 3).select(
          expr("element_at(array(100L, 10000L, 40000L)," +
            " CAST(id + 1 AS INT))").as("w"))
        val grid = base0.crossJoin(broadcast(mx))
          .crossJoin(broadcast(ws))
          .selectExpr("w", "mxd - dday AS t", "p div w AS band", "ev")
          .groupBy(col("w"), col("t"), col("band"))
          .agg(count(lit(1)).as("n"), sum(col("ev")).as("dd"))
        val later = Window.partitionBy(col("w"), col("band"))
          .orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val inT = Window.partitionBy(col("w"), col("t"))
          .orderBy(col("band"))
        grid
          .withColumn("lb",
            coalesce(sum(col("n")).over(later), lit(0L)))
          .withColumn("cum_leq", sum(col("lb")).over(inT
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_less", coalesce(sum(col("lb")).over(inT
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("tot_later", sum(col("lb")).over(
            Window.partitionBy(col("w"), col("t"))))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("grid_cells"),
            sum(expr("dd * cum_less")).as("conc"),
            sum(expr("dd * (tot_later - cum_leq)")).as("disc"),
            sum(expr("dd * (cum_leq - cum_less)")).as("ties"))
          .selectExpr("w AS band_width_cents_e2", "grid_cells",
            "conc", "disc", "ties",
            """CASE WHEN conc + disc + ties = 0 THEN NULL
              |ELSE (2 * conc + ties) * 1000000
              |  div (2 * (conc + disc + ties)) END AS c_index_e6"""
              .stripMargin)
      },
      Some("""WITH base0 AS (
             |  SELECT epoch_us(o_orderdate) // 86400000000 AS dday,
             |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
             |           AS ev,
             |         CAST(floor(o_totalprice) AS BIGINT) AS p
             |  FROM orders),
             |mx AS (SELECT max(dday) AS mxd FROM base0),
             |grid AS (SELECT w, mxd - dday AS t, p // w AS band,
             |                CAST(count(*) AS BIGINT) AS n,
             |                CAST(sum(ev) AS BIGINT) AS dd
             |         FROM base0 CROSS JOIN mx
             |         CROSS JOIN (VALUES (CAST(100 AS BIGINT)),
             |           (CAST(10000 AS BIGINT)),
             |           (CAST(40000 AS BIGINT))) ws(w)
             |         GROUP BY 1, 2, 3),
             |wl AS (SELECT w, t, band, n, dd,
             |         coalesce(CAST(sum(n) OVER (PARTITION BY w, band
             |           ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
             |           AND 1 PRECEDING) AS BIGINT), 0) AS lb
             |       FROM grid),
             |cw AS (SELECT w, t, band, dd,
             |         CAST(sum(lb) OVER (PARTITION BY w, t ORDER BY band
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_leq,
             |         coalesce(CAST(sum(lb) OVER (PARTITION BY w, t
             |           ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING
             |           AND 1 PRECEDING) AS BIGINT), 0) AS cum_less,
             |         CAST(sum(lb) OVER (PARTITION BY w, t) AS BIGINT)
             |           AS tot_later
             |       FROM wl),
             |agg AS (SELECT w, CAST(count(*) AS BIGINT) AS grid_cells,
             |          CAST(sum(dd * cum_less) AS BIGINT) AS conc,
             |          CAST(sum(dd * (tot_later - cum_leq)) AS BIGINT)
             |            AS disc,
             |          CAST(sum(dd * (cum_leq - cum_less)) AS BIGINT)
             |            AS ties
             |        FROM cw GROUP BY 1)
             |SELECT w AS band_width_cents_e2, grid_cells, conc, disc,
             |       ties,
             |       CASE WHEN conc + disc + ties = 0 THEN NULL
             |       ELSE (2 * conc + ties) * 1000000
             |         // (2 * (conc + disc + ties)) END AS c_index_e6
             |FROM agg""".stripMargin)),

    // ── Sinkhorn with the entropic Gibbs kernel 2^(−cost·log₂e/ε).
    QueryDef("q_sinkhorn_gibbs",
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
          .localCheckpoint(false)
        val rowM = base.groupBy(col("rg")).agg(count(lit(1)).as("r"))
        val colM = base.groupBy(col("seg")).agg(count(lit(1)).as("cm"))
        val segIdx = colM.selectExpr("seg", "cm",
          """CAST(CASE seg WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1
            |WHEN 'FURNITURE' THEN 2 WHEN 'HOUSEHOLD' THEN 3
            |ELSE 4 END AS BIGINT) AS sj""".stripMargin)
        // ε = 2: exponent y = |rg−sj| · log₂e / 2 in e6 units
        val grid = rowM.crossJoin(broadcast(segIdx))
          .withColumn("y", expr("abs(rg - sj) * 1442695 div 2"))
          .withColumn("p", Sketches.pow2NegE6Expr("y"))
          .selectExpr("rg", "seg", "r", "cm", "p")
        def rowScale(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("rs", sum(col("p")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("rg")))
          .selectExpr("rg", "seg", "r", "cm",
            s"CAST(p AS $dec) * r * 1000000 div rs AS p")
        def colScale(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("cs", sum(col("p")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("seg")))
          .selectExpr("rg", "seg", "r", "cm",
            s"CAST(p AS $dec) * cm * 1000000 div cs AS p")
        val c2 = colScale(rowScale(colScale(rowScale(grid))))
          .localCheckpoint(false)
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
      Some {
        val p0 = Sketches.pow2NegE6Sql("abs(rg - sj) * 1442695 // 2")
        s"""WITH base AS (
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
           |           CAST($p0 AS HUGEINT) AS p
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
           |FROM c2 CROSS JOIN re CROSS JOIN ce""".stripMargin
      }),

    // ── Kemeny objective of Borda / Copeland / revenue orders.
    QueryDef("q_kemeny_objective",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ranks = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .where(expr("year(l_shipdate) = 1996"))
          .groupBy(expr("month(l_shipdate)").as("m"), col("p_brand"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)
            .cast("long")).as("rev"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("m"))
              .orderBy(col("rev").desc, col("p_brand"))).cast("long"))
          .localCheckpoint(false) // duel matrix + three candidate orders
        // duel margins: wins of a over b across months
        val duels = ranks.as("a")
          .join(ranks.as("b"),
            col("a.m") === col("b.m") &&
              col("a.p_brand") < col("b.p_brand"))
          .groupBy(col("a.p_brand").as("x"), col("b.p_brand").as("y"))
          .agg(sum(expr("CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END"))
            .as("wx"), count(lit(1)).as("mm"))
          .localCheckpoint(false)
        val nb = ranks.agg(countDistinct(col("p_brand")).as("nbr"))
        // candidate orders (rank 1 = best): borda, copeland2, revenue
        val borda = ranks.crossJoin(broadcast(nb))
          .groupBy(col("p_brand")).agg(sum(expr("nbr - rk")).as("sc"))
        val cope = duels.selectExpr("x AS p_brand",
            """CASE WHEN 2 * wx > mm THEN 2L
              |WHEN 2 * wx = mm THEN 1L ELSE 0L END AS pts"""
              .stripMargin)
          .unionByName(duels.selectExpr("y AS p_brand",
            """CASE WHEN 2 * (mm - wx) > mm THEN 2L
              |WHEN 2 * (mm - wx) = mm THEN 1L ELSE 0L END AS pts"""
              .stripMargin))
          .groupBy(col("p_brand")).agg(sum(col("pts")).as("sc"))
        val revenue = ranks.groupBy(col("p_brand"))
          .agg(sum(col("rev")).as("sc"))
        def order(df: org.apache.spark.sql.DataFrame, nm: String) = df
          .withColumn("pos", row_number().over(
            Window.orderBy(col("sc").desc, col("p_brand"))).cast("long"))
          .selectExpr(s"'$nm' AS method", "p_brand", "pos")
        val cand = order(borda, "borda")
          .unionByName(order(cope, "copeland"))
          .unionByName(order(revenue, "revenue"))
          .localCheckpoint(false)
        // violations: pair (x<y) where majority says x beats y but the
        // candidate ranks x AFTER y (or vice versa); 6-6 months = no
        // majority, never a violation
        cand.as("cx")
          .join(cand.as("cy"), col("cx.method") === col("cy.method"))
          .where(col("cx.p_brand") < col("cy.p_brand"))
          .join(duels, col("x") === col("cx.p_brand") &&
            col("y") === col("cy.p_brand"))
          .groupBy(col("cx.method").as("method"))
          .agg(count(lit(1)).as("pairs"),
            sum(expr("""CASE
              |WHEN 2 * wx > mm AND cx.pos > cy.pos THEN 1
              |WHEN 2 * wx < mm AND cx.pos < cy.pos THEN 1
              |ELSE 0 END""".stripMargin)).as("kemeny_violations"))
      },
      Some("""WITH rev AS (
             |  SELECT month(l_shipdate) AS m, p_brand,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE year(l_shipdate) = 1996
             |  GROUP BY 1, 2),
             |rk AS MATERIALIZED (SELECT m, p_brand, rev,
             |         CAST(row_number() OVER (PARTITION BY m
             |           ORDER BY rev DESC, p_brand) AS BIGINT) AS rk
             |       FROM rev),
             |duels AS MATERIALIZED (SELECT a.p_brand AS x,
             |           b.p_brand AS y,
             |           CAST(sum(CASE WHEN a.rk < b.rk THEN 1 ELSE 0
             |             END) AS BIGINT) AS wx,
             |           CAST(count(*) AS BIGINT) AS mm
             |         FROM rk a JOIN rk b ON b.m = a.m
             |           AND a.p_brand < b.p_brand
             |         GROUP BY 1, 2),
             |nb AS (SELECT CAST(count(DISTINCT p_brand) AS BIGINT)
             |         AS nbr FROM rk),
             |borda AS (SELECT p_brand, CAST(sum(nbr - rk) AS BIGINT)
             |            AS sc
             |          FROM rk CROSS JOIN nb GROUP BY 1),
             |cope AS (SELECT p_brand, CAST(sum(pts) AS BIGINT) AS sc
             |         FROM (SELECT x AS p_brand,
             |                 CASE WHEN 2 * wx > mm THEN 2
             |                      WHEN 2 * wx = mm THEN 1 ELSE 0 END
             |                   AS pts FROM duels
             |               UNION ALL
             |               SELECT y,
             |                 CASE WHEN 2 * (mm - wx) > mm THEN 2
             |                      WHEN 2 * (mm - wx) = mm THEN 1
             |                      ELSE 0 END FROM duels)
             |         GROUP BY 1),
             |rv AS (SELECT p_brand, CAST(sum(rev) AS BIGINT) AS sc
             |       FROM rk GROUP BY 1),
             |cand AS MATERIALIZED (
             |  SELECT 'borda' AS method, p_brand,
             |         CAST(row_number() OVER (ORDER BY sc DESC, p_brand)
             |           AS BIGINT) AS pos FROM borda
             |  UNION ALL
             |  SELECT 'copeland', p_brand,
             |         CAST(row_number() OVER (ORDER BY sc DESC, p_brand)
             |           AS BIGINT) FROM cope
             |  UNION ALL
             |  SELECT 'revenue', p_brand,
             |         CAST(row_number() OVER (ORDER BY sc DESC, p_brand)
             |           AS BIGINT) FROM rv)
             |SELECT cx.method AS method,
             |       CAST(count(*) AS BIGINT) AS pairs,
             |       CAST(sum(CASE
             |         WHEN 2 * wx > mm AND cx.pos > cy.pos THEN 1
             |         WHEN 2 * wx < mm AND cx.pos < cy.pos THEN 1
             |         ELSE 0 END) AS BIGINT) AS kemeny_violations
             |FROM cand cx
             |JOIN cand cy ON cy.method = cx.method
             |  AND cx.p_brand < cy.p_brand
             |JOIN duels ON x = cx.p_brand AND y = cy.p_brand
             |GROUP BY 1""".stripMargin))
  )
}
