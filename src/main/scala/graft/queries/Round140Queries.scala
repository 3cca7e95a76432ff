package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-140 batch: inequality & gap decomposition over customer spend
  * — mean log deviation (Theil L / Atkinson(1) in log form; the
  * bottom-sensitive companion to q_theil_index's Theil T), the Palma
  * ratio (top-10% vs bottom-40% spend share — the two-number
  * inequality summary policy work actually uses), and a two-fold
  * Oaxaca–Blinder decomposition of the AUTOMOBILE−BUILDING mean order
  * value gap (explained by order-frequency differences vs not). Logs
  * are fixed-point integer log₂ ([[graft.ops.Bm25.log2E6]]); OLS
  * moments are exact integers with one IEEE close.
  */
object Round140Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Mean log deviation per nation (top 10) + its exact building
    //    blocks: MLD = ln(mean y) − mean(ln y) over positive customer
    //    spend, via log₂ e6 ⇒ ·ln2. AM–GM makes the gap ≥ 0, so the
    //    truncating div needs no sign factor.
    QueryDef("q_mld",
      (s, d) => {
        val dec = "decimal(38,0)"
        val y = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("y"))
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .where(col("y") > 0)
          .select(col("c_nationkey").cast("long").as("nk"), col("y"),
            Bm25.log2E6(col("y")).as("ly"))
        y.groupBy(col("nk"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("ly")).as("sly"))
          // gap₂ = log2(Σy/n) − Σlog2(y)/n, all e6; ln-domain ·693147
          .withColumn("gap2_e6",
            Bm25.log2E6(expr("sy div n")) - expr("sly div n"))
          .withColumn("mld_e6", expr(
            s"CAST(CAST(greatest(gap2_e6, 0) AS $dec) * 693147 " +
              "div 1000000 AS BIGINT)"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("mld_e6").desc, col("nk"))))
          .filter(col("rk") <= 10)
          .selectExpr("nk AS nationkey", "CAST(n AS BIGINT) AS n",
            "mld_e6", "CAST(rk AS BIGINT) AS rk")
      },
      Some(s"""WITH y AS (
             |  SELECT c.c_nationkey AS nk,
             |         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS y
             |  FROM orders o JOIN customer c
             |    ON o.o_custkey = c.c_custkey
             |  GROUP BY o.o_custkey, c.c_nationkey
             |  HAVING sum(CAST(floor(o.o_totalprice * 100 + 0.5)
             |    AS BIGINT)) > 0),
             |g AS (SELECT nk, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(y) AS BIGINT) AS sy,
             |             CAST(sum(${Bm25.log2E6Sql("y")}) AS BIGINT)
             |               AS sly
             |      FROM y GROUP BY 1),
             |m AS (SELECT nk, n,
             |             ${Bm25.log2E6Sql("sy // n")} - sly // n
             |               AS gap2_e6
             |      FROM g)
             |SELECT nk AS nationkey, n,
             |       CAST(CAST(greatest(gap2_e6, 0) AS HUGEINT) * 693147
             |         // 1000000 AS BIGINT) AS mld_e6,
             |       rk
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY
             |        CAST(greatest(gap2_e6, 0) AS HUGEINT) * 693147
             |          // 1000000 DESC, nk) AS BIGINT) AS rk
             |      FROM m)
             |WHERE rk <= 10""".stripMargin)),

    // ── Palma ratio: customer spend ranked desc (post-aggregate axis);
    //    top-10% spend over bottom-40% spend, exact e6. Cutoff counts
    //    are integer divs of n, so both engines slice identically.
    QueryDef("q_palma_ratio",
      (s, d) => {
        val y = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("y"))
        val ranked = y
          .withColumn("rk", row_number().over(
            Window.orderBy(col("y").desc, col("o_custkey"))).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        ranked.agg(
            max(col("n")).as("n"),
            sum(when(col("rk") <= expr("n div 10"), col("y"))
              .otherwise(0L)).as("s_top10"),
            sum(when(col("rk") > expr("n - n * 4 div 10"), col("y"))
              .otherwise(0L)).as("s_bot40"),
            sum(col("y")).as("s_all"))
          .selectExpr("CAST(n AS BIGINT) AS n_customers",
            "CAST(s_top10 AS BIGINT) AS s_top10",
            "CAST(s_bot40 AS BIGINT) AS s_bot40",
            "s_top10 * 1000000 div s_bot40 AS palma_e6",
            "s_top10 * 1000000 div s_all AS top10_share_e6")
      },
      Some("""WITH y AS (SELECT o_custkey,
             |                 CAST(sum(CAST(floor(o_totalprice * 100
             |                   + 0.5) AS BIGINT)) AS BIGINT) AS y
             |           FROM orders GROUP BY 1),
             |r AS (SELECT y,
             |             CAST(row_number() OVER (ORDER BY y DESC,
             |               o_custkey) AS BIGINT) AS rk,
             |             CAST(count(*) OVER () AS BIGINT) AS n
             |      FROM y),
             |a AS (SELECT max(n) AS n,
             |             CAST(sum(CASE WHEN rk <= n // 10 THEN y
             |               ELSE 0 END) AS BIGINT) AS s_top10,
             |             CAST(sum(CASE WHEN rk > n - n * 4 // 10
             |               THEN y ELSE 0 END) AS BIGINT) AS s_bot40,
             |             CAST(sum(y) AS BIGINT) AS s_all
             |      FROM r)
             |SELECT n AS n_customers, s_top10, s_bot40,
             |       s_top10 * 1000000 // s_bot40 AS palma_e6,
             |       s_top10 * 1000000 // s_all AS top10_share_e6
             |FROM a""".stripMargin)),

    // ── Oaxaca–Blinder (two-fold, BUILDING coefficients as the
    //    reference): per customer y = mean order cents, x = order
    //    count; per segment OLS slope/intercept from exact integer
    //    moments; gap = ȳ_A − ȳ_B splits into explained
    //    b_B·(x̄_A − x̄_B) and unexplained rest. One customer rollup +
    //    two 1-row moment frames; IEEE only at the close.
    QueryDef("q_oaxaca_lite",
      (s, d) => {
        val per = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
          .groupBy(col("c_mktsegment").as("seg"), col("o_custkey"))
          .agg(count(lit(1)).as("x"),
            expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))" +
              " div count(1)").as("yv"))
        val m = per.groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("yv")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * yv")).as("sxy"))
          .selectExpr("seg", "CAST(n AS DOUBLE) AS n",
            "CAST(sx AS DOUBLE) AS sx", "CAST(sy AS DOUBLE) AS sy",
            "CAST(sxx AS DOUBLE) AS sxx", "CAST(sxy AS DOUBLE) AS sxy")
        val a = m.filter(col("seg") === "AUTOMOBILE")
          .selectExpr("n AS na", "sx AS sxa", "sy AS sya",
            "sxx AS sxxa", "sxy AS sxya")
        val b = m.filter(col("seg") === "BUILDING")
          .selectExpr("n AS nb", "sx AS sxb", "sy AS syb",
            "sxx AS sxxb", "sxy AS sxyb")
        a.crossJoin(b)
          .selectExpr(
            "CAST(round(sya / na - syb / nb, 2) AS DOUBLE) AS gap_cents",
            """CAST(round(((nb * sxyb - sxb * syb)
              |  / (nb * sxxb - sxb * sxb))
              |  * (sxa / na - sxb / nb), 2) AS DOUBLE)
              |AS explained_cents""".stripMargin,
            """CAST(round((sya / na - syb / nb)
              |  - ((nb * sxyb - sxb * syb) / (nb * sxxb - sxb * sxb))
              |    * (sxa / na - sxb / nb), 2) AS DOUBLE)
              |AS unexplained_cents""".stripMargin)
      },
      Some("""WITH per AS (
             |  SELECT c.c_mktsegment AS seg, o.o_custkey,
             |         CAST(count(*) AS BIGINT) AS x,
             |         CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5)
             |             AS BIGINT)) AS BIGINT)
             |           // CAST(count(*) AS BIGINT) AS yv
             |  FROM orders o JOIN customer c
             |    ON o.o_custkey = c.c_custkey
             |  WHERE c.c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
             |  GROUP BY 1, 2),
             |m AS (SELECT seg, CAST(count(*) AS DOUBLE) AS n,
             |             CAST(sum(x) AS DOUBLE) AS sx,
             |             CAST(sum(yv) AS DOUBLE) AS sy,
             |             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE)
             |               AS sxx,
             |             CAST(sum(CAST(x AS HUGEINT) * yv) AS DOUBLE)
             |               AS sxy
             |      FROM per GROUP BY 1),
             |a AS (SELECT n AS na, sx AS sxa, sy AS sya, sxx AS sxxa,
             |             sxy AS sxya
             |      FROM m WHERE seg = 'AUTOMOBILE'),
             |b AS (SELECT n AS nb, sx AS sxb, sy AS syb, sxx AS sxxb,
             |             sxy AS sxyb
             |      FROM m WHERE seg = 'BUILDING')
             |SELECT round(sya / na - syb / nb, 2) AS gap_cents,
             |       round(((nb * sxyb - sxb * syb)
             |         / (nb * sxxb - sxb * sxb))
             |         * (sxa / na - sxb / nb), 2) AS explained_cents,
             |       round((sya / na - syb / nb)
             |         - ((nb * sxyb - sxb * syb)
             |            / (nb * sxxb - sxb * sxb))
             |           * (sxa / na - sxb / nb), 2) AS unexplained_cents
             |FROM a CROSS JOIN b""".stripMargin))
  )
}
