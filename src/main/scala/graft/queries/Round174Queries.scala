package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-174 batch — survival-model discrimination, preference
  * aggregation, and risk-adjusted performance:
  *
  *  - Harrell's C (`q_harrell_c`): concordance of the spend score with
  *    churn order — THE discrimination read for q_cox_score's model.
  *    Exact pair counting without an n² join: the score is banded
  *    (hecto-dollars ÷100 → a bounded axis), so comparable pairs
  *    decompose over the (duration × band) grid — an EXCLUSIVE suffix
  *    window per band over time ("at risk strictly later") and a
  *    band-prefix window within each time slice. Ties in score count
  *    half, the Harrell convention; ×2 algebra keeps it integer.
  *  - Borda + Copeland (`q_borda_brands`): rank aggregation of the 12
  *    monthly 1996 brand revenue rankings — Borda score Σ(n−rank) and
  *    Copeland majority-wins (×2 so the 6–6 split counts 1). The
  *    social-choice read q_rank_fusion (RRF) approximates; this is the
  *    exact committee version on the bounded brand axis.
  *  - Sharpe / Sortino (`q_sharpe_sortino`): monthly revenue growth
  *    treated as a return series — mean/σ and mean/downside-σ, the
  *    risk-adjusted pair next to q_max_drawdown / q_var_es. Returns
  *    are e6 integers from the lag window over the VISIBLE monthly
  *    aggregate; two moment sets, one double close each.
  */
object Round174Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Harrell's C over the (duration × score-band) grid.
    QueryDef("q_harrell_c",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base0 = Tables.orders(s, d).selectExpr(
          "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000" +
            " AS dday",
          "CASE WHEN o_orderstatus = 'F' THEN 1L ELSE 0L END AS ev",
          "CAST(floor(o_totalprice) AS BIGINT) div 10000 AS band")
        val mx = base0.agg(max(col("dday")).as("mxd"))
        val grid = base0.crossJoin(broadcast(mx))
          .selectExpr("mxd - dday AS t", "band", "ev")
          .groupBy(col("t"), col("band"))
          .agg(count(lit(1)).as("n"), sum(col("ev")).as("dd"))
        val later = Window.partitionBy(col("band"))
          .orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val withLater = grid
          .withColumn("later_b", sum(col("n")).over(later))
        val inT = Window.partitionBy(col("t")).orderBy(col("band"))
        withLater
          .withColumn("lb", coalesce(col("later_b"), lit(0L)))
          .withColumn("cum_leq",
            sum(col("lb")).over(inT
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_less",
            coalesce(sum(col("lb")).over(inT
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("tot_later",
            sum(col("lb")).over(Window.partitionBy(col("t"))))
          // higher band (spend) scoring = predicted EARLIER event:
          // concordant when the later-at-risk subject has a LOWER band
          .agg(sum(expr("dd * cum_less")).as("conc"),
            sum(expr("dd * (tot_later - cum_leq)")).as("disc"),
            sum(expr("dd * (cum_leq - cum_less)")).as("ties"))
          .selectExpr("conc", "disc", "ties",
            """CASE WHEN conc + disc + ties = 0 THEN NULL
              |ELSE (2 * conc + ties) * 1000000
              |  div (2 * (conc + disc + ties)) END AS c_index_e6"""
              .stripMargin)
      },
      Some("""WITH base0 AS (
             |  SELECT epoch_us(o_orderdate) // 86400000000 AS dday,
             |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
             |           AS ev,
             |         CAST(floor(o_totalprice) AS BIGINT) // 10000
             |           AS band
             |  FROM orders),
             |mx AS (SELECT max(dday) AS mxd FROM base0),
             |grid AS (SELECT mxd - dday AS t, band,
             |                CAST(count(*) AS BIGINT) AS n,
             |                CAST(sum(ev) AS BIGINT) AS dd
             |         FROM base0 CROSS JOIN mx GROUP BY 1, 2),
             |wl AS (SELECT t, band, n, dd,
             |         coalesce(CAST(sum(n) OVER (PARTITION BY band
             |           ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING
             |           AND 1 PRECEDING) AS BIGINT), 0) AS lb
             |       FROM grid),
             |cw AS (SELECT t, band, dd,
             |         CAST(sum(lb) OVER (PARTITION BY t ORDER BY band
             |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_leq,
             |         coalesce(CAST(sum(lb) OVER (PARTITION BY t
             |           ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING
             |           AND 1 PRECEDING) AS BIGINT), 0) AS cum_less,
             |         CAST(sum(lb) OVER (PARTITION BY t) AS BIGINT)
             |           AS tot_later
             |       FROM wl),
             |agg AS (SELECT CAST(sum(dd * cum_less) AS BIGINT) AS conc,
             |               CAST(sum(dd * (tot_later - cum_leq))
             |                 AS BIGINT) AS disc,
             |               CAST(sum(dd * (cum_leq - cum_less))
             |                 AS BIGINT) AS ties
             |        FROM cw)
             |SELECT conc, disc, ties,
             |       CASE WHEN conc + disc + ties = 0 THEN NULL
             |       ELSE (2 * conc + ties) * 1000000
             |         // (2 * (conc + disc + ties)) END AS c_index_e6
             |FROM agg""".stripMargin)),

    // ── Borda + Copeland over the 12 monthly 1996 brand rankings.
    QueryDef("q_borda_brands",
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
          .localCheckpoint(false) // borda agg + pairwise majority
        val nb = ranks.agg(countDistinct(col("p_brand")).as("nb"))
        val borda = ranks.crossJoin(broadcast(nb))
          .groupBy(col("p_brand"))
          .agg(sum(expr("nb - rk")).as("borda"),
            count(lit(1)).as("months"))
        val duels = ranks.as("a")
          .join(ranks.as("b"),
            col("a.m") === col("b.m") &&
              col("a.p_brand") =!= col("b.p_brand"))
          .groupBy(col("a.p_brand").as("p_brand"),
            col("b.p_brand").as("opp"))
          .agg(sum(expr("CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END"))
            .as("w"), count(lit(1)).as("mm"))
          .selectExpr("p_brand",
            """CASE WHEN 2 * w > mm THEN 2L
              |     WHEN 2 * w = mm THEN 1L ELSE 0L END AS pts"""
              .stripMargin)
          .groupBy(col("p_brand"))
          .agg(sum(col("pts")).as("copeland2"))
        borda.join(duels, "p_brand")
          .selectExpr("p_brand", "months", "borda", "copeland2")
      },
      Some("""WITH rev AS (
             |  SELECT month(l_shipdate) AS m, p_brand,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE year(l_shipdate) = 1996
             |  GROUP BY 1, 2),
             |rk AS (SELECT m, p_brand, CAST(row_number() OVER (
             |         PARTITION BY m ORDER BY rev DESC, p_brand)
             |         AS BIGINT) AS rk
             |       FROM rev),
             |nb AS (SELECT CAST(count(DISTINCT p_brand) AS BIGINT)
             |         AS nb FROM rk),
             |borda AS (SELECT p_brand,
             |            CAST(sum(nb - rk) AS BIGINT) AS borda,
             |            CAST(count(*) AS BIGINT) AS months
             |          FROM rk CROSS JOIN nb GROUP BY 1),
             |duel AS (SELECT a.p_brand AS p_brand, b.p_brand AS opp,
             |           CAST(sum(CASE WHEN a.rk < b.rk THEN 1 ELSE 0
             |             END) AS BIGINT) AS w,
             |           CAST(count(*) AS BIGINT) AS mm
             |         FROM rk a JOIN rk b ON b.m = a.m
             |           AND b.p_brand <> a.p_brand
             |         GROUP BY 1, 2),
             |cope AS (SELECT p_brand,
             |           CAST(sum(CASE WHEN 2 * w > mm THEN 2
             |                         WHEN 2 * w = mm THEN 1
             |                         ELSE 0 END) AS BIGINT)
             |             AS copeland2
             |         FROM duel GROUP BY 1)
             |SELECT b.p_brand AS p_brand, months, borda, copeland2
             |FROM borda b JOIN cope c ON c.p_brand = b.p_brand"""
        .stripMargin)),

    // ── Sharpe / Sortino of monthly revenue growth.
    QueryDef("q_sharpe_sortino",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val monthly = Tables.lineitem(s, d)
          .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " div 2592000000000").as("mo"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)
            .cast("long")).as("x"))
        val ret = monthly
          .withColumn("xl", lag(col("x"), 1).over(Window.orderBy("mo")))
          .where(col("xl").isNotNull && col("xl") > 0)
          .selectExpr("(x - xl) * 1000000 div xl AS r")
        ret.agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
            sum(expr(s"CAST(r AS $dec) * r")).as("qr"),
            sum(expr(s"CASE WHEN r < 0 THEN CAST(r AS $dec) * r" +
              " ELSE CAST(0 AS decimal(38,0)) END")).as("qd"))
          .selectExpr("n", "sr div n AS mean_ret_e6",
            s"""CASE WHEN CAST(n AS $dec) * qr
               | - CAST(sr AS $dec) * sr = 0 THEN NULL
               |ELSE round(CAST(sr AS DOUBLE)
               |  / sqrt(CAST(CAST(n AS $dec) * qr
               |     - CAST(sr AS $dec) * sr AS DOUBLE)), 6)
               |END AS sharpe""".stripMargin,
            """CASE WHEN qd = 0 THEN NULL
              |ELSE round(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)
              |  / sqrt(CAST(qd AS DOUBLE) / CAST(n AS DOUBLE)), 6)
              |END AS sortino""".stripMargin)
      },
      Some("""WITH monthly AS (
             |  SELECT epoch_us(l_shipdate) // 2592000000000 AS mo,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM lineitem GROUP BY 1),
             |ret AS (SELECT (x - xl) * 1000000 // xl AS r
             |        FROM (SELECT x, lag(x) OVER (ORDER BY mo) AS xl
             |              FROM monthly)
             |        WHERE xl IS NOT NULL AND xl > 0),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(r) AS BIGINT) AS sr,
             |             sum(CAST(r AS HUGEINT) * r) AS qr,
             |             sum(CASE WHEN r < 0 THEN CAST(r AS HUGEINT) * r
             |                      ELSE CAST(0 AS HUGEINT) END) AS qd
             |      FROM ret)
             |SELECT n, sr // n AS mean_ret_e6,
             |       CASE WHEN CAST(n AS HUGEINT) * qr
             |           - CAST(sr AS HUGEINT) * sr = 0 THEN NULL
             |       ELSE round(CAST(sr AS DOUBLE)
             |         / sqrt(CAST(CAST(n AS HUGEINT) * qr
             |            - CAST(sr AS HUGEINT) * sr AS DOUBLE)), 6)
             |       END AS sharpe,
             |       CASE WHEN qd = 0 THEN NULL
             |       ELSE round(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)
             |         / sqrt(CAST(qd AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             |       END AS sortino
             |FROM m""".stripMargin))
  )
}
