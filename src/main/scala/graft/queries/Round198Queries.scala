package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-198 batch — poverty/polarization measurement over customer
  * spend and a pricing-digits audit:
  *
  *  - FGT family (`q_fgt_poverty`): Foster–Greer–Thorbecke FGT(0/1/2)
  *    with the line z = half of mean spend (a relative line,
  *    documented) — headcount, normalized gap, squared gap. Per-row
  *    gaps are exact integer e3 ratios squared before the sum, one
  *    grouped aggregate + broadcast line.
  *  - Watts index (`q_watts_index`): W = (1/n)Σ_poor ln(z/xᵢ) — the
  *    distribution-sensitive poverty measure FGT(α→…) cannot express;
  *    per-row integer log₂ differences, ln2 e6 close.
  *  - Wolfson polarization (`q_wolfson_polarization`): W = (μ/m)(1 −
  *    2·L(½) − G) from ONE distributed rank of customer spend
  *    (`Ranks.globalRowNumber` — range partitions + offsets, never a
  *    single-partition window): lower median by rank lookup,
  *    bottom-half share, and the exact rank-form Gini
  *    Σ(2r−n−1)x/(nΣx). The bipolarization companion to q_gini /
  *    q_lorenz_asym.
  *  - Price endings (`q_price_ending`): cents-mod-100 distribution of
  *    order totals — shares of .00/.50/.99 endings plus the exact-e6
  *    χ² against uniform over the 100 endings (the pricing-psychology
  *    cousin of q_benford's leading digits).
  *
  * Scale shapes: per-customer rollup is one keyed exchange; the rank
  * path is the documented O(n/p)-per-task range layout; endings are a
  * 100-cell grouped aggregate. */
object Round198Queries {

  private val dec = "decimal(38,0)"

  /** per-customer spend in cents + the z = mean/2 relative line. */
  private val spendLineSql =
    """WITH sp AS (
      |  SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |           AS BIGINT) AS x
      |  FROM orders GROUP BY o_custkey),
      |line AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |           CAST((CAST(sum(x) AS BIGINT) // count(*)) // 2
      |             AS BIGINT) AS z FROM sp)""".stripMargin

  private def spendLine(s: org.apache.spark.sql.SparkSession, d: String) = {
    val sp = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
        .as("x"))
      .select(col("x"))
      .localCheckpoint(false)
    val line = sp.agg(count(lit(1)).as("n"),
      expr("(sum(x) div count(*)) div 2").as("z"))
    (sp, line)
  }

  def defs: Seq[QueryDef] = Seq(

    // ── FGT(0/1/2) against the half-mean line.
    QueryDef("q_fgt_poverty",
      (s, d) => {
        val (sp, line) = spendLine(s, d)
        sp.crossJoin(broadcast(line))
          .withColumn("gap_e3",
            when(col("x") < col("z"),
              expr("(z - x) * 1000 div z")).otherwise(0L))
          .agg(max(col("n")).as("n"), max(col("z")).as("z_cents"),
            sum(when(col("x") < col("z"), 1L).otherwise(0L)).as("poor"),
            sum(col("gap_e3")).as("sg"),
            sum(col("gap_e3") * col("gap_e3")).as("sg2"))
          .selectExpr("n", "z_cents", "poor",
            "poor * 1000000 div n AS fgt0_e6",
            "sg * 1000 div n AS fgt1_e6",
            "sg2 div n AS fgt2_e6")
      },
      Some(spendLineSql +
        """,
          |g AS (SELECT n, z,
          |        CASE WHEN x < z THEN (z - x) * 1000 // z ELSE 0 END
          |          AS gap_e3,
          |        CASE WHEN x < z THEN 1 ELSE 0 END AS p
          |      FROM sp CROSS JOIN line)
          |SELECT max(n) AS n, max(z) AS z_cents,
          |       CAST(sum(p) AS BIGINT) AS poor,
          |       CAST(sum(p) AS BIGINT) * 1000000 // max(n) AS fgt0_e6,
          |       CAST(sum(gap_e3) AS BIGINT) * 1000 // max(n) AS fgt1_e6,
          |       CAST(sum(gap_e3 * gap_e3) AS BIGINT) // max(n)
          |         AS fgt2_e6
          |FROM g""".stripMargin)),

    // ── Watts index over the same half-mean line.
    QueryDef("q_watts_index",
      (s, d) => {
        val (sp, line) = spendLine(s, d)
        sp.crossJoin(broadcast(line))
          .where(col("x") < col("z") && col("x") >= 1L)
          .withColumn("lg", Bm25.log2E6(col("z")) - Bm25.log2E6(col("x")))
          .agg(max(col("n")).as("n"), count(lit(1)).as("poor"),
            sum(col("lg")).as("slg"))
          .selectExpr("n", "poor",
            """CASE WHEN n = 0 THEN NULL
              |ELSE (slg div n) * 693147 div 1000000
              |END AS watts_e6""".stripMargin)
      },
      Some {
        def L(v: String) = s"CAST(${Bm25.log2E6Sql(v)} AS BIGINT)"
        spendLineSql +
          s""",
             |g AS (SELECT n, ${L("z")} - ${L("x")} AS lg
             |      FROM sp CROSS JOIN line WHERE x < z AND x >= 1)
             |SELECT max(n) AS n, CAST(count(*) AS BIGINT) AS poor,
             |       CASE WHEN max(n) = 0 THEN NULL
             |       ELSE (CAST(sum(lg) AS BIGINT) // max(n)) * 693147
             |         // 1000000
             |       END AS watts_e6
             |FROM g""".stripMargin
      }),

    // ── Wolfson bipolarization from one distributed rank.
    QueryDef("q_wolfson_polarization",
      (s, d) => {
        val sp = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .as("x"))
        val ranked = graft.ops.Ranks.globalRowNumber(sp,
          Seq(col("x").asc, col("o_custkey").asc), "r")
        val tot = sp.agg(count(lit(1)).as("n"), sum(col("x")).as("xt"))
        val stats = ranked.crossJoin(broadcast(tot))
          .agg(max(col("n")).as("n"), max(col("xt")).as("xt"),
            max(when(col("r") === expr("(n + 1) div 2"), col("x")))
              .as("med"),
            sum(when(col("r") <= expr("n div 2"), col("x"))
              .otherwise(0L)).as("bottom"),
            sum(expr(s"CAST(2 * r - n - 1 AS $dec) * x")).as("gnum"))
        stats.selectExpr("n", "med", "xt div n AS mean_cents",
            s"CAST(CAST(gnum AS $dec) * 1000000 div (CAST(n AS $dec)" +
              " * xt) AS BIGINT) AS gini_e6",
            "bottom * 1000000 div xt AS bottom_share_e6")
          .selectExpr("n", "med", "mean_cents", "gini_e6",
            "bottom_share_e6",
            s"""CASE WHEN med = 0 THEN NULL
               |ELSE CAST(CAST(mean_cents AS $dec)
               |  * (1000000 - 2 * bottom_share_e6 - gini_e6)
               |  div med AS BIGINT)
               |END AS wolfson_e6""".stripMargin)
      },
      Some("""WITH sp AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |rk AS (SELECT x, row_number()
             |         OVER (ORDER BY x ASC, o_custkey ASC) AS r
             |       FROM sp),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |          CAST(sum(x) AS BIGINT) AS xt FROM sp),
             |st AS (SELECT
             |         max(CASE WHEN r = (n + 1) // 2 THEN x END) AS med,
             |         CAST(sum(CASE WHEN r <= n // 2 THEN x ELSE 0 END)
             |           AS BIGINT) AS bottom,
             |         CAST(sum(CAST(2 * r - n - 1 AS HUGEINT) * x)
             |           AS HUGEINT) AS gnum,
             |         max(n) AS n, max(xt) AS xt
             |       FROM rk CROSS JOIN tot),
             |k AS (SELECT n, med, xt // n AS mean_cents,
             |        CAST(CAST(gnum AS HUGEINT) * 1000000
             |          // (CAST(n AS HUGEINT) * xt) AS BIGINT)
             |          AS gini_e6,
             |        bottom * 1000000 // xt AS bottom_share_e6
             |      FROM st)
             |SELECT n, med, mean_cents, gini_e6, bottom_share_e6,
             |       CASE WHEN med = 0 THEN NULL
             |       ELSE CAST(CAST(mean_cents AS HUGEINT)
             |         * (1000000 - 2 * bottom_share_e6 - gini_e6)
             |         // med AS BIGINT)
             |       END AS wolfson_e6
             |FROM k""".stripMargin)),

    // ── Cents-ending distribution + uniformity chi-square.
    QueryDef("q_price_ending",
      (s, d) => {
        val ends = Tables.orders(s, d)
          .select(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)" +
            " % 100").as("e"))
          .groupBy(col("e")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // 100 cells
        val tot = ends.agg(sum(col("c")).as("n"))
        ends.crossJoin(broadcast(tot))
          .agg(max(col("n")).as("n"),
            sum(when(col("e") === 0L, col("c")).otherwise(0L)).as("c00"),
            sum(when(col("e") === 50L, col("c")).otherwise(0L)).as("c50"),
            sum(when(col("e") === 99L, col("c")).otherwise(0L)).as("c99"),
            sum(expr("(c * 100 - n) * (c * 100 - n) div (n * 100)"))
              .as("chi"))
          .selectExpr("n",
            "c00 * 1000000 div n AS share00_e6",
            "c50 * 1000000 div n AS share50_e6",
            "c99 * 1000000 div n AS share99_e6",
            "chi * 1000000 div n AS chi2_e6")
      },
      Some("""WITH ends AS (
             |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           % 100 AS e,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM ends)
             |SELECT CAST(sum(CASE WHEN e = 0 THEN c ELSE 0 END)
             |         AS BIGINT) * 1000000 // max(n) AS share00_e6,
             |       CAST(sum(CASE WHEN e = 50 THEN c ELSE 0 END)
             |         AS BIGINT) * 1000000 // max(n) AS share50_e6,
             |       CAST(sum(CASE WHEN e = 99 THEN c ELSE 0 END)
             |         AS BIGINT) * 1000000 // max(n) AS share99_e6,
             |       CAST(sum((c * 100 - n) * (c * 100 - n) // (n * 100))
             |         AS BIGINT) * 1000000 // max(n) AS chi2_e6,
             |       max(n) AS n
             |FROM ends CROSS JOIN tot""".stripMargin))
  )
}
