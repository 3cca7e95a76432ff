package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-192 batch — paradox-resistant agreement, proper scoring of a
  * distributional forecast, ordered-alternative trend, and pairwise
  * social choice:
  *
  *  - Gwet's AC1 (`q_gwet_ac1`): the third chance convention on the
  *    first/last band agreement table — Ae = Σπ_g(1−π_g)/(K−1) stays
  *    small under skewed marginals where π/κ collapse (the "kappa
  *    paradox"); all exact integer e6 next to q_scott_pi's two.
  *  - Empirical CRPS (`q_crps`): climatological ensemble forecast of
  *    monthly revenue, scored on the held-out later half —
  *    CRPS = E|X−y| − ½E|X−X′|, both expectations exact integer sums
  *    over calendar-bounded month pairs. The PROPER score companion to
  *    q_pinball (quantile) and q_brier (binary).
  *  - Page's L (`q_page_l`): ordered-alternative trend across quarters
  *    within years (blocks = years, treatments = Q1..Q4, ranks by
  *    within-year pairwise counting with a quarter-index tie-break);
  *    L, E[L] = 25b and the z close with var = b·k²(k+1)(k²−1)/144.
  *    The a-priori-ordered sharpening of q_friedman.
  *  - Condorcet matrix (`q_condorcet`): order-level pairwise
  *    preferences among the top-5 revenue brands — a beats b in an
  *    order iff it took strictly more spend where both appear. The
  *    voting-theory companion to q_borda_brands/q_kemeny; pairwise
  *    wins are exact counts, winner read off the 10-row matrix.
  *
  * Scale shapes: agreement/monthly frames are bounded (≤36 cells /
  * calendar months); the Condorcet self-join fans out ≤C(5,2) per
  * order on the l_orderkey shuffle key; the within-year rank join is
  * ≤16 rows per year. No windows, no driver loops. */
object Round192Queries {

  private val dec = "decimal(38,0)"

  /** first/last band pairs — Round191's Bowker table, restated. */
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
      .localCheckpoint(false) // calendar-bounded

  def defs: Seq[QueryDef] = Seq(

    // ── Gwet's AC1 on the first/last band agreement table.
    QueryDef("q_gwet_ac1",
      (s, d) => {
        val pairs = bandPairs(s, d)
        val rows = pairs.groupBy(col("i")).agg(sum(col("c")).as("ri"))
        val cols = pairs.groupBy(col("j")).agg(sum(col("c")).as("cj"))
        val marg = rows.join(cols, col("i") === col("j"), "full")
          .selectExpr("coalesce(ri, 0L) AS ri", "coalesce(cj, 0L) AS cj")
        val base = pairs.agg(sum(col("c")).as("n"),
          sum(when(col("i") === col("j"), col("c")).otherwise(0L))
            .as("agree"))
        val chance = marg.crossJoin(broadcast(base))
          .agg(max(col("n")).as("n"), max(col("agree")).as("agree"),
            count(lit(1)).as("k"),
            sum(expr(s"CAST(ri + cj AS $dec) * (2 * n - ri - cj)"))
              .as("spi"))
        chance
          .selectExpr("n", "k", "agree * 1000000 div n AS ao_e6",
            s"""CASE WHEN k < 2 THEN NULL
               |ELSE CAST(CAST(spi AS $dec) * 1000000
               |  div (CAST(n AS $dec) * n * 4 * (k - 1)) AS BIGINT)
               |END AS ae_e6""".stripMargin)
          .selectExpr("n", "k", "ao_e6", "ae_e6",
            """CASE WHEN ae_e6 IS NULL OR ae_e6 >= 1000000 THEN NULL
              |WHEN ao_e6 >= ae_e6
              |THEN (ao_e6 - ae_e6) * 1000000 div (1000000 - ae_e6)
              |ELSE -((ae_e6 - ao_e6) * 1000000 div (1000000 - ae_e6))
              |END AS ac1_e6""".stripMargin)
      },
      Some(bandPairsSql +
        """,
          |rows_ AS (SELECT i, CAST(sum(c) AS BIGINT) AS ri
          |          FROM pairs GROUP BY 1),
          |cols_ AS (SELECT j, CAST(sum(c) AS BIGINT) AS cj
          |          FROM pairs GROUP BY 1),
          |marg AS (SELECT coalesce(ri, 0) AS ri, coalesce(cj, 0) AS cj
          |         FROM rows_ FULL JOIN cols_ ON i = j),
          |base AS (SELECT CAST(sum(c) AS BIGINT) AS n,
          |           CAST(sum(CASE WHEN i = j THEN c ELSE 0 END)
          |             AS BIGINT) AS agree FROM pairs),
          |chance AS (SELECT CAST(sum(CAST(ri + cj AS HUGEINT)
          |               * (2 * n - ri - cj)) AS HUGEINT) AS spi,
          |             CAST(count(*) AS BIGINT) AS k,
          |             max(n) AS n, max(agree) AS agree
          |           FROM marg CROSS JOIN base),
          |k2 AS (SELECT n, k, agree * 1000000 // n AS ao_e6,
          |         CASE WHEN k < 2 THEN NULL
          |         ELSE CAST(CAST(spi AS HUGEINT) * 1000000
          |           // (CAST(n AS HUGEINT) * n * 4 * (k - 1)) AS BIGINT)
          |         END AS ae_e6
          |       FROM chance)
          |SELECT n, k, ao_e6, ae_e6,
          |       CASE WHEN ae_e6 IS NULL OR ae_e6 >= 1000000 THEN NULL
          |       WHEN ao_e6 >= ae_e6
          |       THEN (ao_e6 - ae_e6) * 1000000 // (1000000 - ae_e6)
          |       ELSE -((ae_e6 - ao_e6) * 1000000 // (1000000 - ae_e6))
          |       END AS ac1_e6
          |FROM k2""".stripMargin)),

    // ── Empirical CRPS of the climatological monthly-revenue forecast.
    QueryDef("q_crps",
      (s, d) => {
        val mo = monthly(s, d)
        val thr = mo.agg((min(col("m")) +
          expr("(max(m) - min(m)) div 2")).as("thr"))
        val tagged = mo.crossJoin(broadcast(thr))
          .withColumn("ens", col("m") <= col("thr"))
          .localCheckpoint(false)
        val ens = tagged.where(col("ens")).select(col("x").as("xe"))
        val tg = tagged.where(!col("ens")).select(col("x").as("xt"))
        val a = tg.crossJoin(broadcast(ens))
          .agg(sum(expr("abs(xe - xt)")).as("a_sum"))
        val b = ens.crossJoin(broadcast(
            ens.select(col("xe").as("xe2"))))
          .agg(sum(expr("abs(xe - xe2)")).as("b_sum"))
        val cnts = tagged.agg(
          sum(when(col("ens"), 1L).otherwise(0L)).as("m_months"),
          sum(when(!col("ens"), 1L).otherwise(0L)).as("t_months"))
        cnts.crossJoin(broadcast(a)).crossJoin(broadcast(b))
          .selectExpr("t_months", "m_months", "a_sum", "b_sum",
            """CASE WHEN t_months = 0 OR m_months = 0 THEN NULL
              |ELSE a_sum div (t_months * m_months)
              |  - b_sum div (2 * m_months * m_months)
              |END AS crps_hecto""".stripMargin)
      },
      Some(monthlySql +
        """,
          |thr AS (SELECT min(m) + (max(m) - min(m)) // 2 AS thr
          |        FROM monthly),
          |tagged AS (SELECT m, x, m <= thr AS ens
          |           FROM monthly CROSS JOIN thr),
          |a AS (SELECT CAST(sum(abs(e.x - t.x)) AS BIGINT) AS a_sum
          |      FROM tagged e, tagged t
          |      WHERE e.ens AND NOT t.ens),
          |b AS (SELECT CAST(sum(abs(e1.x - e2.x)) AS BIGINT) AS b_sum
          |      FROM tagged e1, tagged e2
          |      WHERE e1.ens AND e2.ens),
          |cnts AS (SELECT
          |    CAST(sum(CASE WHEN ens THEN 1 ELSE 0 END) AS BIGINT)
          |      AS m_months,
          |    CAST(sum(CASE WHEN ens THEN 0 ELSE 1 END) AS BIGINT)
          |      AS t_months
          |  FROM tagged)
          |SELECT t_months, m_months, a_sum, b_sum,
          |       CASE WHEN t_months = 0 OR m_months = 0 THEN NULL
          |       ELSE a_sum // (t_months * m_months)
          |         - b_sum // (2 * m_months * m_months)
          |       END AS crps_hecto
          |FROM cnts CROSS JOIN a CROSS JOIN b""".stripMargin)),

    // ── Page's L: quarterly trend within years.
    QueryDef("q_page_l",
      (s, d) => {
        val yq = Tables.orders(s, d)
          .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("y"),
            expr("CAST(quarter(o_orderdate) AS BIGINT)").as("q"))
          .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
            .as("x"))
          .localCheckpoint(false) // calendar-bounded
        val full = yq.groupBy(col("y")).agg(count(lit(1)).as("nq"))
          .where(col("nq") === 4L).select(col("y"))
        val yq4 = yq.join(broadcast(full), Seq("y"))
        val ranked = yq4.as("a").join(broadcast(yq4.as("b")),
            col("a.y") === col("b.y"))
          .groupBy(col("a.y").as("y"), col("a.q").as("q"))
          .agg((lit(1L) + sum(when(col("b.x") < col("a.x") ||
            (col("b.x") === col("a.x") && col("b.q") < col("a.q")), 1L)
            .otherwise(0L))).as("r"))
        ranked.agg(countDistinct(col("y")).as("b"),
            sum(col("q") * col("r")).as("l"))
          .selectExpr("b", "l", "b * 25 AS el",
            """CASE WHEN b = 0 THEN NULL
              |WHEN l >= b * 25
              |THEN CAST(round(CAST(l - b * 25 AS DOUBLE)
              |  / sqrt(CAST(b * 1200 AS DOUBLE)
              |         / CAST('144.0' AS DOUBLE))
              |  * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
              |ELSE -CAST(round(CAST(b * 25 - l AS DOUBLE)
              |  / sqrt(CAST(b * 1200 AS DOUBLE)
              |         / CAST('144.0' AS DOUBLE))
              |  * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
              |END AS z_e6""".stripMargin)
      },
      Some("""WITH yq AS (
             |  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
             |         CAST(quarter(o_orderdate) AS BIGINT) AS q,
             |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1, 2),
             |full_ AS (SELECT y FROM yq GROUP BY y
             |          HAVING count(*) = 4),
             |yq4 AS (SELECT yq.* FROM yq JOIN full_ USING (y)),
             |ranked AS (SELECT a.y, a.q,
             |    1 + CAST(sum(CASE WHEN b.x < a.x
             |      OR (b.x = a.x AND b.q < a.q) THEN 1 ELSE 0 END)
             |      AS BIGINT) AS r
             |  FROM yq4 a JOIN yq4 b ON a.y = b.y
             |  GROUP BY 1, 2),
             |ag AS (SELECT CAST(count(DISTINCT y) AS BIGINT) AS b,
             |         CAST(sum(q * r) AS BIGINT) AS l FROM ranked)
             |SELECT b, l, b * 25 AS el,
             |       CASE WHEN b = 0 THEN NULL
             |       WHEN l >= b * 25
             |       THEN CAST(round(CAST(l - b * 25 AS DOUBLE)
             |         / sqrt(CAST(b * 1200 AS DOUBLE)
             |                / CAST('144.0' AS DOUBLE))
             |         * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
             |       ELSE -CAST(round(CAST(b * 25 - l AS DOUBLE)
             |         / sqrt(CAST(b * 1200 AS DOUBLE)
             |                / CAST('144.0' AS DOUBLE))
             |         * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
             |       END AS z_e6
             |FROM ag""".stripMargin)),

    // ── Condorcet pairwise-preference matrix over top-5 brands.
    QueryDef("q_condorcet",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey").as("l_partkey"),
            col("p_brand").as("brand")), Seq("l_partkey"))
          .select(col("l_orderkey").as("ok"), col("brand"),
            expr("CAST(floor(l_extendedprice * (1 - l_discount) * 100" +
              " + 0.5) AS BIGINT)").as("v"))
        val top5 = rev.groupBy(col("brand"))
          .agg(sum(col("v")).as("tot"))
          .orderBy(col("tot").desc, col("brand").asc).limit(5)
          .select(col("brand"))
        val obs = rev.join(broadcast(top5), Seq("brand"))
          .groupBy(col("ok"), col("brand")).agg(sum(col("v")).as("v"))
        obs.as("a").join(obs.as("b"),
            col("a.ok") === col("b.ok") &&
              col("a.brand") < col("b.brand"))
          .groupBy(col("a.brand").as("brand_a"),
            col("b.brand").as("brand_b"))
          .agg(sum(when(col("a.v") > col("b.v"), 1L).otherwise(0L))
            .as("wins_a"),
            sum(when(col("b.v") > col("a.v"), 1L).otherwise(0L))
              .as("wins_b"),
            sum(when(col("a.v") === col("b.v"), 1L).otherwise(0L))
              .as("ties"))
          .selectExpr("brand_a", "brand_b", "wins_a", "wins_b", "ties",
            """CASE WHEN wins_a > wins_b THEN brand_a
              |     WHEN wins_b > wins_a THEN brand_b
              |     ELSE 'TIE' END AS leader""".stripMargin)
      },
      Some("""WITH rev AS (
             |  SELECT l_orderkey AS ok, p_brand AS brand,
             |         CAST(floor(l_extendedprice * (1 - l_discount)
             |           * 100 + 0.5) AS BIGINT) AS v
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |top5 AS (SELECT brand FROM rev GROUP BY brand
             |         ORDER BY CAST(sum(v) AS BIGINT) DESC, brand
             |         LIMIT 5),
             |obs AS (SELECT ok, brand, CAST(sum(v) AS BIGINT) AS v
             |        FROM rev JOIN top5 USING (brand)
             |        GROUP BY 1, 2)
             |SELECT a.brand AS brand_a, b.brand AS brand_b,
             |       CAST(sum(CASE WHEN a.v > b.v THEN 1 ELSE 0 END)
             |         AS BIGINT) AS wins_a,
             |       CAST(sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END)
             |         AS BIGINT) AS wins_b,
             |       CAST(sum(CASE WHEN a.v = b.v THEN 1 ELSE 0 END)
             |         AS BIGINT) AS ties,
             |       CASE WHEN sum(CASE WHEN a.v > b.v THEN 1 ELSE 0 END)
             |              > sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END)
             |            THEN a.brand
             |            WHEN sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END)
             |              > sum(CASE WHEN a.v > b.v THEN 1 ELSE 0 END)
             |            THEN b.brand
             |            ELSE 'TIE' END AS leader
             |FROM obs a JOIN obs b ON a.ok = b.ok AND a.brand < b.brand
             |GROUP BY 1, 2""".stripMargin))
  )
}
