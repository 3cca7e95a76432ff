package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-194 batch — extreme-value block fitting, unseen-species
  * jackknife, Stein shrinkage, and count-model overdispersion:
  *
  *  - Gumbel fit (`q_gumbel_fit`): monthly block maxima of daily
  *    revenue → method-of-moments β̂ = s√6/π, μ̂ = x̄ − γβ̂, plus the
  *    12-block return level μ̂ − β̂·ln(−ln(1−1/12)). The block-maxima
  *    companion to q_pot_gpd's threshold route. Exact BIGINT moments
  *    over the calendar-bounded maxima; constants embedded as quoted
  *    doubles so both engines parse identical IEEE values.
  *  - Jackknife richness (`q_jackknife_richness`): first- and
  *    second-order jackknife estimates of total part "species" from
  *    singleton/doubleton frequencies — S₁ = D + f₁(n−1)/n,
  *    S₂ = D + f₁(2n−3)/n − f₂(n−2)²/(n(n−1)) — the bias-corrected
  *    cousins of q_chao1, exact integer e6 end to end.
  *  - James–Stein (`q_james_stein`): shrink the 25 per-nation mean
  *    order values toward the grand mean with factor
  *    1 − (k−3)σ̂²/Σ(x̄ᵢ−x̄)² (σ̂² from the pooled within variance /
  *    harmonic group size). Outputs the factor and the shrunk
  *    estimate for the extreme nation; the k-means-of-means analogue
  *    of q_eb-style shrinkage, exact integer moments + one double
  *    close.
  *  - NBD moment fit (`q_nbd_fit`): gamma-Poisson overdispersion of
  *    part popularity — r̂ = m²/(s²−m), p̂ = m/s², dispersion index
  *    s²/m. Flags whether a Poisson (dispersion ≈ 1) or NBD regime
  *    holds; exact moments, double closes.
  *
  * Scale shapes: grouped aggregates + broadcast scalar totals
  * throughout; block maxima ride the calendar-bounded daily frame; no
  * windows, no driver loops, every double close is a per-element
  * scalar on a one-row aggregate. */
object Round194Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Gumbel MOM on monthly maxima of daily revenue.
    QueryDef("q_gumbel_fit",
      (s, d) => {
        val mx = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)"))
            .as("x"))
          .groupBy(expr("CAST(date_trunc('month', dt) AS DATE)").as("mo"))
          .agg(max(col("x")).as("z"))
        mx.agg(count(lit(1)).as("b"), sum(col("z")).as("sz"),
            sum(expr(s"CAST(z AS $dec) * z")).as("sz2"))
          .selectExpr("b", "sz div b AS mean_max",
            s"""CASE WHEN b < 2 OR CAST(b AS $dec) * sz2
               |    - CAST(sz AS $dec) * sz <= 0 THEN NULL
               |ELSE CAST(round(sqrt(
               |    CAST(CAST(b AS $dec) * sz2 - CAST(sz AS $dec) * sz
               |      AS DOUBLE) / CAST(b AS DOUBLE)
               |    / CAST(b - 1 AS DOUBLE))
               |  * sqrt(CAST('6.0' AS DOUBLE))
               |  / CAST('3.141592653589793' AS DOUBLE)) AS BIGINT)
               |END AS beta_hecto""".stripMargin)
          .selectExpr("b", "mean_max", "beta_hecto",
            """CASE WHEN beta_hecto IS NULL THEN NULL
              |ELSE mean_max - CAST(round(
              |  CAST('0.5772156649015329' AS DOUBLE)
              |  * CAST(beta_hecto AS DOUBLE)) AS BIGINT)
              |END AS mu_hecto""".stripMargin)
          .selectExpr("b", "mean_max", "beta_hecto", "mu_hecto",
            """CASE WHEN beta_hecto IS NULL THEN NULL
              |ELSE mu_hecto - CAST(round(CAST(beta_hecto AS DOUBLE)
              |  * ln(-ln(CAST('1.0' AS DOUBLE)
              |           - CAST('1.0' AS DOUBLE)
              |             / CAST('12.0' AS DOUBLE)))) AS BIGINT)
              |END AS rl12_hecto""".stripMargin)
      },
      Some("""WITH daily AS (
             |  SELECT o_orderdate AS dt,
             |         CAST(sum(CAST(floor(o_totalprice / 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |mx AS (SELECT CAST(date_trunc('month', dt) AS DATE) AS mo,
             |         CAST(max(x) AS BIGINT) AS z
             |       FROM daily GROUP BY 1),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS b,
             |         CAST(sum(z) AS BIGINT) AS sz,
             |         CAST(sum(CAST(z AS HUGEINT) * z) AS HUGEINT) AS sz2
             |       FROM mx),
             |k1 AS (SELECT b, sz // b AS mean_max,
             |         CASE WHEN b < 2 OR CAST(b AS HUGEINT) * sz2
             |             - CAST(sz AS HUGEINT) * sz <= 0 THEN NULL
             |         ELSE CAST(round(sqrt(
             |             CAST(CAST(b AS HUGEINT) * sz2
             |               - CAST(sz AS HUGEINT) * sz AS DOUBLE)
             |             / CAST(b AS DOUBLE) / CAST(b - 1 AS DOUBLE))
             |           * sqrt(CAST('6.0' AS DOUBLE))
             |           / CAST('3.141592653589793' AS DOUBLE)) AS BIGINT)
             |         END AS beta_hecto
             |       FROM ag),
             |k2 AS (SELECT b, mean_max, beta_hecto,
             |         CASE WHEN beta_hecto IS NULL THEN NULL
             |         ELSE mean_max - CAST(round(
             |           CAST('0.5772156649015329' AS DOUBLE)
             |           * CAST(beta_hecto AS DOUBLE)) AS BIGINT)
             |         END AS mu_hecto
             |       FROM k1)
             |SELECT b, mean_max, beta_hecto, mu_hecto,
             |       CASE WHEN beta_hecto IS NULL THEN NULL
             |       ELSE mu_hecto - CAST(round(CAST(beta_hecto AS DOUBLE)
             |         * ln(-ln(CAST('1.0' AS DOUBLE)
             |                  - CAST('1.0' AS DOUBLE)
             |                    / CAST('12.0' AS DOUBLE)))) AS BIGINT)
             |       END AS rl12_hecto
             |FROM k2""".stripMargin)),

    // ── First/second-order jackknife part-species richness.
    QueryDef("q_jackknife_richness",
      (s, d) => {
        val freq = Tables.lineitem(s, d)
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        freq.agg(count(lit(1)).as("dd"), sum(col("c")).as("n"),
            sum(when(col("c") === 1L, 1L).otherwise(0L)).as("f1"),
            sum(when(col("c") === 2L, 1L).otherwise(0L)).as("f2"))
          .selectExpr("dd", "n", "f1", "f2",
            """CASE WHEN n = 0 THEN NULL
              |ELSE dd * 1000000 + f1 * (n - 1) * 1000000 div n
              |END AS jack1_e6""".stripMargin,
            s"""CASE WHEN n < 2 THEN NULL
               |ELSE dd * 1000000 + f1 * (2 * n - 3) * 1000000 div n
               |  - CAST(CAST(f2 AS $dec) * (n - 2) * (n - 2) * 1000000
               |    div (CAST(n AS $dec) * (n - 1)) AS BIGINT)
               |END AS jack2_e6""".stripMargin)
      },
      Some("""WITH freq AS (
             |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS dd,
             |         CAST(sum(c) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
             |           AS BIGINT) AS f1,
             |         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
             |           AS BIGINT) AS f2
             |       FROM freq)
             |SELECT dd, n, f1, f2,
             |       CASE WHEN n = 0 THEN NULL
             |       ELSE dd * 1000000 + f1 * (n - 1) * 1000000 // n
             |       END AS jack1_e6,
             |       CASE WHEN n < 2 THEN NULL
             |       ELSE dd * 1000000 + f1 * (2 * n - 3) * 1000000 // n
             |         - CAST(CAST(f2 AS HUGEINT) * (n - 2) * (n - 2)
             |             * 1000000
             |           // (CAST(n AS HUGEINT) * (n - 1)) AS BIGINT)
             |       END AS jack2_e6
             |FROM ag""".stripMargin)),

    // ── James–Stein shrinkage of per-nation mean order values.
    QueryDef("q_james_stein",
      (s, d) => {
        val grp = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey").as("o_custkey"),
              col("c_nationkey").as("nk")), Seq("o_custkey"))
          .select(col("nk"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("x"))
          .groupBy(col("nk"))
          .agg(count(lit(1)).as("ni"), sum(col("x")).as("sx"),
            sum(expr(s"CAST(x AS $dec) * x")).as("sx2"))
          .withColumn("mean_i", expr("sx div ni"))
          .localCheckpoint(false) // 25 nations
        val pooled = grp.agg(count(lit(1)).as("k"),
          sum(col("ni")).as("n"), sum(col("sx")).as("sxt"),
          sum(expr(s"CAST(sx2 AS $dec)" +
            s" - CAST(sx AS $dec) * sx div ni")).as("ssw"),
          sum(expr("1000000000000 div ni")).as("hinv"))
        val devs = grp.crossJoin(broadcast(pooled))
          .withColumn("gm", expr("sxt div n"))
          .agg(max(col("k")).as("k"), max(col("n")).as("n"),
            max(col("gm")).as("grand_mean"),
            max(expr(s"CAST(ssw AS $dec)")).as("ssw"),
            max(col("hinv")).as("hinv"),
            sum(expr(s"CAST(mean_i - gm AS $dec) * (mean_i - gm)"))
              .as("ssb"),
            max(expr("mean_i")).as("max_mean"))
        devs.selectExpr("k", "n", "grand_mean", "max_mean",
            s"""CASE WHEN k < 4 OR CAST(ssb AS DOUBLE) <= 0 THEN NULL
               |ELSE CAST(round(greatest(CAST('0.0' AS DOUBLE),
               |  CAST('1.0' AS DOUBLE)
               |  - CAST(k - 3 AS DOUBLE)
               |    * (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE))
               |    * (CAST(hinv AS DOUBLE)
               |       / CAST('1000000000000.0' AS DOUBLE)
               |       / CAST(k AS DOUBLE))
               |    / CAST(ssb AS DOUBLE))
               |  * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
               |END AS shrink_e6""".stripMargin)
          .selectExpr("k", "n", "grand_mean", "max_mean", "shrink_e6",
            s"""CASE WHEN shrink_e6 IS NULL THEN NULL
               |ELSE grand_mean + CAST(CAST(max_mean - grand_mean AS $dec)
               |  * shrink_e6 div 1000000 AS BIGINT)
               |END AS shrunk_max_cents""".stripMargin)
      },
      Some("""WITH grp AS (
             |  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS ni,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS sx,
             |         CAST(sum(CAST(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT) AS HUGEINT)
             |           * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |           AS HUGEINT) AS sx2
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1),
             |g2 AS (SELECT nk, ni, sx, sx2, sx // ni AS mean_i FROM grp),
             |pooled AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |             CAST(sum(ni) AS BIGINT) AS n,
             |             CAST(sum(sx) AS BIGINT) AS sxt,
             |             CAST(sum(CAST(sx2 AS HUGEINT)
             |               - CAST(sx AS HUGEINT) * sx // ni) AS HUGEINT)
             |               AS ssw,
             |             CAST(sum(1000000000000 // ni) AS BIGINT)
             |               AS hinv
             |           FROM g2),
             |devs AS (SELECT max(sxt // n) AS grand_mean,
             |           CAST(sum(CAST(mean_i - sxt // n AS HUGEINT)
             |             * (mean_i - sxt // n)) AS HUGEINT) AS ssb,
             |           max(mean_i) AS max_mean,
             |           max(CAST(ssw AS HUGEINT)) AS ssw,
             |           max(hinv) AS hinv,
             |           max(k) AS k, max(n) AS n
             |         FROM g2 CROSS JOIN pooled)
             |SELECT k, n, grand_mean, max_mean,
             |       CASE WHEN k < 4 OR CAST(ssb AS DOUBLE) <= 0 THEN NULL
             |       ELSE CAST(round(greatest(CAST('0.0' AS DOUBLE),
             |         CAST('1.0' AS DOUBLE)
             |         - CAST(k - 3 AS DOUBLE)
             |           * (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE))
             |           * (CAST(hinv AS DOUBLE)
             |              / CAST('1000000000000.0' AS DOUBLE)
             |              / CAST(k AS DOUBLE))
             |           / CAST(ssb AS DOUBLE))
             |         * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
             |       END AS shrink_e6,
             |       CASE WHEN k < 4 OR CAST(ssb AS DOUBLE) <= 0 THEN NULL
             |       ELSE grand_mean
             |         + CAST(CAST(max_mean - grand_mean AS HUGEINT)
             |           * CAST(round(greatest(CAST('0.0' AS DOUBLE),
             |               CAST('1.0' AS DOUBLE)
             |               - CAST(k - 3 AS DOUBLE)
             |                 * (CAST(ssw AS DOUBLE)
             |                    / CAST(n - k AS DOUBLE))
             |                 * (CAST(hinv AS DOUBLE)
             |                    / CAST('1000000000000.0' AS DOUBLE)
             |                    / CAST(k AS DOUBLE))
             |                 / CAST(ssb AS DOUBLE))
             |             * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
             |           // 1000000 AS BIGINT)
             |       END AS shrunk_max_cents
             |FROM devs""".stripMargin)),

    // ── NBD / gamma-Poisson overdispersion of part popularity.
    QueryDef("q_nbd_fit",
      (s, d) => {
        val freq = Tables.lineitem(s, d)
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
        freq.agg(count(lit(1)).as("dd"), sum(col("c")).as("n"),
            sum(col("c") * col("c")).as("c2"))
          .selectExpr("dd", "n",
            """CASE WHEN dd < 2 THEN NULL
              |ELSE CAST(round(
              |  (CAST(dd AS DOUBLE) * CAST(c2 AS DOUBLE)
              |   - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
              |  / CAST(dd AS DOUBLE) / CAST(dd - 1 AS DOUBLE)
              |  / (CAST(n AS DOUBLE) / CAST(dd AS DOUBLE))
              |  * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
              |END AS dispersion_e6""".stripMargin,
            """CASE WHEN dd < 2
              |  OR (CAST(dd AS DOUBLE) * CAST(c2 AS DOUBLE)
              |      - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
              |     / CAST(dd AS DOUBLE) / CAST(dd - 1 AS DOUBLE)
              |     <= CAST(n AS DOUBLE) / CAST(dd AS DOUBLE) THEN NULL
              |ELSE CAST(round(
              |  (CAST(n AS DOUBLE) / CAST(dd AS DOUBLE))
              |  * (CAST(n AS DOUBLE) / CAST(dd AS DOUBLE))
              |  / ((CAST(dd AS DOUBLE) * CAST(c2 AS DOUBLE)
              |      - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
              |     / CAST(dd AS DOUBLE) / CAST(dd - 1 AS DOUBLE)
              |     - CAST(n AS DOUBLE) / CAST(dd AS DOUBLE))
              |  * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
              |END AS r_e6""".stripMargin)
      },
      Some("""WITH freq AS (
             |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem GROUP BY 1),
             |ag AS (SELECT CAST(count(*) AS BIGINT) AS dd,
             |         CAST(sum(c) AS BIGINT) AS n,
             |         CAST(sum(c * c) AS BIGINT) AS c2
             |       FROM freq)
             |SELECT dd, n,
             |       CASE WHEN dd < 2 THEN NULL
             |       ELSE CAST(round(
             |         (CAST(dd AS DOUBLE) * CAST(c2 AS DOUBLE)
             |          - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             |         / CAST(dd AS DOUBLE) / CAST(dd - 1 AS DOUBLE)
             |         / (CAST(n AS DOUBLE) / CAST(dd AS DOUBLE))
             |         * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
             |       END AS dispersion_e6,
             |       CASE WHEN dd < 2
             |         OR (CAST(dd AS DOUBLE) * CAST(c2 AS DOUBLE)
             |             - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             |            / CAST(dd AS DOUBLE) / CAST(dd - 1 AS DOUBLE)
             |            <= CAST(n AS DOUBLE) / CAST(dd AS DOUBLE)
             |       THEN NULL
             |       ELSE CAST(round(
             |         (CAST(n AS DOUBLE) / CAST(dd AS DOUBLE))
             |         * (CAST(n AS DOUBLE) / CAST(dd AS DOUBLE))
             |         / ((CAST(dd AS DOUBLE) * CAST(c2 AS DOUBLE)
             |             - CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             |            / CAST(dd AS DOUBLE) / CAST(dd - 1 AS DOUBLE)
             |            - CAST(n AS DOUBLE) / CAST(dd AS DOUBLE))
             |         * CAST('1000000.0' AS DOUBLE)) AS BIGINT)
             |       END AS r_e6
             |FROM ag""".stripMargin))
  )
}
