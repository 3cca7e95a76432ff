package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-39 batch: the nonparametric trend/location tests the stats
  * family still lacked, plus the drawdown profile of the inventory walk.
  *
  *  - Mann–Kendall trend (pairs with q_theil_sen: MK is the TEST for the
  *    slope Theil–Sen ESTIMATES) — all-integer S, tau-a, and 18·Var(S)
  *    with the exact tie term.
  *  - Kruskal–Wallis (extends q_mann_whitney from 2 groups to k) —
  *    doubled pooled midranks keep every rank integer; H lands in e6 via
  *    DECIMAL(38,0) truncating division, per-group terms truncated in a
  *    fixed order mirrored by the oracle.
  *  - Jarque–Bera normality (skewness/kurtosis) — exact DECIMAL(38,0)
  *    raw moments, doubles touched once per group in an expression tree
  *    written identically on both engines (the q_corr_matrix precedent).
  *  - Max drawdown of the q_clamped_balance supplier walk (same signed
  *    deltas, unclamped series): running-max minus running sum, pure
  *    windows, ONE keyed exchange.
  */
object Round39Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Mann–Kendall trend test per event type over the daily-count
    //    series. The pair join is on the 30-row-per-key daily axis (the
    //    O(n²) lives on the AGGREGATED grain — never raw events); the
    //    tie term rides a second tiny aggregate on the same axis.
    //    var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5)  (= 18·Var(S), exact).
    QueryDef("q_mann_kendall",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type").as("k"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val a = daily.select(col("k"), col("day").as("day_a"), col("c").as("c_a"))
        val b = daily.select(col("k"), col("day").as("day_b"), col("c").as("c_b"))
        val pairs = a.join(b, Seq("k")).filter(col("day_a") < col("day_b"))
          .groupBy(col("k"))
          .agg(sum(signum(col("c_b") - col("c_a")).cast("long")).as("s"))
        val ties = daily.groupBy(col("k"), col("c"))
          .agg(count(lit(1)).as("t"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_distinct"), sum(col("t")).as("n_days"),
            sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_term"))
        // Sign factored out of the tau division: Spark `div` truncates
        // toward zero, DuckDB `//` floors — they only agree on non-
        // negative operands (the q_theil_sen convention).
        pairs.join(ties, Seq("k"))
          .select(col("k"), col("n_days"), col("s"),
            expr("""CASE WHEN s < 0
                   |  THEN -(2 * (-s) * 1000000 div (n_days * (n_days - 1)))
                   |  ELSE 2 * s * 1000000 div (n_days * (n_days - 1))
                   |END""".stripMargin).as("tau_a_e6"),
            (col("n_days") * (col("n_days") - 1) * (col("n_days") * 2 + 5)
              - col("tie_term")).as("var18"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS k, epoch_us(ts) // 86400000000 AS day,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |p AS (
             |  SELECT a.k,
             |         sum(CAST(CASE WHEN b.c > a.c THEN 1
             |                       WHEN b.c < a.c THEN -1 ELSE 0 END
             |             AS BIGINT)) AS s
             |  FROM daily a JOIN daily b ON a.k = b.k AND a.day < b.day
             |  GROUP BY 1),
             |t AS (
             |  SELECT k, count(*) AS n_distinct, sum(t) AS n_days,
             |         sum(t * (t - 1) * (2 * t + 5)) AS tie_term
             |  FROM (SELECT k, c, count(*) AS t FROM daily GROUP BY 1, 2)
             |  GROUP BY 1)
             |SELECT p.k, CAST(n_days AS BIGINT) AS n_days,
             |       CAST(s AS BIGINT) AS s,
             |       CAST(CASE WHEN s < 0
             |              THEN -(2 * (-s) * 1000000
             |                     // (n_days * (n_days - 1)))
             |              ELSE 2 * s * 1000000 // (n_days * (n_days - 1))
             |            END AS BIGINT) AS tau_a_e6,
             |       CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
             |            AS BIGINT) AS var18
             |FROM p JOIN t ON p.k = t.k""".stripMargin)),

    // ── Kruskal–Wallis H across the k event types on value cents.
    //    Doubled pooled midranks (midrank2 = 2·|{<v}| + |{=v}| + 1) keep
    //    ranks integer; they are built once on the DISTINCT-value axis
    //    (a ≤49k-row spine — the q_ks_test pattern) and joined back to
    //    the (group, value) grain. Per-group term (R2²·1e6) div (4·n_g)
    //    truncates BEFORE the sum — the oracle truncates identically.
    QueryDef("q_kruskal_wallis",
      (s, d) => {
        val v = Tables.events(s, d).select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("x"))
        val axis = v.groupBy(col("x")).agg(count(lit(1)).as("n_v"))
        val w = Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val mid = axis.withColumn("cum_less",
            coalesce(sum(col("n_v")).over(w), lit(0L)))
          .select(col("x"),
            (lit(2L) * col("cum_less") + col("n_v") + 1).as("mr2"))
        val gx = v.groupBy(col("g"), col("x")).agg(count(lit(1)).as("n_gx"))
        // R2_g² div (4n_g) exceeds 64 bits if multiplied naively, and
        // Spark's `div` silently WRAPS DECIMAL operands through long —
        // so split exactly: with q1 = R2 div b, r1 = R2 mod b (b = 4n_g),
        //   R2² div b = q1·R2 + (r1·R2) div b      (exact identity)
        // keeping every intermediate < 2⁶³ for N ≲ 3.5M pooled ranks.
        // The same split handles the final ·1e6 div N(N+1).
        val grp = gx.join(mid, Seq("x"))
          .groupBy(col("g"))
          .agg(sum(col("n_gx")).as("n_g"),
            sum(col("n_gx") * col("mr2")).as("r2_g"))
          .withColumn("c_g",
            expr("""(r2_g div (4 * n_g)) * r2_g
                   |+ ((r2_g % (4 * n_g)) * r2_g) div (4 * n_g)
                   |""".stripMargin))
        val tot = grp.agg(sum(col("n_g")).as("n_total"),
          (sum(col("c_g")) * 12).as("s12"))
        grp.join(broadcast(tot))
          .select(col("g"), col("n_g"), col("r2_g"),
            expr("""(s12 div (n_total * (n_total + 1))) * 1000000
                   |+ ((s12 % (n_total * (n_total + 1))) * 1000000)
                   |  div (n_total * (n_total + 1))
                   |- 3 * (n_total + 1) * 1000000
                   |""".stripMargin).as("h_e6"))
      },
      Some("""WITH v AS (
             |  SELECT event_type AS g,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
             |  FROM events),
             |axis AS (SELECT x, count(*) AS n_v FROM v GROUP BY 1),
             |mid AS (
             |  SELECT x, 2 * coalesce(sum(n_v) OVER (ORDER BY x
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |         + n_v + 1 AS mr2
             |  FROM axis),
             |gx AS (SELECT g, x, count(*) AS n_gx FROM v GROUP BY 1, 2),
             |grp AS (
             |  SELECT g, sum(n_gx) AS n_g, sum(n_gx * mr2) AS r2_g,
             |         (sum(n_gx * mr2) // (4 * sum(n_gx)))
             |           * sum(n_gx * mr2)
             |         + ((sum(n_gx * mr2) % (4 * sum(n_gx)))
             |            * sum(n_gx * mr2)) // (4 * sum(n_gx)) AS c_g
             |  FROM gx JOIN mid USING (x) GROUP BY 1),
             |tot AS (SELECT sum(n_g) AS n_total, sum(c_g) * 12 AS s12
             |        FROM grp)
             |SELECT g, CAST(n_g AS BIGINT) AS n_g,
             |       CAST(r2_g AS BIGINT) AS r2_g,
             |       CAST((s12 // (n_total * (n_total + 1))) * 1000000
             |            + ((s12 % (n_total * (n_total + 1))) * 1000000)
             |              // (n_total * (n_total + 1))
             |            - 3 * (n_total + 1) * 1000000 AS BIGINT) AS h_e6
             |FROM grp CROSS JOIN tot""".stripMargin)),

    // ── Jarque–Bera normality per event type on value cents: exact
    //    DECIMAL(38,0) raw moments s1..s4 in ONE aggregate; skewness,
    //    excess kurtosis and JB land as doubles through an expression
    //    tree written identically on both engines, rounded to 6 dp.
    QueryDef("q_jarque_bera",
      (s, d) => Tables.events(s, d)
        .select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("decimal(38,0)").as("x"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"),
          sum(col("x") * col("x") * col("x")).as("s3"),
          sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
        .selectExpr("g", "n",
          """round(CAST((CAST(s3 AS DOUBLE) / n
            |  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
            |  + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
            |        * (CAST(s1 AS DOUBLE) / n))
            | / (sqrt(CAST(s2 AS DOUBLE) / n
            |         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
            |    * (CAST(s2 AS DOUBLE) / n
            |       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
            | AS DOUBLE), 6) AS skewness""".stripMargin,
          """round(CAST((CAST(s4 AS DOUBLE) / n
            |  - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
            |  + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
            |        * (CAST(s2 AS DOUBLE) / n)
            |  - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
            |        * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
            | / ((CAST(s2 AS DOUBLE) / n
            |     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
            |    * (CAST(s2 AS DOUBLE) / n
            |       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
            | AS DOUBLE), 6) AS kurtosis""".stripMargin)
        // JB from the ALREADY-ROUNDED skew/kurt: both engines start from
        // bit-identical rounded doubles, so the statistic matches too.
        .selectExpr("g", "n", "skewness", "kurtosis",
          """round(CAST(n AS DOUBLE) / 6.0
            |  * (skewness * skewness
            |     + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0), 6)
            |  AS jb""".stripMargin),
      Some("""WITH m AS (
             |  SELECT event_type AS g, count(*) AS n,
             |         sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS s1,
             |         sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)
             |             * CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS s2,
             |         sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)
             |             * CAST(floor(value * 100 + 0.5) AS HUGEINT)
             |             * CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS s3,
             |         sum(CAST(floor(value * 100 + 0.5) AS HUGEINT)
             |             * CAST(floor(value * 100 + 0.5) AS HUGEINT)
             |             * CAST(floor(value * 100 + 0.5) AS HUGEINT)
             |             * CAST(floor(value * 100 + 0.5) AS HUGEINT)) AS s4
             |  FROM events GROUP BY 1),
             |sk AS (
             |SELECT g, CAST(n AS BIGINT) AS n,
             |  round(CAST((CAST(s3 AS DOUBLE) / n
             |    - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
             |    + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             |          * (CAST(s1 AS DOUBLE) / n))
             |   / (sqrt(CAST(s2 AS DOUBLE) / n
             |           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             |      * (CAST(s2 AS DOUBLE) / n
             |         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
             |   AS DOUBLE), 6) AS skewness,
             |  round(CAST((CAST(s4 AS DOUBLE) / n
             |    - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
             |    + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             |          * (CAST(s2 AS DOUBLE) / n)
             |    - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
             |          * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             |   / ((CAST(s2 AS DOUBLE) / n
             |       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             |      * (CAST(s2 AS DOUBLE) / n
             |         - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
             |   AS DOUBLE), 6) AS kurtosis
             |FROM m)
             |SELECT g, n, skewness, kurtosis,
             |       round(CAST(n AS DOUBLE) / 6.0
             |         * (skewness * skewness
             |            + (kurtosis - 3.0) * (kurtosis - 3.0) / 4.0), 6)
             |         AS jb
             |FROM sk""".stripMargin)),

    // ── Max drawdown of the UNCLAMPED supplier inventory walk (same
    //    signed deltas as q_clamped_balance): drawdown = running max −
    //    running sum; both windows and the final aggregate share ONE
    //    keyed exchange.
    QueryDef("q_max_drawdown",
      (s, d) => {
        val b = Tables.lineitem(s, d).select(
          (col("l_suppkey") % 50).as("k"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("t"),
          (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"),
          (col("l_quantity").cast("long") *
            when(col("l_returnflag") === "R", -1L).otherwise(1L)).as("d"))
        val w = Window.partitionBy(col("k")).orderBy(col("t"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        b.withColumn("run", sum(col("d")).over(w))
          .withColumn("peak", max(col("run")).over(w))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_moves"), sum(col("d")).as("final"),
            max(col("run")).as("max_runup"),
            max(col("peak") - col("run")).as("max_drawdown"))
      },
      Some("""WITH b AS (SELECT l_suppkey % 50 AS k,
             |                  epoch_us(l_shipdate) AS t,
             |                  l_orderkey * 8 + l_linenumber AS tie,
             |                  CAST(l_quantity AS BIGINT) *
             |                    (CASE WHEN l_returnflag = 'R' THEN -1
             |                          ELSE 1 END) AS d
             |           FROM lineitem),
             |r0 AS (SELECT k, t, tie, d,
             |              sum(d) OVER (PARTITION BY k ORDER BY t, tie
             |                           ROWS UNBOUNDED PRECEDING) AS run
             |       FROM b),
             |r AS (SELECT k, d, run,
             |             max(run) OVER (PARTITION BY k ORDER BY t, tie
             |                            ROWS UNBOUNDED PRECEDING) AS peak
             |      FROM r0)
             |SELECT k, CAST(count(*) AS BIGINT) AS n_moves,
             |       CAST(sum(d) AS BIGINT) AS final,
             |       CAST(max(run) AS BIGINT) AS max_runup,
             |       CAST(max(peak - run) AS BIGINT) AS max_drawdown
             |FROM r GROUP BY k""".stripMargin))
  )
}
