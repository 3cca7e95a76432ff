package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-117 batch: rank-statistic screens on the calendar-bounded
  * grids — Anderson–Darling 2-sample (tail-sensitive alternative to
  * q_ks_test's sup-norm), the Bartels rank von-Neumann randomness test
  * (the rank analogue of q_durbin_watson), and the Quade test (the
  * weighted-block Friedman variant that exploits block size when k is
  * small). All three tie-break ranks deterministically (documented —
  * the exact-replay convention the registry uses everywhere), so both
  * engines walk identical permutations.
  */
object Round117Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── AD 2-sample between priorities 1 and 2 on monthly order
    //    volumes: pooled deterministic sort (x, g, mo), per-prefix term
    //    ((N·Mᵢ − n·i)²·1e6) div (i(N−i)) summed over i<N, normalized
    //    by nm. The pooled axis is 2×months — every window here is
    //    calendar-bounded.
    QueryDef("q_ad_2samp",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .filter(substring(col("o_orderpriority"), 1, 1).isin("1", "2"))
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // pooled walk + the n/m rollup
        val sizes = cell.agg(
          sum(when(col("g") === "1", 1L).otherwise(0L)).as("n1"),
          count(lit(1)).as("nn"))
        val walk = cell.crossJoin(broadcast(sizes))
          .withColumn("i", row_number().over(
            Window.orderBy(col("x"), col("g"), col("mo"))))
          .withColumn("mi", sum(when(col("g") === "1", 1L).otherwise(0L))
            .over(Window.orderBy(col("x"), col("g"), col("mo"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("i") < col("nn"))
          .select(col("n1"), col("nn"),
            expr("""((nn * mi - n1 * i) * (nn * mi - n1 * i) * 1000000)
                   |div (i * (nn - i))""".stripMargin).as("term"))
        walk.groupBy(col("n1"), col("nn"))
          .agg(sum(col("term")).as("st"))
          .selectExpr("CAST(n1 AS BIGINT) AS n", "nn - n1 AS m",
            "st div (n1 * (nn - n1)) AS a2_e6")
      },
      Some("""WITH cell AS (SELECT substring(o_orderpriority, 1, 1) AS g,
             |                    year(o_orderdate) * 100
             |                      + month(o_orderdate) AS mo,
             |                    CAST(count(*) AS BIGINT) AS x
             |             FROM orders
             |             WHERE substring(o_orderpriority, 1, 1)
             |                     IN ('1', '2')
             |             GROUP BY 1, 2),
             |sizes AS (SELECT CAST(sum(CASE WHEN g = '1' THEN 1 ELSE 0
             |                  END) AS BIGINT) AS n1,
             |                 CAST(count(*) AS BIGINT) AS nn
             |          FROM cell),
             |walk AS (SELECT n1, nn,
             |                row_number() OVER w AS i,
             |                sum(CASE WHEN g = '1' THEN 1 ELSE 0 END)
             |                  OVER (w ROWS UNBOUNDED PRECEDING) AS mi
             |         FROM cell CROSS JOIN sizes
             |         WINDOW w AS (ORDER BY x, g, mo)),
             |t AS (SELECT n1, nn,
             |             CAST(sum(((nn * mi - n1 * i)
             |                       * (nn * mi - n1 * i) * 1000000)
             |                      // (i * (nn - i))) AS BIGINT) AS st
             |      FROM walk WHERE i < nn GROUP BY 1, 2)
             |SELECT n1 AS n, nn - n1 AS m,
             |       st // (n1 * (nn - n1)) AS a2_e6
             |FROM t""".stripMargin)),

    // ── Bartels rank von-Neumann ratio on daily order volume: ranks
    //    are the deterministic permutation (x, day); NM = Σ(rᵢ−rᵢ₊₁)²
    //    over day-adjacent observations, D = n(n²−1)/12 exactly (a
    //    permutation's centered sum of squares), RVN = NM/D with the
    //    large-sample z from the exact variance polynomial.
    QueryDef("q_bartels_rank",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
            "div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
        val rk = daily
          .withColumn("r", row_number().over(
            Window.orderBy(col("c"), col("day"))).cast("long"))
          .withColumn("rnext", lead(col("r"), 1).over(
            Window.orderBy(col("day"))))
        rk.agg(count(lit(1)).as("n"),
          sum(when(col("rnext").isNotNull,
            (col("r") - col("rnext")) * (col("r") - col("rnext")))
            .otherwise(0L)).as("nm"))
          .selectExpr("CAST(n AS BIGINT) AS n", "CAST(nm AS BIGINT) AS nm",
            "n * (n * n - 1) div 12 AS d",
            "nm * 1000000 div (n * (n * n - 1) div 12) AS rvn_e6",
            """round((CAST(nm AS DOUBLE)
              |       / CAST(n * (n * n - 1) div 12 AS DOUBLE)
              |       - CAST('2.0' AS DOUBLE))
              |     / sqrt(CAST(4 * (n - 2) AS DOUBLE)
              |            * CAST(5 * n * n - 2 * n - 9 AS DOUBLE)
              |            / (CAST('5.0' AS DOUBLE) * CAST(n AS DOUBLE)
              |               * CAST(n + 1 AS DOUBLE)
              |               * CAST((n - 1) * (n - 1) AS DOUBLE))), 6)
              |AS z""".stripMargin)
      },
      Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
             |                        AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM orders GROUP BY 1),
             |rk AS (SELECT day,
             |              CAST(row_number() OVER (ORDER BY c, day)
             |                AS BIGINT) AS r
             |       FROM daily),
             |sq AS (SELECT r, lead(r) OVER (ORDER BY day) AS rnext
             |       FROM rk),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(CASE WHEN rnext IS NOT NULL
             |                           THEN (r - rnext) * (r - rnext)
             |                           ELSE 0 END) AS BIGINT) AS nm
             |      FROM sq)
             |SELECT n, nm, n * (n * n - 1) // 12 AS d,
             |       nm * 1000000 // (n * (n * n - 1) // 12) AS rvn_e6,
             |       round((CAST(nm AS DOUBLE)
             |              / CAST(n * (n * n - 1) // 12 AS DOUBLE)
             |              - CAST('2.0' AS DOUBLE))
             |            / sqrt(CAST(4 * (n - 2) AS DOUBLE)
             |                   * CAST(5 * n * n - 2 * n - 9 AS DOUBLE)
             |                   / (CAST('5.0' AS DOUBLE) * CAST(n AS DOUBLE)
             |                      * CAST(n + 1 AS DOUBLE)
             |                      * CAST((n - 1) * (n - 1) AS DOUBLE))), 6)
             |         AS z
             |FROM t""".stripMargin)),

    // ── Quade test: blocks = months, treatments = priorities on the
    //    zero-filled grid. Within-block ranks and across-block range
    //    ranks are deterministic permutations; scores ride 2× units
    //    (s = Q·(2r − (k+1))) so F = (n−1)·B₂/(n·A₂ − B₂) is fully
    //    integer until the final division.
    QueryDef("q_quade",
      (s, d) => {
        val cell = Tables.orders(s, d)
          .groupBy(substring(col("o_orderpriority"), 1, 1).as("g"),
            expr("year(o_orderdate) * 100 + month(o_orderdate)").as("mo"))
          .agg(count(lit(1)).as("x"))
        val axes = cell.select(col("g")).distinct()
          .crossJoin(cell.select(col("mo")).distinct())
        val grid = axes.join(cell, Seq("g", "mo"), "left")
          .select(col("g"), col("mo"), coalesce(col("x"), lit(0L)).as("x"))
          .localCheckpoint(false) // in-block ranks + block ranges
        val kk = grid.agg(countDistinct(col("g")).as("k"))
        val ranked = grid
          .withColumn("r", row_number().over(
            Window.partitionBy(col("mo")).orderBy(col("x"), col("g")))
            .cast("long"))
        val rng = grid.groupBy(col("mo"))
          .agg((max(col("x")) - min(col("x"))).as("rng"))
          .withColumn("q", row_number().over(
            Window.orderBy(col("rng"), col("mo"))).cast("long"))
          .select(col("mo"), col("q"))
        val sc = ranked.join(rng, "mo").crossJoin(broadcast(kk))
          .select(col("g"), col("mo"),
            (col("q") * (col("r") * 2 - (col("k") + 1))).as("s2"))
        val perT = sc.groupBy(col("g")).agg(sum(col("s2")).as("sj"))
        val a2 = sc.agg(sum(expr("s2 * s2")).as("a2"),
          countDistinct(col("mo")).as("n"))
        perT.agg(sum(expr("sj * sj")).as("b2"), count(lit(1)).as("kk"))
          .crossJoin(broadcast(a2))
          .selectExpr("CAST(n AS BIGINT) AS n_blocks",
            "CAST(kk AS BIGINT) AS k", "CAST(a2 AS BIGINT) AS a2",
            "CAST(b2 AS BIGINT) AS b2",
            """CASE WHEN n * a2 - b2 = 0 THEN CAST('0.0' AS DOUBLE)
              |ELSE round(CAST((n - 1) * b2 AS DOUBLE)
              |     / CAST(n * a2 - b2 AS DOUBLE), 6)
              |END AS f_stat""".stripMargin)
      },
      Some("""WITH cell AS (SELECT substring(o_orderpriority, 1, 1) AS g,
             |                    year(o_orderdate) * 100
             |                      + month(o_orderdate) AS mo,
             |                    CAST(count(*) AS BIGINT) AS x
             |             FROM orders GROUP BY 1, 2),
             |grid AS (SELECT ga.g, ma.mo, coalesce(c.x, 0) AS x
             |         FROM (SELECT DISTINCT g FROM cell) ga
             |         CROSS JOIN (SELECT DISTINCT mo FROM cell) ma
             |         LEFT JOIN cell c ON c.g = ga.g AND c.mo = ma.mo),
             |kk AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS k
             |       FROM grid),
             |ranked AS (SELECT g, mo,
             |                  CAST(row_number() OVER (PARTITION BY mo
             |                    ORDER BY x, g) AS BIGINT) AS r
             |           FROM grid),
             |rng AS (SELECT mo,
             |               CAST(row_number() OVER (ORDER BY rg, mo)
             |                 AS BIGINT) AS q
             |        FROM (SELECT mo, max(x) - min(x) AS rg
             |              FROM grid GROUP BY 1)),
             |sc AS (SELECT g, ranked.mo,
             |              q * (r * 2 - (k + 1)) AS s2
             |       FROM ranked JOIN rng ON ranked.mo = rng.mo
             |       CROSS JOIN kk),
             |pt AS (SELECT g, CAST(sum(s2) AS BIGINT) AS sj
             |       FROM sc GROUP BY 1),
             |ta AS (SELECT CAST(sum(s2 * s2) AS BIGINT) AS a2,
             |              CAST(count(DISTINCT mo) AS BIGINT) AS n
             |       FROM sc),
             |tb AS (SELECT CAST(sum(sj * sj) AS BIGINT) AS b2,
             |              CAST(count(*) AS BIGINT) AS kk
             |       FROM pt)
             |SELECT n AS n_blocks, kk AS k, a2, b2,
             |       CASE WHEN n * a2 - b2 = 0 THEN CAST('0.0' AS DOUBLE)
             |            ELSE round(CAST((n - 1) * b2 AS DOUBLE)
             |                 / CAST(n * a2 - b2 AS DOUBLE), 6)
             |       END AS f_stat
             |FROM ta CROSS JOIN tb""".stripMargin))
  )
}
