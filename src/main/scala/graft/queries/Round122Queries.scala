package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-122 batch: Benjamini–Yekutieli FDR (the dependence-robust
  * step-up q_bh_fdr's independence assumption can't give), the ABC
  * class-migration matrix (which parts moved revenue class year over
  * year — the inventory-policy churn behind q_abc_pareto's static
  * cut), and Cp/Cpk process capability of current daily volume against
  * limits set by the prior year's process (the SPC capability number
  * q_xbar_r's control limits feed). Integer-exact decisioning; IEEE
  * only in reported indices.
  */
object Round122Queries {

  /** \u03a6\u207b\u00b9(1 \u2212 0.025/d) in e6 for d = 1..96 (python statistics
    * .NormalDist, floor-truncated) \u2014 covers every BY effective
    * denominator at m \u2264 25. */
  private val byCritE6 = Seq[Long](1959963L,2241402L,2393979L,2497705L,2575829L,2638257L,2690109L,2734368L,2772921L,2807033L,2837596L,2865260L,2890511L,2913726L,2935199L,2955166L,2973819L,2991316L,3007786L,3023341L,3038074L,3052065L,3065383L,3078088L,3090232L,3101861L,3113017L,3123734L,3134046L,3143980L,3153563L,3162817L,3171765L,3180425L,3188815L,3196950L,3204845L,3212513L,3219967L,3227218L,3234276L,3241152L,3247853L,3254389L,3260767L,3266994L,3273078L,3279024L,3284838L,3290526L,3296093L,3301545L,3306884L,3312117L,3317247L,3322277L,3327212L,3332056L,3336810L,3341478L,3346064L,3350570L,3354999L,3359353L,3363635L,3367847L,3371991L,3376069L,3380083L,3384036L,3387928L,3391763L,3395540L,3399263L,3402932L,3406550L,3410116L,3413634L,3417103L,3420526L,3423904L,3427237L,3430527L,3433774L,3436981L,3440148L,3443275L,3446365L,3449417L,3452432L,3455412L,3458358L,3461269L,3464147L,3466992L,3469806L)
  private def byCritArr: String = byCritE6.mkString("array(", ", ", ")")
  private def byCritList: String = byCritE6.mkString("[", ", ", "]")

  def defs: Seq[QueryDef] = Seq(

    // ── Benjamini–Yekutieli at α=0.05 over the per-nation urgency |z|
    //    family: the dependence-robust step-up. Working erf-free, each
    //    rank i (1 = most significant) gets an EFFECTIVE two-sided
    //    denominator d = ⌈m·c(m)/(m−rk+1)⌉ (c(m) = Σ1/j, harmonic sum
    //    carried e9-truncated — identical both engines), and |z| is
    //    compared against the embedded Φ⁻¹(1 − 0.025/d) ladder
    //    (d ≤ 96 for m ≤ 25). Step-up: reject every rank ≤ the deepest
    //    clearing rank (running max from the bottom).
    QueryDef("q_by_fdr",
      (s, d) => {
        val per = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"),
            col("c_nationkey")), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderpriority") === "1-URGENT", 1L)
              .otherwise(0L)).as("k"))
          .localCheckpoint(false) // nation axis; pooled rollup reuses it
        val tot = per.agg(sum(col("n")).as("nn"), sum(col("k")).as("kk"),
          count(lit(1)).as("m"),
          expr("aggregate(sequence(1, CAST(count(1) AS INT)), 0L, " +
            "(acc, i) -> acc + 1000000000 div i)").as("cm_e9"))
        per.crossJoin(broadcast(tot))
          .withColumn("z_e6", expr(
            """CAST(round((CAST(k AS DOUBLE) * CAST(nn AS DOUBLE)
              |        - CAST(n AS DOUBLE) * CAST(kk AS DOUBLE))
              |      / sqrt(CAST(n AS DOUBLE) * CAST(kk AS DOUBLE)
              |             * CAST(nn - kk AS DOUBLE))
              |   * CAST('1000000' AS DOUBLE), 0) AS BIGINT)""".stripMargin))
          .withColumn("rk", row_number().over(
            Window.orderBy(abs(col("z_e6")).desc, col("n_name")))
            .cast("long"))
          .withColumn("eff_den", expr(
            """least(96L, (m * cm_e9 + (m - rk + 1) * 1000000000 - 1)
              |div ((m - rk + 1) * 1000000000))""".stripMargin))
          .withColumn("crit_e6",
            expr(s"$byCritArr[CAST(eff_den - 1 AS INT)]"))
          .withColumn("exceeds",
            when(abs(col("z_e6")) > col("crit_e6"), 1L).otherwise(0L))
          .withColumn("deepest", max(when(col("exceeds") === 1L,
            col("rk")).otherwise(0L)).over(
            Window.orderBy(col("rk").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("reject",
            when(col("rk") <= col("deepest"), 1L).otherwise(0L))
          .selectExpr("n_name AS nation", "z_e6", "rk", "eff_den",
            "crit_e6", "CAST(reject AS BIGINT) AS reject")
      },
      Some(s"""WITH per AS (
             |  SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS k
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1),
             |hm AS (SELECT CAST(sum(1000000000 // i.i) AS BIGINT)
             |                AS cm_e9
             |       FROM (SELECT unnest(generate_series(1,
             |               CAST((SELECT count(*) FROM per) AS INT)))
             |               AS i) i),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |               CAST(sum(k) AS BIGINT) AS kk,
             |               CAST(count(*) AS BIGINT) AS m
             |        FROM per),
             |z AS (SELECT n_name,
             |             CAST(round((CAST(k AS DOUBLE) * CAST(nn AS DOUBLE)
             |                     - CAST(n AS DOUBLE) * CAST(kk AS DOUBLE))
             |                   / sqrt(CAST(n AS DOUBLE)
             |                          * CAST(kk AS DOUBLE)
             |                          * CAST(nn - kk AS DOUBLE))
             |                * CAST('1000000' AS DOUBLE), 0) AS BIGINT)
             |               AS z_e6,
             |             m, cm_e9
             |      FROM per CROSS JOIN tot CROSS JOIN hm),
             |rk AS (SELECT n_name, z_e6, m, cm_e9,
             |              CAST(row_number() OVER (ORDER BY abs(z_e6)
             |                DESC, n_name) AS BIGINT) AS rk
             |       FROM z),
             |lad AS (SELECT n_name, z_e6, rk,
             |               least(96, (m * cm_e9
             |                 + (m - rk + 1) * 1000000000 - 1)
             |                 // ((m - rk + 1) * 1000000000)) AS eff_den
             |        FROM rk),
             |ex AS (SELECT n_name, z_e6, rk, eff_den,
             |              ($byCritList)[CAST(eff_den AS INT)] AS crit_e6,
             |              CASE WHEN abs(z_e6) > ($byCritList)
             |                     [CAST(eff_den AS INT)]
             |                   THEN 1 ELSE 0 END AS exceeds
             |       FROM lad)
             |SELECT n_name AS nation, z_e6, rk,
             |       CAST(eff_den AS BIGINT) AS eff_den,
             |       CAST(crit_e6 AS BIGINT) AS crit_e6,
             |       CAST(CASE WHEN rk <= max(CASE WHEN exceeds = 1
             |               THEN rk ELSE 0 END)
             |               OVER (ORDER BY rk DESC
             |                     ROWS UNBOUNDED PRECEDING)
             |            THEN 1 ELSE 0 END AS BIGINT) AS reject
             |FROM ex""".stripMargin)),
    // ── ABC migration: revenue class (A = top 20% of parts by revenue
    //    rank, B = next 30%, C = rest) in 1996 vs 1997, per-part, and
    //    the 3×3 transition matrix with revenue carried. Classes come
    //    from deterministic revenue-rank cutoffs (rank·5 ≤ n → A,
    //    rank·10 ≤ 5n → B) — pure integer tests on the part axis.
    QueryDef("q_abc_migration",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .filter(expr("year(l_shipdate) IN (1996, 1997)"))
          .groupBy(col("l_partkey"), expr("year(l_shipdate)").as("yr"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)
            .cast("long")).as("r"))
          .localCheckpoint(false) // both year legs rank independently
        def classed(yr: Int) = rev.filter(col("yr") === yr)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("r").desc, col("l_partkey"))).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
          .select(col("l_partkey"), col("r"),
            when(col("rk") * 5 <= col("n"), "A")
              .when(col("rk") * 2 <= col("n"), "B")
              .otherwise("C").as("cls"))
        classed(1996).as("a")
          .join(classed(1997).as("b"), "l_partkey")
          .groupBy(col("a.cls").as("cls_1996"), col("b.cls").as("cls_1997"))
          .agg(count(lit(1)).as("n_parts"),
            sum(col("b.r")).as("rev_1997_cents"))
          .selectExpr("cls_1996", "cls_1997",
            "CAST(n_parts AS BIGINT) AS n_parts",
            "CAST(rev_1997_cents AS BIGINT) AS rev_1997_cents")
      },
      Some("""WITH rev AS (SELECT l_partkey, year(l_shipdate) AS yr,
             |                  CAST(sum(CAST(floor(l_extendedprice * 100
             |                    + 0.5) AS BIGINT)) AS BIGINT) AS r
             |           FROM lineitem
             |           WHERE year(l_shipdate) IN (1996, 1997)
             |           GROUP BY 1, 2),
             |cl AS (SELECT l_partkey, yr, r,
             |              CASE WHEN rk * 5 <= n THEN 'A'
             |                   WHEN rk * 2 <= n THEN 'B'
             |                   ELSE 'C' END AS cls
             |       FROM (SELECT *,
             |               CAST(row_number() OVER (PARTITION BY yr
             |                 ORDER BY r DESC, l_partkey) AS BIGINT) AS rk,
             |               CAST(count(*) OVER (PARTITION BY yr)
             |                 AS BIGINT) AS n
             |             FROM rev))
             |SELECT a.cls AS cls_1996, b.cls AS cls_1997,
             |       CAST(count(*) AS BIGINT) AS n_parts,
             |       CAST(sum(b.r) AS BIGINT) AS rev_1997_cents
             |FROM (SELECT * FROM cl WHERE yr = 1996) a
             |JOIN (SELECT * FROM cl WHERE yr = 1997) b
             |  ON a.l_partkey = b.l_partkey
             |GROUP BY 1, 2""".stripMargin)),

    // ── Process capability: 1996 daily order volume sets the process
    //    (μ₀ ± 3σ₀ spec limits, σ from exact integer moments); 1997 is
    //    graded against them — Cp = (USL−LSL)/6σ₁, Cpk = min(USL−μ₁,
    //    μ₁−LSL)/3σ₁. All moments exact; indices close in identical
    //    IEEE trees, e6-rounded.
    QueryDef("q_cpk_capability",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .filter(expr("year(o_orderdate) IN (1996, 1997)"))
          .groupBy(expr("year(o_orderdate)").as("yr"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
              "div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val m = daily.groupBy(col("yr"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
            sum(expr("c * c")).as("q"))
        val base = m.filter(col("yr") === 1996)
          .select(col("n").as("n0"), col("s").as("s0"), col("q").as("q0"))
        val cur = m.filter(col("yr") === 1997)
          .select(col("n").as("n1"), col("s").as("s1"), col("q").as("q1"))
        cur.crossJoin(broadcast(base))
          .selectExpr("CAST(n0 AS BIGINT) AS n_base",
            "CAST(n1 AS BIGINT) AS n_cur",
            "s0 div n0 AS mu0", "s1 div n1 AS mu1",
            """round(CAST('6.0' AS DOUBLE)
              |* sqrt(CAST(n0 * q0 - s0 * s0 AS DOUBLE))
              |/ CAST(n0 AS DOUBLE)
              |/ (sqrt(CAST(n1 * q1 - s1 * s1 AS DOUBLE))
              |   / CAST(n1 AS DOUBLE)) / CAST('6.0' AS DOUBLE), 6)
              |AS cp""".stripMargin,
            """round(least(
              |  (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
              |   + CAST('3.0' AS DOUBLE)
              |     * sqrt(CAST(n0 * q0 - s0 * s0 AS DOUBLE))
              |     / CAST(n0 AS DOUBLE)
              |   - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)),
              |  (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
              |   - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
              |      - CAST('3.0' AS DOUBLE)
              |        * sqrt(CAST(n0 * q0 - s0 * s0 AS DOUBLE))
              |        / CAST(n0 AS DOUBLE))))
              |/ (CAST('3.0' AS DOUBLE)
              |   * sqrt(CAST(n1 * q1 - s1 * s1 AS DOUBLE))
              |   / CAST(n1 AS DOUBLE)), 6) AS cpk""".stripMargin)
      },
      Some("""WITH daily AS (SELECT year(o_orderdate) AS yr,
             |                    epoch_us(o_orderdate) // 86400000000
             |                      AS day,
             |                    CAST(count(*) AS BIGINT) AS c
             |             FROM orders
             |             WHERE year(o_orderdate) IN (1996, 1997)
             |             GROUP BY 1, 2),
             |m AS (SELECT yr, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(c) AS BIGINT) AS s,
             |             CAST(sum(c * c) AS BIGINT) AS q
             |      FROM daily GROUP BY 1),
             |b AS (SELECT n AS n0, s AS s0, q AS q0 FROM m
             |      WHERE yr = 1996),
             |c AS (SELECT n AS n1, s AS s1, q AS q1 FROM m
             |      WHERE yr = 1997)
             |SELECT n0 AS n_base, n1 AS n_cur,
             |       s0 // n0 AS mu0, s1 // n1 AS mu1,
             |       round(CAST('6.0' AS DOUBLE)
             |       * sqrt(CAST(n0 * q0 - s0 * s0 AS DOUBLE))
             |       / CAST(n0 AS DOUBLE)
             |       / (sqrt(CAST(n1 * q1 - s1 * s1 AS DOUBLE))
             |          / CAST(n1 AS DOUBLE)) / CAST('6.0' AS DOUBLE), 6)
             |         AS cp,
             |       round(least(
             |         (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
             |          + CAST('3.0' AS DOUBLE)
             |            * sqrt(CAST(n0 * q0 - s0 * s0 AS DOUBLE))
             |            / CAST(n0 AS DOUBLE)
             |          - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)),
             |         (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |          - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
             |             - CAST('3.0' AS DOUBLE)
             |               * sqrt(CAST(n0 * q0 - s0 * s0 AS DOUBLE))
             |               / CAST(n0 AS DOUBLE))))
             |       / (CAST('3.0' AS DOUBLE)
             |          * sqrt(CAST(n1 * q1 - s1 * s1 AS DOUBLE))
             |          / CAST(n1 AS DOUBLE)), 6) AS cpk
             |FROM c CROSS JOIN b""".stripMargin))
  )
}
