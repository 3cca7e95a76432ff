package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Experiment, Stats}
import org.apache.spark.sql.functions._

/** Round-54 batch: Kendall τ-b (the concordance-probability rank
  * correlation the q_spearman family lacks — robust to monotone drift
  * and the standard trend test behind Mann–Kendall), Benjamini–Hochberg
  * FDR step-up with distribution-free Chebyshev p-values (the
  * multiple-testing layer every per-segment test family here —
  * q_welch_ttest, q_ab_test, q_mde — feeds in practice), and
  * first-order partial correlation (the confound-adjusted complement
  * of q_corr_matrix).
  */
object Round54Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Kendall τ-b per nation between monthly order volume and monthly
    //    revenue (cents). The month axis is bounded by the calendar, so
    //    the per-key pair count is scale-invariant.
    QueryDef("q_kendall_tau",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))
        val m = Tables.orders(s, d)
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nk"),
            date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("y"))
        Stats.kendallTauByKey(m, "nk", "mon", "x", "y")
          .withColumnRenamed("k", "nk")
      },
      Some("""WITH m AS (
             |  SELECT CAST(c_nationkey AS BIGINT) AS nk,
             |         strftime(o_orderdate, '%Y-%m') AS mon,
             |         CAST(count(*) AS BIGINT) AS x,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |           AS BIGINT) AS y
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |p AS (SELECT a.nk, a.x, a.y, b.x AS xb, b.y AS yb
             |      FROM m a JOIN m b ON a.nk = b.nk AND a.mon < b.mon),
             |agg AS (
             |  SELECT nk, CAST(count(*) AS BIGINT) AS n0,
             |         CAST(sum(CASE WHEN (x < xb AND y < yb)
             |                         OR (x > xb AND y > yb)
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS conc,
             |         CAST(sum(CASE WHEN (x < xb AND y > yb)
             |                         OR (x > xb AND y < yb)
             |                       THEN 1 ELSE 0 END) AS BIGINT) AS disc,
             |         CAST(sum(CASE WHEN x = xb THEN 1 ELSE 0 END)
             |           AS BIGINT) AS tx,
             |         CAST(sum(CASE WHEN y = yb THEN 1 ELSE 0 END)
             |           AS BIGINT) AS ty
             |  FROM p GROUP BY 1)
             |SELECT nk, n0 AS n_pairs, conc AS concordant,
             |       disc AS discordant,
             |       CASE WHEN n0 - tx = 0 OR n0 - ty = 0 THEN NULL
             |            ELSE round(CAST(conc - disc AS DOUBLE) /
             |                 sqrt(CAST(n0 - tx AS DOUBLE) *
             |                      CAST(n0 - ty AS DOUBLE)), 6)
             |       END AS tau_b
             |FROM agg""".stripMargin)),

    // ── BH FDR over the (mktsegment × nation) grid: is this cell's mean
    //    balance off the global mean? Chebyshev p-bounds → step-up.
    QueryDef("q_bh_fdr",
      (s, d) => Experiment.chebyshevBh(
        Tables.customer(s, d)
          .withColumn("seg", col("c_mktsegment"))
          .withColumn("nk", col("c_nationkey").cast("long"))
          .withColumn("bal", floor(col("c_acctbal") * 100 + 0.5).cast("long")),
        Seq("seg", "nk"), "bal"),
      Some("""WITH t AS (SELECT c_mktsegment AS seg,
             |                  CAST(c_nationkey AS BIGINT) AS nk,
             |                  CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
             |           FROM customer),
             |cells AS (SELECT seg, nk, CAST(count(*) AS HUGEINT) AS ng,
             |                 CAST(sum(v) AS HUGEINT) AS sg
             |          FROM t GROUP BY 1, 2),
             |gl AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |                CAST(sum(v) AS HUGEINT) AS s,
             |                sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS q
             |         FROM t),
             |scored AS (
             |  SELECT seg, nk, CAST(ng AS BIGINT) AS n_g,
             |         CASE WHEN n * sg - ng * s = 0 THEN CAST(1.0 AS DOUBLE)
             |              ELSE least(CAST(1.0 AS DOUBLE),
             |                CAST(n * q - s * s AS DOUBLE)
             |                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
             |                / (CAST(ng AS DOUBLE)
             |                   * (CAST(n * sg - ng * s AS DOUBLE)
             |                      / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE)))
             |                   * (CAST(n * sg - ng * s AS DOUBLE)
             |                      / (CAST(ng AS DOUBLE) * CAST(n AS DOUBLE)))))
             |         END AS p_raw
             |  FROM cells CROSS JOIN gl),
             |ranked AS (
             |  SELECT seg, nk, n_g, p_raw,
             |         CAST(row_number() OVER (ORDER BY p_raw, seg, nk)
             |           AS BIGINT) AS k_rank,
             |         CAST(count(*) OVER () AS BIGINT) AS m
             |  FROM scored),
             |flagged AS (
             |  SELECT *, CASE WHEN p_raw <= CAST(k_rank AS DOUBLE) * 0.05
             |                               / CAST(m AS DOUBLE)
             |                 THEN k_rank END AS ok_k
             |  FROM ranked)
             |SELECT seg, nk, n_g, round(p_raw, 6) AS p, k_rank,
             |       k_rank <= coalesce(max(ok_k) OVER (), CAST(0 AS BIGINT))
             |         AS rejected
             |FROM flagged""".stripMargin)),

    // ── Partial correlation of per-order quantity vs revenue controlling
    //    for line count (does qty↔revenue survive removing "more lines"?).
    QueryDef("q_partial_corr",
      (s, d) => Stats.partialCorr(
        Tables.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("x"),
            sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("y"),
            count(lit(1)).as("z")),
        "x", "y", "z"),
      Some {
        def r(a: String, b: String) =
          s"""CASE WHEN n * q_$a - s_$a * s_$a = 0
             |       OR n * q_$b - s_$b * s_$b = 0 THEN NULL
             |     ELSE CAST(n * x_${a}_$b - s_$a * s_$b AS DOUBLE) /
             |          sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE) *
             |               CAST(n * q_$b - s_$b * s_$b AS DOUBLE))
             |END""".stripMargin
        s"""WITH per AS (
           |  SELECT CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
           |           AS HUGEINT) AS x,
           |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
           |           AS HUGEINT) AS y,
           |         CAST(count(*) AS HUGEINT) AS z
           |  FROM lineitem GROUP BY l_orderkey),
           |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |               sum(x) AS s_x, sum(y) AS s_y, sum(z) AS s_z,
           |               sum(x * x) AS q_x, sum(y * y) AS q_y,
           |               sum(z * z) AS q_z,
           |               sum(x * y) AS x_x_y, sum(x * z) AS x_x_z,
           |               sum(y * z) AS x_y_z
           |        FROM per),
           |rs AS (SELECT CAST(n AS BIGINT) AS n, ${r("x", "y")} AS rxy,
           |              ${r("x", "z")} AS rxz, ${r("y", "z")} AS ryz
           |       FROM mom)
           |SELECT n, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
           |       round(ryz, 6) AS r_yz,
           |       CASE WHEN rxy IS NULL OR rxz IS NULL OR ryz IS NULL
           |              OR (1 - rxz * rxz) * (1 - ryz * ryz) <= 0 THEN NULL
           |            ELSE round((rxy - rxz * ryz) /
           |                 sqrt((1 - rxz * rxz) * (1 - ryz * ryz)), 6)
           |       END AS r_partial
           |FROM rs""".stripMargin
      })
  )
}
