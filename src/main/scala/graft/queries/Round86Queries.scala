package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-86 batch: lognormal fit of customer spend (fixed-point log
  * moments per segment, implied median vs the positional one — a
  * direct model-adequacy readout), Gumbel block maxima (monthly peaks
  * + method-of-moments location/scale, the extreme-value sizing
  * q_var_es's empirical tail cannot extrapolate), and leave-one-group-
  * out jackknife (how much each nation swings the global mean — the
  * influence audit behind q_bootstrap_ci's resampling).
  */
object Round86Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Lognormal fit: μ̂, σ̂ of ln(spend) per segment via e6 log₂
    //    moments; implied median e^μ̂ = 2^(μ̂/ln2) reported in log units
    //    beside the exact positional median (both engines identical).
    QueryDef("q_lognormal_fit",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("y"))
        val u = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_mktsegment").as("seg"), col("c_custkey").as("ck"),
            col("y")).where(col("y") > 0)
          .withColumn("lg", Bm25.log2E6(col("y")))
          .localCheckpoint(false) // moments + positional median
        val mom = u.groupBy(col("seg"))
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(col("lg").cast(dec)).as("sl"),
            sum(col("lg").cast(dec) * col("lg").cast(dec)).as("ql"))
          .selectExpr("seg", "CAST(n AS BIGINT) AS n",
            // μ̂, σ̂ in e6 log₂ units (ln = ·ln2)
            "CAST(sl div n AS BIGINT) AS mu_lg_e6",
            """round(sqrt(CAST(n * ql - sl * sl AS DOUBLE))
              |/ CAST(n AS DOUBLE), 6) AS sigma_lg_e6""".stripMargin)
        val med = u
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("seg")).orderBy(col("y"), col("ck"))))
          .withColumn("nn", count(lit(1)).over(
            Window.partitionBy(col("seg"))))
          .where(col("rn") === expr("(nn + 1) div 2"))
          .select(col("seg"), col("y").as("median_cents"),
            col("lg").as("median_lg_e6"))
        mom.join(med, "seg")
          .withColumn("fit_gap_e6", col("mu_lg_e6") - col("median_lg_e6"))
      },
      Some {
        val lg = Bm25.log2E6Sql("y")
        s"""WITH spend AS (SELECT o_custkey,
           |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
           |                   AS BIGINT)) AS BIGINT) AS y
           |               FROM orders GROUP BY 1),
           |u AS (SELECT c_mktsegment AS seg, c_custkey AS ck, y,
           |             CAST($lg AS BIGINT) AS lg
           |      FROM customer JOIN spend ON c_custkey = o_custkey
           |      WHERE y > 0),
           |mom AS (SELECT seg, CAST(count(*) AS HUGEINT) AS n,
           |               CAST(sum(lg) AS HUGEINT) AS sl,
           |               sum(CAST(lg AS HUGEINT) * CAST(lg AS HUGEINT))
           |                 AS ql
           |        FROM u GROUP BY 1),
           |mm AS (SELECT seg, CAST(n AS BIGINT) AS n,
           |              CAST(sl // n AS BIGINT) AS mu_lg_e6,
           |              round(sqrt(CAST(n * ql - sl * sl AS DOUBLE))
           |                / CAST(n AS DOUBLE), 6) AS sigma_lg_e6
           |       FROM mom),
           |med AS (SELECT seg, y AS median_cents, lg AS median_lg_e6
           |        FROM (SELECT seg, y, lg, row_number() OVER
           |                (PARTITION BY seg ORDER BY y, ck) AS rn,
           |                count(*) OVER (PARTITION BY seg) AS nn
           |              FROM u)
           |        WHERE rn = (nn + 1) // 2)
           |SELECT mm.seg, n, mu_lg_e6, sigma_lg_e6, median_cents,
           |       median_lg_e6, mu_lg_e6 - median_lg_e6 AS fit_gap_e6
           |FROM mm JOIN med ON mm.seg = med.seg""".stripMargin
      }),

    // ── Gumbel block maxima: monthly max of daily volume; MoM fit
    //    β̂ = s√6/π, μ̂ = m − γβ̂ with γ, √6/π as literal constants.
    QueryDef("q_block_maxima",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
        val blocks = daily
          .withColumn("m", expr("day div 30"))
          .groupBy(col("m")).agg(max(col("c")).as("mx"))
        blocks.agg(count(lit(1)).cast(dec).as("n"),
            sum(col("mx").cast(dec)).as("s"),
            sum(col("mx").cast(dec) * col("mx").cast(dec)).as("q"))
          .selectExpr("CAST(n AS BIGINT) AS n_blocks",
            "CAST(s div n AS BIGINT) AS mean_max",
            """round(sqrt(CAST(n * q - s * s AS DOUBLE))
              |/ CAST(n AS DOUBLE)
              |* CAST('0.7796968' AS DOUBLE), 6) AS beta_hat""".stripMargin,
            """round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
              |- CAST('0.5772157' AS DOUBLE)
              |* (sqrt(CAST(n * q - s * s AS DOUBLE))
              |   / CAST(n AS DOUBLE)
              |   * CAST('0.7796968' AS DOUBLE)), 6) AS mu_hat"""
              .stripMargin)
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM events GROUP BY 1),
             |blocks AS (SELECT day // 30 AS m, CAST(max(c) AS BIGINT) AS mx
             |           FROM daily GROUP BY 1),
             |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |               CAST(sum(mx) AS HUGEINT) AS s,
             |               sum(CAST(mx AS HUGEINT) * CAST(mx AS HUGEINT))
             |                 AS q
             |        FROM blocks)
             |SELECT CAST(n AS BIGINT) AS n_blocks,
             |       CAST(s // n AS BIGINT) AS mean_max,
             |       round(sqrt(CAST(n * q - s * s AS DOUBLE))
             |         / CAST(n AS DOUBLE)
             |         * CAST('0.7796968' AS DOUBLE), 6) AS beta_hat,
             |       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
             |         - CAST('0.5772157' AS DOUBLE)
             |         * (sqrt(CAST(n * q - s * s AS DOUBLE))
             |            / CAST(n AS DOUBLE)
             |            * CAST('0.7796968' AS DOUBLE)), 6) AS mu_hat
             |FROM mom""".stripMargin)),

    // ── Jackknife: the global mean spend recomputed with each nation
    //    deleted — exact integer pseudo-means, influence ranking.
    QueryDef("q_jackknife_groups",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("y"))
        val g = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nk"))
          .agg(count(lit(1)).as("ng"), sum(col("y")).as("sg"))
        val tot = g.agg(sum(col("ng")).as("n"), sum(col("sg")).as("s"))
        g.crossJoin(broadcast(tot))
          .selectExpr("nk", "ng", "s div n AS mean_all_cents",
            "(s - sg) div (n - ng) AS mean_wo_cents",
            "(s - sg) div (n - ng) - s div n AS influence_cents")
      },
      Some("""WITH spend AS (SELECT o_custkey,
             |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |                   AS BIGINT)) AS BIGINT) AS y
             |               FROM orders GROUP BY 1),
             |g AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
             |             CAST(count(*) AS BIGINT) AS ng,
             |             CAST(sum(y) AS BIGINT) AS sg
             |      FROM customer JOIN spend ON c_custkey = o_custkey
             |      GROUP BY 1),
             |tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
             |               CAST(sum(sg) AS BIGINT) AS s FROM g)
             |SELECT nk, ng, s // n AS mean_all_cents,
             |       (s - sg) // (n - ng) AS mean_wo_cents,
             |       (s - sg) // (n - ng) - s // n AS influence_cents
             |FROM g CROSS JOIN tot""".stripMargin))
  )
}
