package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-77 batch, completing the causal-inference family: the Wald IV
  * estimator (instrument → endogenous treatment, the confound-proof
  * ratio q_stratified_ate can't give when strata miss the confounder),
  * regression discontinuity at the zero-balance cutoff (naive and
  * local-linear-intercept effects), and a deterministic permutation
  * test (20 hash-seeded placebo splits rank the real effect — finite-
  * sample inference with no distributional assumption at all).
  */
object Round77Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Wald IV: z = every 5th customer; treatment x = z OR rich;
    //    β = (Σy₁n₀ − Σy₀n₁)/(Σx₁n₀ − Σx₀n₁) — the n₁n₀ cancels.
    QueryDef("q_iv_wald",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("spend"))
        val u = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select((col("c_custkey") % 5 === 0).as("z"),
            (col("c_custkey") % 5 === 0 ||
              floor(col("c_acctbal") * 100 + 0.5) > 500000).as("x"),
            coalesce(col("spend"), lit(0L)).as("y"))
        u.agg(
            sum(when(col("z"), 1L).otherwise(0L)).cast(dec).as("n1"),
            sum(when(!col("z"), 1L).otherwise(0L)).cast(dec).as("n0"),
            sum(when(col("z"), col("y")).otherwise(0L)).cast(dec).as("sy1"),
            sum(when(!col("z"), col("y")).otherwise(0L)).cast(dec).as("sy0"),
            sum(when(col("z") && col("x"), 1L).otherwise(0L)).cast(dec)
              .as("sx1"),
            sum(when(!col("z") && col("x"), 1L).otherwise(0L)).cast(dec)
              .as("sx0"))
          .selectExpr("CAST(n1 AS BIGINT) AS n1", "CAST(n0 AS BIGINT) AS n0",
            """round(CAST(sy1 * n0 - sy0 * n1 AS DOUBLE)
              |/ (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
              |AS itt_cents""".stripMargin,
            """round(CAST(sx1 * n0 - sx0 * n1 AS DOUBLE)
              |/ (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
              |AS first_stage""".stripMargin,
            """CASE WHEN sx1 * n0 - sx0 * n1 = 0 THEN NULL
              |     ELSE round(CAST(sy1 * n0 - sy0 * n1 AS DOUBLE)
              |          / CAST(sx1 * n0 - sx0 * n1 AS DOUBLE), 6)
              |END AS beta_wald""".stripMargin)
      },
      Some("""WITH spend AS (SELECT o_custkey,
             |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |                   AS BIGINT)) AS BIGINT) AS spend
             |               FROM orders GROUP BY 1),
             |u AS (SELECT c_custkey % 5 = 0 AS z,
             |             c_custkey % 5 = 0
             |               OR floor(c_acctbal * 100 + 0.5) > 500000 AS x,
             |             coalesce(spend, 0) AS y
             |      FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
             |m AS (SELECT
             |        CAST(sum(CASE WHEN z THEN 1 ELSE 0 END) AS HUGEINT)
             |          AS n1,
             |        CAST(sum(CASE WHEN z THEN 0 ELSE 1 END) AS HUGEINT)
             |          AS n0,
             |        CAST(sum(CASE WHEN z THEN y ELSE 0 END) AS HUGEINT)
             |          AS sy1,
             |        CAST(sum(CASE WHEN z THEN 0 ELSE y END) AS HUGEINT)
             |          AS sy0,
             |        CAST(sum(CASE WHEN z AND x THEN 1 ELSE 0 END)
             |          AS HUGEINT) AS sx1,
             |        CAST(sum(CASE WHEN NOT z AND x THEN 1 ELSE 0 END)
             |          AS HUGEINT) AS sx0
             |      FROM u)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
             |       round(CAST(sy1 * n0 - sy0 * n1 AS DOUBLE)
             |         / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
             |         AS itt_cents,
             |       round(CAST(sx1 * n0 - sx0 * n1 AS DOUBLE)
             |         / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
             |         AS first_stage,
             |       CASE WHEN sx1 * n0 - sx0 * n1 = 0 THEN NULL
             |            ELSE round(CAST(sy1 * n0 - sy0 * n1 AS DOUBLE)
             |                 / CAST(sx1 * n0 - sx0 * n1 AS DOUBLE), 6)
             |       END AS beta_wald
             |FROM m""".stripMargin)),

    // ── RD at balance 0, bandwidth ±2000$: naive mean gap and the
    //    local-linear intercept gap (exact moments, double close).
    QueryDef("q_reg_discontinuity",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("spend"))
        val u = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(floor(col("c_acctbal") * 100 + 0.5).cast("long").as("r"),
            coalesce(col("spend"), lit(0L)).as("y"))
          .where(col("r") >= -200000L && col("r") < 200000L)
          .withColumn("side", when(col("r") >= 0, 1L).otherwise(0L))
        val m = u.groupBy(col("side"))
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(col("r").cast(dec)).as("sx"),
            sum(col("y").cast(dec)).as("sy"),
            sum(col("r").cast(dec) * col("r").cast(dec)).as("sxx"),
            sum(col("r").cast(dec) * col("y").cast(dec)).as("sxy"))
          .withColumn("mean_y", expr(
            "CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"))
          .withColumn("icpt", expr(
            """CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              |     ELSE (CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
              |           - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
              |          / CAST(n * sxx - sx * sx AS DOUBLE)
              |END""".stripMargin))
        val l = m.where(col("side") === 0).selectExpr("CAST(n AS BIGINT) AS n_l",
          "mean_y AS my_l", "icpt AS ic_l")
        val r = m.where(col("side") === 1).selectExpr("CAST(n AS BIGINT) AS n_r",
          "mean_y AS my_r", "icpt AS ic_r")
        l.crossJoin(r).selectExpr("n_l", "n_r",
          "round(my_r - my_l, 6) AS naive_diff",
          "round(ic_r - ic_l, 6) AS rd_effect")
      },
      Some("""WITH spend AS (SELECT o_custkey,
             |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |                   AS BIGINT)) AS BIGINT) AS spend
             |               FROM orders GROUP BY 1),
             |u AS (SELECT CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS r,
             |             coalesce(spend, 0) AS y,
             |             CASE WHEN floor(c_acctbal * 100 + 0.5) >= 0
             |                  THEN 1 ELSE 0 END AS side
             |      FROM customer LEFT JOIN spend ON c_custkey = o_custkey
             |      WHERE floor(c_acctbal * 100 + 0.5) >= -200000
             |        AND floor(c_acctbal * 100 + 0.5) < 200000),
             |m AS (SELECT side, CAST(count(*) AS HUGEINT) AS n,
             |             CAST(sum(r) AS HUGEINT) AS sx,
             |             CAST(sum(y) AS HUGEINT) AS sy,
             |             sum(CAST(r AS HUGEINT) * CAST(r AS HUGEINT))
             |               AS sxx,
             |             sum(CAST(r AS HUGEINT) * CAST(y AS HUGEINT))
             |               AS sxy
             |      FROM u GROUP BY 1),
             |e AS (SELECT side, n,
             |             CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
             |             CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |                  ELSE (CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
             |                        - CAST(sx AS DOUBLE)
             |                          * CAST(sxy AS DOUBLE))
             |                       / CAST(n * sxx - sx * sx AS DOUBLE)
             |             END AS icpt
             |      FROM m)
             |SELECT l.n_l, r.n_r, round(r.my_r - l.my_l, 6) AS naive_diff,
             |       round(r.ic_r - l.ic_l, 6) AS rd_effect
             |FROM (SELECT CAST(n AS BIGINT) AS n_l, mean_y AS my_l,
             |             icpt AS ic_l FROM e WHERE side = 0) l
             |CROSS JOIN (SELECT CAST(n AS BIGINT) AS n_r, mean_y AS my_r,
             |             icpt AS ic_r FROM e WHERE side = 1) r"""
        .stripMargin)),

    // ── Permutation test: the k=0 real split vs 20 hash placebos;
    //    p = (1 + #{|placebo| ≥ |real|}) / 21 in e6.
    QueryDef("q_permutation_test",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("spend"))
        val u = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey").as("ck"),
            coalesce(col("spend"), lit(0L)).as("y"))
        val splits = u.withColumn("k", explode(expr("sequence(0, 20)")))
          .withColumn("t",
            when(col("k") === 0, col("ck") % 3 === 0)
              .otherwise(Dedup.hash48(
                concat(col("ck").cast("string"), lit("#"),
                  col("k").cast("string")), lit("perm")) % 2 === 0))
        val eff = splits.groupBy(col("k"))
          .agg(sum(when(col("t"), 1L).otherwise(0L)).cast(dec).as("nt"),
            sum(when(!col("t"), 1L).otherwise(0L)).cast(dec).as("nc"),
            sum(when(col("t"), col("y")).otherwise(0L)).cast(dec).as("st"),
            sum(when(!col("t"), col("y")).otherwise(0L)).cast(dec).as("sc"))
          .selectExpr("k", "CAST(nt AS BIGINT) AS n_t",
            "CAST(nc AS BIGINT) AS n_c",
            """CAST(st * nc - sc * nt AS DOUBLE)
              |/ (CAST(nt AS DOUBLE) * CAST(nc AS DOUBLE)) AS diff0"""
              .stripMargin)
        eff
          .withColumn("real_abs", abs(max(when(col("k") === 0,
            col("diff0"))).over(Window.partitionBy())))
          .withColumn("p_e6", expr(
            """(1 + sum(CASE WHEN k > 0 AND abs(diff0) >= real_abs
              |THEN 1 ELSE 0 END) OVER ()) * 1000000 div 21"""
              .stripMargin))
          .selectExpr("k", "n_t", "n_c", "round(diff0, 6) AS diff_cents",
            "k = 0 AS is_real", "p_e6")
      },
      Some {
        val h = PortableSql.hash48(
          "concat(CAST(ck AS VARCHAR), '#', CAST(k AS VARCHAR))", "'perm'")
        s"""WITH spend AS (SELECT o_custkey,
           |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
           |                   AS BIGINT)) AS BIGINT) AS spend
           |               FROM orders GROUP BY 1),
           |u AS (SELECT c_custkey AS ck, coalesce(spend, 0) AS y
           |      FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
           |splits AS (
           |  SELECT ck, y, k,
           |         CASE WHEN k = 0 THEN ck % 3 = 0
           |              ELSE $h % 2 = 0 END AS t
           |  FROM u CROSS JOIN (SELECT range AS k FROM range(0, 21)) kk),
           |eff AS (SELECT k,
           |               CAST(sum(CASE WHEN t THEN 1 ELSE 0 END)
           |                 AS HUGEINT) AS nt,
           |               CAST(sum(CASE WHEN t THEN 0 ELSE 1 END)
           |                 AS HUGEINT) AS nc,
           |               CAST(sum(CASE WHEN t THEN y ELSE 0 END)
           |                 AS HUGEINT) AS st,
           |               CAST(sum(CASE WHEN t THEN 0 ELSE y END)
           |                 AS HUGEINT) AS sc
           |        FROM splits GROUP BY 1),
           |d AS (SELECT CAST(k AS BIGINT) AS k, CAST(nt AS BIGINT) AS n_t,
           |             CAST(nc AS BIGINT) AS n_c,
           |             CAST(st * nc - sc * nt AS DOUBLE)
           |               / (CAST(nt AS DOUBLE) * CAST(nc AS DOUBLE))
           |               AS diff0
           |      FROM eff),
           |w AS (SELECT *, abs(max(CASE WHEN k = 0 THEN diff0 END)
           |               OVER ()) AS real_abs
           |      FROM d)
           |SELECT k, n_t, n_c, round(diff0, 6) AS diff_cents,
           |       k = 0 AS is_real,
           |       CAST((1 + sum(CASE WHEN k > 0 AND abs(diff0) >= real_abs
           |                THEN 1 ELSE 0 END) OVER ()) * 1000000 // 21
           |         AS BIGINT) AS p_e6
           |FROM w""".stripMargin
      })
  )
}
