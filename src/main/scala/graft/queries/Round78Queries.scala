package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-78 batch: subgroup discovery by exact WRAcc (which
  * segment×nation cells over-concentrate high spenders — the
  * explainable slice-finding q_decision_stump's single split can't
  * enumerate), split-conformal prediction intervals (distribution-free
  * coverage guarantees over a mean predictor — the uncertainty layer
  * q_bootstrap_ci approximates by resampling), and rate–volume
  * decomposition of year-over-year revenue (the BI bridge: how much of
  * Δrevenue is more orders vs bigger orders).
  */
object Round78Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── WRAcc subgroups: target = top-quartile spender; score ranked
    //    by the exact integer numerator pos_sg·n − n_sg·pos.
    QueryDef("q_subgroup_discovery",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("spend"))
        // Checkpoint u once — the threshold, the totals, and the cell
        // rollup all reuse it (previously the orders aggregate + join
        // ran twice and the threshold was a GLOBAL single-partition
        // row_number window; the stage fan-out made this query the
        // registry's worst contention amplifier, 0.83 s quiet -> 7.6 s
        // loaded).
        val u = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_mktsegment").as("seg"),
            col("c_nationkey").cast("long").as("nk"),
            col("c_custkey").as("ck"),
            coalesce(col("spend"), lit(0L)).as("y"))
          .localCheckpoint(false)
        // Top-quartile threshold = y of the rank-k row under
        // (y desc, ck asc), k = (n+3) div 4 — found by per-partition
        // top-k (TakeOrderedAndProject) + a one-row argmin over the k
        // survivors instead of sorting every row through one partition.
        val k = ((u.count() + 3) / 4).toInt
        val thr = u.select(col("y"), col("ck"))
          .orderBy(col("y").desc, col("ck")).limit(k)
          .agg(min(struct(col("y"), (-col("ck")).as("nck"))).as("m"))
          .select(col("m.y").as("thr"))
          .where(col("thr").isNotNull) // empty input -> empty, like rank

        val lab = u.crossJoin(broadcast(thr))
          .withColumn("pos", when(col("y") >= col("thr"), 1L).otherwise(0L))
        val tot = lab.agg(count(lit(1)).as("n"), sum(col("pos")).as("p"))
        lab.groupBy(col("seg"), col("nk"))
          .agg(count(lit(1)).as("n_sg"), sum(col("pos")).as("pos_sg"))
          .crossJoin(broadcast(tot))
          .withColumn("wracc_num", expr("pos_sg * n - n_sg * p"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("wracc_num").desc, col("seg"), col("nk"))))
          .where(col("rk") <= 10)
          .selectExpr("seg", "nk", "n_sg", "pos_sg", "wracc_num", "rk")
      },
      Some("""WITH spend AS (SELECT o_custkey,
             |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |                   AS BIGINT)) AS BIGINT) AS spend
             |               FROM orders GROUP BY 1),
             |u AS (SELECT c_mktsegment AS seg,
             |             CAST(c_nationkey AS BIGINT) AS nk,
             |             c_custkey AS ck, coalesce(spend, 0) AS y
             |      FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
             |thr AS (SELECT y AS thr FROM (
             |          SELECT y, row_number() OVER (ORDER BY y DESC, ck)
             |                   AS rn,
             |                 count(*) OVER () AS n
             |          FROM u) WHERE rn = (n + 3) // 4),
             |lab AS (SELECT seg, nk,
             |               CASE WHEN y >= thr THEN 1 ELSE 0 END AS pos
             |        FROM u CROSS JOIN thr),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(pos) AS BIGINT) AS p FROM lab),
             |cells AS (SELECT seg, nk, CAST(count(*) AS BIGINT) AS n_sg,
             |                 CAST(sum(pos) AS BIGINT) AS pos_sg
             |          FROM lab GROUP BY 1, 2)
             |SELECT seg, nk, n_sg, pos_sg, wracc_num, rk FROM (
             |  SELECT seg, nk, n_sg, pos_sg,
             |         pos_sg * n - n_sg * p AS wracc_num,
             |         row_number() OVER (ORDER BY pos_sg * n - n_sg * p
             |           DESC, seg, nk) AS rk
             |  FROM cells CROSS JOIN tot)
             |WHERE rk <= 10""".stripMargin)),

    // ── Split conformal: fit (ck%4=0) segment means, calibrate
    //    (ck%4=1) the 90% residual quantile, test (ck%4=3) coverage.
    QueryDef("q_conformal",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("spend"))
        val u = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_mktsegment").as("seg"), col("c_custkey").as("ck"),
            coalesce(col("spend"), lit(0L)).as("y"))
          .localCheckpoint(false) // fit/calibration/test splits
        val fit = u.where(col("ck") % 4 === 0).groupBy(col("seg"))
          .agg(expr("sum(y) div count(1)").as("yhat"))
        val cal = u.where(col("ck") % 4 === 1).join(broadcast(fit), "seg")
          .select(col("seg"), col("ck"), abs(col("y") - col("yhat")).as("res"))
        val qhat = cal
          .withColumn("rn", row_number().over(
            Window.orderBy(col("res"), col("ck"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
          .where(col("rn") === expr("least(n, (9 * (n + 1) + 9) div 10)"))
          .select(col("n").as("n_cal"), col("res").as("qhat_cents"))
        u.where(col("ck") % 4 === 3).join(broadcast(fit), "seg")
          .crossJoin(broadcast(qhat))
          .agg(max(col("n_cal")).as("n_cal"),
            max(col("qhat_cents")).as("qhat_cents"),
            count(lit(1)).as("n_test"),
            sum(when(abs(col("y") - col("yhat")) <= col("qhat_cents"), 1L)
              .otherwise(0L)).as("n_covered"))
          .withColumn("coverage_e6", expr("n_covered * 1000000 div n_test"))
      },
      Some("""WITH spend AS (SELECT o_custkey,
             |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |                   AS BIGINT)) AS BIGINT) AS spend
             |               FROM orders GROUP BY 1),
             |u AS (SELECT c_mktsegment AS seg, c_custkey AS ck,
             |             coalesce(spend, 0) AS y
             |      FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
             |fit AS (SELECT seg, CAST(sum(y) // count(*) AS BIGINT) AS yhat
             |        FROM u WHERE ck % 4 = 0 GROUP BY 1),
             |cal AS (SELECT u.seg, ck, abs(y - yhat) AS res
             |        FROM u JOIN fit ON u.seg = fit.seg WHERE ck % 4 = 1),
             |qhat AS (SELECT n AS n_cal, res AS qhat_cents FROM (
             |           SELECT res, row_number() OVER (ORDER BY res, ck)
             |                    AS rn,
             |                  CAST(count(*) OVER () AS BIGINT) AS n
             |           FROM cal)
             |         WHERE rn = least(n, (9 * (n + 1) + 9) // 10)),
             |test AS (SELECT abs(y - yhat) AS res
             |         FROM u JOIN fit ON u.seg = fit.seg WHERE ck % 4 = 3)
             |SELECT max(n_cal) AS n_cal, max(qhat_cents) AS qhat_cents,
             |       CAST(count(*) AS BIGINT) AS n_test,
             |       CAST(sum(CASE WHEN res <= qhat_cents THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_covered,
             |       CAST(sum(CASE WHEN res <= qhat_cents THEN 1 ELSE 0 END)
             |         AS BIGINT) * 1000000 // count(*) AS coverage_e6
             |FROM test CROSS JOIN qhat""".stripMargin)),

    // ── Rate–volume bridge: 1996 → 1997 revenue per segment split into
    //    volume effect (Δn at old rate) + rate effect (new n at Δrate).
    QueryDef("q_rate_volume_decomp",
      (s, d) => {
        val o = Tables.orders(s, d)
          .join(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment").as("seg")),
            col("o_custkey") === col("c_custkey"))
          .select(col("seg"), expr("year(o_orderdate)").as("yr"),
            floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
          .where(col("yr").isin(1996, 1997))
        val m = o.groupBy(col("seg"), col("yr"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev"))
        val a = m.where(col("yr") === 1996)
          .select(col("seg"), col("n").as("n_a"), col("rev").as("rev_a"))
        val b = m.where(col("yr") === 1997)
          .select(col("seg"), col("n").as("n_b"), col("rev").as("rev_b"))
        a.join(b, "seg")
          .selectExpr("seg", "n_a", "n_b", "rev_a", "rev_b",
            "rev_b - rev_a AS delta_rev",
            // sign-factored truncating e6 so the decomposition is an
            // exact integer identity: volume + rate = delta_rev * 1e6
            """CAST(CASE WHEN n_b >= n_a
              |     THEN CAST(n_b - n_a AS DECIMAL(38,0))
              |          * CAST(rev_a AS DECIMAL(38,0)) * 1000000
              |          div CAST(n_a AS DECIMAL(38,0))
              |     ELSE -(CAST(n_a - n_b AS DECIMAL(38,0))
              |          * CAST(rev_a AS DECIMAL(38,0)) * 1000000
              |          div CAST(n_a AS DECIMAL(38,0)))
              |END AS BIGINT) AS volume_e6""".stripMargin)
          .withColumn("rate_e6",
            expr("(rev_b - rev_a) * 1000000 - volume_e6"))
      },
      Some("""WITH o AS (
             |  SELECT c_mktsegment AS seg, year(o_orderdate) AS yr,
             |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           AS cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  WHERE year(o_orderdate) IN (1996, 1997)),
             |m AS (SELECT seg, yr, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(cents) AS BIGINT) AS rev
             |      FROM o GROUP BY 1, 2),
             |j AS (SELECT a.seg, a.n AS n_a, b.n AS n_b, a.rev AS rev_a,
             |             b.rev AS rev_b
             |      FROM (SELECT * FROM m WHERE yr = 1996) a
             |      JOIN (SELECT * FROM m WHERE yr = 1997) b
             |        ON a.seg = b.seg),
             |v AS (SELECT *, rev_b - rev_a AS delta_rev,
             |             CAST(CASE WHEN n_b >= n_a
             |                  THEN CAST(n_b - n_a AS HUGEINT)
             |                       * CAST(rev_a AS HUGEINT) * 1000000
             |                       // CAST(n_a AS HUGEINT)
             |                  ELSE -(CAST(n_a - n_b AS HUGEINT)
             |                       * CAST(rev_a AS HUGEINT) * 1000000
             |                       // CAST(n_a AS HUGEINT))
             |             END AS BIGINT) AS volume_e6
             |      FROM j)
             |SELECT seg, n_a, n_b, rev_a, rev_b, delta_rev, volume_e6,
             |       (rev_b - rev_a) * 1000000 - volume_e6 AS rate_e6
             |FROM v"""
        .stripMargin))
  )
}
