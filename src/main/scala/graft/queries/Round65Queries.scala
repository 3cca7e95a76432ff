package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Dedup}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-65 batch: bandit regret replay (day-batched greedy vs the best
  * fixed arm — the online-learning diagnostic q_offpolicy_eval's static
  * policies don't show), a delta-encoding storage audit (bits-needed
  * per user timestamp stream — the columnar-encoding advisor next to
  * q_rle_compression), and a differentially-private histogram release
  * (deterministic hash-seeded Laplace noise via the fixed-point log —
  * completing the k-anon/l-div/t-closeness privacy family with the
  * NOISE side).
  */
object Round65Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Bandit replay: per day the greedy arm on prior-day means
    //    (optimistic init for unexplored arms), regret vs the best
    //    fixed arm. All windows ride the bounded day×arm grid.
    QueryDef("q_bandit_regret",
      (s, d) => {
        val ev = Tables.events(s, d).select(
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("event_type").as("arm"),
          greatest(lit(0L),
            floor(col("value") * 100 + 0.5).cast("long")).as("r"))
        val cell = ev.groupBy(col("day"), col("arm"))
          .agg(count(lit(1)).as("cnt"), sum(col("r")).as("s"))
        val grid = cell.select(col("day")).distinct()
          .crossJoin(cell.select(col("arm")).distinct())
          .join(cell, Seq("day", "arm"), "left")
          .select(col("day"), col("arm"),
            coalesce(col("cnt"), lit(0L)).as("cnt"),
            coalesce(col("s"), lit(0L)).as("s"))
        val wPrior = Window.partitionBy(col("arm")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val scored = grid
          .withColumn("ccnt", coalesce(sum(col("cnt")).over(wPrior), lit(0L)))
          .withColumn("cs", coalesce(sum(col("s")).over(wPrior), lit(0L)))
          .withColumn("mu_prior_e6",
            when(col("ccnt") === 0L, lit(1000000000000L))
              .otherwise(expr("cs * 1000000 div ccnt")))
          .withColumn("day_mu_e6", expr("s * 1000000 div greatest(cnt, 1)"))
          .localCheckpoint(false) // reused: chosen pick + best-arm scan
        val chosen = scored
          .withColumn("pk", row_number().over(Window.partitionBy(col("day"))
            .orderBy(col("mu_prior_e6").desc, col("arm"))))
          .where(col("pk") === 1)
          .select(col("day"), col("arm").as("chosen_arm"),
            col("day_mu_e6").as("chosen_mu_e6"))
        val best = scored.groupBy(col("arm"))
          .agg(sum(col("s")).as("ts"), sum(col("cnt")).as("tc"))
          .withColumn("mu_e6", expr("ts * 1000000 div greatest(tc, 1)"))
          .withColumn("bk", row_number().over(
            Window.orderBy(col("mu_e6").desc, col("arm"))))
          .where(col("bk") === 1)
          .select(col("arm").as("best_arm"))
        chosen.crossJoin(broadcast(best))
          .join(scored.select(col("day").as("bd"), col("arm").as("ba"),
            col("day_mu_e6").as("best_mu_e6")),
            col("day") === col("bd") && col("best_arm") === col("ba"))
          .withColumn("regret_e6", col("best_mu_e6") - col("chosen_mu_e6"))
          .withColumn("cum_regret_e6", sum(col("regret_e6")).over(
            Window.orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("day"), col("chosen_arm"), col("chosen_mu_e6"),
            col("best_arm"), col("best_mu_e6"), col("regret_e6"),
            col("cum_regret_e6"))
      },
      Some("""WITH ev AS (
             |  SELECT epoch_us(ts) // 86400000000 AS day,
             |         event_type AS arm,
             |         greatest(0, CAST(floor(value * 100 + 0.5) AS BIGINT))
             |           AS r
             |  FROM events),
             |cell AS (SELECT day, arm, CAST(count(*) AS BIGINT) AS cnt,
             |                CAST(sum(r) AS BIGINT) AS s
             |         FROM ev GROUP BY 1, 2),
             |grid AS (
             |  SELECT d.day, a.arm, coalesce(cnt, 0) AS cnt,
             |         coalesce(s, 0) AS s
             |  FROM (SELECT DISTINCT day FROM cell) d
             |  CROSS JOIN (SELECT DISTINCT arm FROM cell) a
             |  LEFT JOIN cell ON cell.day = d.day AND cell.arm = a.arm),
             |scored AS (
             |  SELECT day, arm, cnt, s,
             |         CASE WHEN coalesce(sum(cnt) OVER w, 0) = 0
             |              THEN 1000000000000
             |              ELSE coalesce(sum(s) OVER w, 0) * 1000000
             |                   // sum(cnt) OVER w END AS mu_prior_e6,
             |         s * 1000000 // greatest(cnt, 1) AS day_mu_e6
             |  FROM grid
             |  WINDOW w AS (PARTITION BY arm ORDER BY day
             |               ROWS BETWEEN UNBOUNDED PRECEDING
             |               AND 1 PRECEDING)),
             |chosen AS (
             |  SELECT day, arm AS chosen_arm, day_mu_e6 AS chosen_mu_e6
             |  FROM (SELECT *, row_number() OVER (PARTITION BY day
             |          ORDER BY mu_prior_e6 DESC, arm) AS pk FROM scored)
             |  WHERE pk = 1),
             |best AS (
             |  SELECT arm AS best_arm FROM (
             |    SELECT arm, row_number() OVER (ORDER BY
             |        CAST(sum(s) AS BIGINT) * 1000000
             |          // greatest(CAST(sum(cnt) AS BIGINT), 1) DESC,
             |        arm) AS bk
             |    FROM scored GROUP BY arm)
             |  WHERE bk = 1),
             |j AS (SELECT c.day, c.chosen_arm, c.chosen_mu_e6, b.best_arm,
             |             sc.day_mu_e6 AS best_mu_e6
             |      FROM chosen c CROSS JOIN best b
             |      JOIN scored sc ON sc.day = c.day AND sc.arm = b.best_arm)
             |SELECT day, chosen_arm, chosen_mu_e6, best_arm, best_mu_e6,
             |       best_mu_e6 - chosen_mu_e6 AS regret_e6,
             |       CAST(sum(best_mu_e6 - chosen_mu_e6) OVER (ORDER BY day
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_regret_e6
             |FROM j""".stripMargin)),

    // ── Delta-encoding audit: per user the timestamp-delta width the
    //    column would need (bits = ⌊log₂ max gap⌋ + 1) vs raw 64-bit.
    QueryDef("q_delta_encoding",
      (s, d) => {
        val t = Tables.events(s, d).select(col("user_id").as("u"),
          expr("unix_micros(ts)").as("t"), col("event_id").as("eid"))
        val w = Window.partitionBy(col("u")).orderBy(col("t"), col("eid"))
        t.withColumn("dt", col("t") - lag(col("t"), 1).over(w))
          .groupBy(col("u"))
          .agg(count(lit(1)).as("n"), max(col("dt")).as("max_dt"),
            sum(col("dt")).as("sum_dt"))
          .where(col("n") > 1)
          .withColumn("avg_dt", expr("sum_dt div (n - 1)"))
          .withColumn("lg", Bm25.log2E6(greatest(col("max_dt"), lit(1L))))
          .selectExpr("u", "n", "max_dt", "avg_dt",
            "lg div 1000000 + 1 AS bits",
            "(lg div 1000000 + 1) * 1000000 div 64 AS ratio_e6")
      },
      Some(s"""WITH t AS (SELECT user_id AS u, epoch_us(ts) AS t,
              |                 event_id AS eid FROM events),
              |dt AS (SELECT u, t - lag(t) OVER (PARTITION BY u
              |                ORDER BY t, eid) AS dt FROM t),
              |g AS (SELECT u, CAST(count(*) AS BIGINT) AS n,
              |             CAST(max(dt) AS BIGINT) AS max_dt,
              |             CAST(sum(dt) AS BIGINT) AS sum_dt
              |      FROM dt GROUP BY 1 HAVING count(*) > 1),
              |b AS (SELECT u, n, max_dt, sum_dt // (n - 1) AS avg_dt,
              |             ${Bm25.log2E6Sql("greatest(max_dt, 1)")}
              |               // 1000000 + 1 AS bits
              |      FROM g)
              |SELECT u, n, max_dt, avg_dt, CAST(bits AS BIGINT) AS bits,
              |       CAST(bits AS BIGINT) * 1000000 // 64 AS ratio_e6
              |FROM b""".stripMargin)),

    // ── DP histogram: per-segment customer counts + hash-seeded
    //    Laplace noise (b = 10, i.e. ε = 0.1 for a count query),
    //    entirely in fixed-point integers.
    QueryDef("q_dp_histogram",
      (s, d) => {
        val ln2e6 = 693147L
        Tables.customer(s, d)
          .groupBy(col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("n_true"))
          .withColumn("u", Dedup.hash48(col("seg"), lit("dp")) % 1000000L)
          .withColumn("c", col("u") - 500000L)
          .withColumn("lgdiff",
            Bm25.log2E6(lit(1000000L)) -
              Bm25.log2E6(greatest(lit(1L),
                lit(1000000L) - abs(col("c")) * 2)))
          .withColumn("ln_e6", expr(s"lgdiff * $ln2e6 div 1000000"))
          .withColumn("noise",
            when(col("c") >= 0, expr("-(10 * ln_e6 div 1000000)"))
              .otherwise(expr("10 * ln_e6 div 1000000")))
          .selectExpr("seg", "n_true", "noise",
            "n_true + noise AS n_noisy", "abs(noise) AS abs_err")
      },
      Some {
        val h = graft.queries.PortableSql.hash48("seg", "'dp'")
        val lg = Bm25.log2E6Sql("1000000")
        val lgc = Bm25.log2E6Sql("greatest(1, 1000000 - abs(c) * 2)")
        s"""WITH g AS (SELECT c_mktsegment AS seg,
           |                 CAST(count(*) AS BIGINT) AS n_true
           |          FROM customer GROUP BY 1),
           |h AS (SELECT seg, n_true, $h % 1000000 - 500000 AS c
           |      FROM g),
           |n AS (SELECT seg, n_true, c,
           |             CAST($lg - $lgc AS BIGINT) * 693147 // 1000000
           |               AS ln_e6
           |      FROM h),
           |z AS (SELECT seg, n_true,
           |             CASE WHEN c >= 0
           |                  THEN -(10 * ln_e6 // 1000000)
           |                  ELSE 10 * ln_e6 // 1000000 END AS noise
           |      FROM n)
           |SELECT seg, n_true, CAST(noise AS BIGINT) AS noise,
           |       CAST(n_true + noise AS BIGINT) AS n_noisy,
           |       CAST(abs(noise) AS BIGINT) AS abs_err
           |FROM z""".stripMargin
      })
  )
}
