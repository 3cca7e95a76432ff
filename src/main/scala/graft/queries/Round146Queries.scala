package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-146 batch: experimentation designs beyond the user-split
  * A/B — switchback analysis (hour-parity treatment slices with
  * boundary-hour exclusion, the marketplace-interference design),
  * trigger dilution (intent-to-treat vs triggered-population effect —
  * how much signal assignment-level analysis throws away), and
  * novelty decay (treatment effect by weeks-since-first-exposure —
  * does the lift survive). Assignments are deterministic functions of
  * ids/hours, outcomes are exact integer cents/counts, and every
  * effect is a cross-multiplied e6 — no randomness, no doubles.
  */
object Round146Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Switchback: treatment = odd hour index; boundary minutes
    //    (first/last 10 of each hour) excluded to blunt carryover.
    //    Effect = purchase-rate difference, e6, plus both arms' rates.
    QueryDef("q_switchback",
      (s, d) => {
        Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("hr"),
            expr("(unix_micros(ts) div 60000000) % 60").as("minute"),
            (col("event_type") === "purchase").as("conv"))
          .filter(col("minute") >= 10 && col("minute") < 50)
          .select((col("hr") % 2 === 1).as("treated"), col("conv"))
          .agg(
            sum(when(col("treated"), 1L).otherwise(0L)).as("n_t"),
            sum(when(col("treated") && col("conv"), 1L).otherwise(0L))
              .as("c_t"),
            sum(when(!col("treated"), 1L).otherwise(0L)).as("n_c"),
            sum(when(!col("treated") && col("conv"), 1L).otherwise(0L))
              .as("c_c"))
          .selectExpr("CAST(n_t AS BIGINT) AS n_t",
            "CAST(n_c AS BIGINT) AS n_c",
            "c_t * 1000000 div n_t AS rate_t_e6",
            "c_c * 1000000 div n_c AS rate_c_e6",
            """CASE WHEN c_t * n_c >= c_c * n_t
              |  THEN (c_t * n_c - c_c * n_t) * 1000000
              |       div (n_t * n_c)
              |  ELSE -((c_c * n_t - c_t * n_c) * 1000000
              |       div (n_t * n_c))
              |END AS effect_e6""".stripMargin)
      },
      Some("""WITH e AS (
             |  SELECT (epoch_us(ts) // 3600000000) % 2 = 1 AS treated,
             |         event_type = 'purchase' AS conv
             |  FROM events
             |  WHERE (epoch_us(ts) // 60000000) % 60 >= 10
             |    AND (epoch_us(ts) // 60000000) % 60 < 50),
             |a AS (SELECT
             |        CAST(sum(CASE WHEN treated THEN 1 ELSE 0 END)
             |          AS BIGINT) AS n_t,
             |        CAST(sum(CASE WHEN treated AND conv THEN 1 ELSE 0
             |          END) AS BIGINT) AS c_t,
             |        CAST(sum(CASE WHEN NOT treated THEN 1 ELSE 0 END)
             |          AS BIGINT) AS n_c,
             |        CAST(sum(CASE WHEN NOT treated AND conv THEN 1
             |          ELSE 0 END) AS BIGINT) AS c_c
             |      FROM e)
             |SELECT n_t, n_c,
             |       c_t * 1000000 // n_t AS rate_t_e6,
             |       c_c * 1000000 // n_c AS rate_c_e6,
             |       CASE WHEN c_t * n_c >= c_c * n_t
             |         THEN (c_t * n_c - c_c * n_t) * 1000000
             |              // (n_t * n_c)
             |         ELSE -((c_c * n_t - c_t * n_c) * 1000000
             |              // (n_t * n_c))
             |       END AS effect_e6
             |FROM a""".stripMargin)),

    // ── Trigger dilution: assignment = even user id; triggered = had
    //    ≥1 click. ITT effect over all assigned vs the triggered-only
    //    effect, plus the trigger rate — the dilution factor an
    //    assignment-grain readout hides. ONE user rollup feeds both.
    QueryDef("q_trigger_dilution",
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("triggered"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("purchases"))
          .select((col("user_id") % 2 === 0).as("t"), col("triggered"),
            col("purchases"))
        u.agg(
            sum(when(col("t"), 1L).otherwise(0L)).as("n_t"),
            sum(when(!col("t"), 1L).otherwise(0L)).as("n_c"),
            sum(when(col("t"), col("purchases")).otherwise(0L)).as("p_t"),
            sum(when(!col("t"), col("purchases")).otherwise(0L)).as("p_c"),
            sum(when(col("t") && col("triggered") === 1L, 1L)
              .otherwise(0L)).as("nt_t"),
            sum(when(!col("t") && col("triggered") === 1L, 1L)
              .otherwise(0L)).as("nt_c"),
            sum(when(col("t") && col("triggered") === 1L, col("purchases"))
              .otherwise(0L)).as("pt_t"),
            sum(when(!col("t") && col("triggered") === 1L, col("purchases"))
              .otherwise(0L)).as("pt_c"))
          .selectExpr("CAST(n_t AS BIGINT) AS n_t",
            "CAST(n_c AS BIGINT) AS n_c",
            "(nt_t + nt_c) * 1000000 div (n_t + n_c) AS trigger_rate_e6",
            """CASE WHEN p_t * n_c >= p_c * n_t
              |  THEN (p_t * n_c - p_c * n_t) * 1000000 div (n_t * n_c)
              |  ELSE -((p_c * n_t - p_t * n_c) * 1000000
              |       div (n_t * n_c)) END AS itt_e6""".stripMargin,
            """CASE WHEN pt_t * nt_c >= pt_c * nt_t
              |  THEN (pt_t * nt_c - pt_c * nt_t) * 1000000
              |       div (nt_t * nt_c)
              |  ELSE -((pt_c * nt_t - pt_t * nt_c) * 1000000
              |       div (nt_t * nt_c)) END AS triggered_e6"""
              .stripMargin)
      },
      Some("""WITH u AS (
             |  SELECT user_id % 2 = 0 AS t,
             |         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0
             |           END) AS triggered,
             |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
             |           ELSE 0 END) AS BIGINT) AS purchases
             |  FROM events GROUP BY user_id),
             |a AS (SELECT
             |        CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT)
             |          AS n_t,
             |        CAST(sum(CASE WHEN NOT t THEN 1 ELSE 0 END)
             |          AS BIGINT) AS n_c,
             |        CAST(sum(CASE WHEN t THEN purchases ELSE 0 END)
             |          AS BIGINT) AS p_t,
             |        CAST(sum(CASE WHEN NOT t THEN purchases ELSE 0
             |          END) AS BIGINT) AS p_c,
             |        CAST(sum(CASE WHEN t AND triggered = 1 THEN 1
             |          ELSE 0 END) AS BIGINT) AS nt_t,
             |        CAST(sum(CASE WHEN NOT t AND triggered = 1 THEN 1
             |          ELSE 0 END) AS BIGINT) AS nt_c,
             |        CAST(sum(CASE WHEN t AND triggered = 1
             |          THEN purchases ELSE 0 END) AS BIGINT) AS pt_t,
             |        CAST(sum(CASE WHEN NOT t AND triggered = 1
             |          THEN purchases ELSE 0 END) AS BIGINT) AS pt_c
             |      FROM u)
             |SELECT n_t, n_c,
             |       (nt_t + nt_c) * 1000000 // (n_t + n_c)
             |         AS trigger_rate_e6,
             |       CASE WHEN p_t * n_c >= p_c * n_t
             |         THEN (p_t * n_c - p_c * n_t) * 1000000
             |              // (n_t * n_c)
             |         ELSE -((p_c * n_t - p_t * n_c) * 1000000
             |              // (n_t * n_c)) END AS itt_e6,
             |       CASE WHEN pt_t * nt_c >= pt_c * nt_t
             |         THEN (pt_t * nt_c - pt_c * nt_t) * 1000000
             |              // (nt_t * nt_c)
             |         ELSE -((pt_c * nt_t - pt_t * nt_c) * 1000000
             |              // (nt_t * nt_c)) END AS triggered_e6
             |FROM a""".stripMargin)),

    // ── Novelty decay: per user the first-event week is exposure week
    //    0; purchase-rate effect (even vs odd users) by weeks-since-
    //    exposure 0..3 — a lift that shrinks across the rows is a
    //    novelty artifact. One user min + one (week, arm) rollup.
    QueryDef("q_novelty_decay",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"),
            (col("event_type") === "purchase").as("conv"))
        val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("wk0"))
        e.join(first, "user_id")
          .withColumn("wse", col("wk") - col("wk0"))
          .filter(col("wse") <= 3)
          .groupBy(col("wse"))
          .agg(
            sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("n_t"),
            sum(when(col("user_id") % 2 === 0 && col("conv"), 1L)
              .otherwise(0L)).as("c_t"),
            sum(when(col("user_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_c"),
            sum(when(col("user_id") % 2 =!= 0 && col("conv"), 1L)
              .otherwise(0L)).as("c_c"))
          .filter(col("n_t") > 0L && col("n_c") > 0L)
          .selectExpr("CAST(wse AS BIGINT) AS weeks_since_exposure",
            "CAST(n_t AS BIGINT) AS n_t", "CAST(n_c AS BIGINT) AS n_c",
            """CASE WHEN c_t * n_c >= c_c * n_t
              |  THEN (c_t * n_c - c_c * n_t) * 1000000 div (n_t * n_c)
              |  ELSE -((c_c * n_t - c_t * n_c) * 1000000
              |       div (n_t * n_c)) END AS effect_e6""".stripMargin)
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
             |         event_type = 'purchase' AS conv
             |  FROM events),
             |f AS (SELECT user_id, min(wk) AS wk0 FROM e GROUP BY 1),
             |j AS (SELECT e.user_id, e.wk - f.wk0 AS wse, e.conv
             |      FROM e JOIN f ON e.user_id = f.user_id
             |      WHERE e.wk - f.wk0 <= 3),
             |a AS (SELECT wse,
             |        CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0
             |          END) AS BIGINT) AS n_t,
             |        CAST(sum(CASE WHEN user_id % 2 = 0 AND conv
             |          THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
             |        CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0
             |          END) AS BIGINT) AS n_c,
             |        CAST(sum(CASE WHEN user_id % 2 <> 0 AND conv
             |          THEN 1 ELSE 0 END) AS BIGINT) AS c_c
             |      FROM j GROUP BY 1)
             |SELECT CAST(wse AS BIGINT) AS weeks_since_exposure,
             |       n_t, n_c,
             |       CASE WHEN c_t * n_c >= c_c * n_t
             |         THEN (c_t * n_c - c_c * n_t) * 1000000
             |              // (n_t * n_c)
             |         ELSE -((c_c * n_t - c_t * n_c) * 1000000
             |              // (n_t * n_c)) END AS effect_e6
             |FROM a WHERE n_t > 0 AND n_c > 0""".stripMargin))
  )
}
