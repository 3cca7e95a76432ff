package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Graph, OffPolicy}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-55 batch: off-policy evaluation (IPS / direct-method / doubly-
  * robust value of the greedy policy over a uniformly-logged bandit log
  * — the counterfactual layer a training-data pipeline needs before any
  * online test), a compaction planner (ordered bin-packing of per-day
  * file sizes into ~equal output files — the lakehouse OPTIMIZE
  * primitive next to q_zonemap_prune / q_zorder_layout), and the
  * Holland–Leinhardt dyad census (graph reciprocity).
  */
object Round55Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Off-policy: ctx = user bucket, action = event type, reward =
    //    clamped value cents; uniform logging (propensity 1/K).
    QueryDef("q_offpolicy_eval",
      (s, d) => OffPolicy.evaluateGreedy(
        Tables.events(s, d).select(
          (col("user_id") % 4).as("ctx"), col("event_type").as("act"),
          greatest(lit(0L),
            floor(col("value") * 100 + 0.5).cast("long")).as("r")),
        "ctx", "act", "r"),
      Some("""WITH t AS (SELECT user_id % 4 AS ctx, event_type AS act,
             |                  greatest(CAST(0 AS BIGINT),
             |                    CAST(floor(value * 100 + 0.5) AS BIGINT)) AS r
             |           FROM events),
             |cells AS (SELECT ctx, act, CAST(count(*) AS BIGINT) AS n_ca,
             |                 CAST(sum(r) AS BIGINT) AS s_ca
             |          FROM t GROUP BY 1, 2),
             |c2 AS (SELECT *, CAST(s_ca * 1000000 // n_ca AS BIGINT) AS mu_e6
             |       FROM cells),
             |best AS (SELECT ctx, act AS best_act, mu_e6 AS mu_best_e6
             |         FROM (SELECT *, row_number() OVER
             |                 (PARTITION BY ctx ORDER BY mu_e6 DESC, act) AS rn
             |               FROM c2)
             |         WHERE rn = 1),
             |k AS (SELECT CAST(count(DISTINCT act) AS BIGINT) AS k_actions
             |      FROM t),
             |j AS (SELECT t.act, t.r, b.best_act, b.mu_best_e6
             |      FROM t JOIN best b ON t.ctx = b.ctx),
             |agg AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |               CAST(sum(r) AS HUGEINT) AS s_log,
             |               CAST(sum(CASE WHEN act = best_act THEN r
             |                             ELSE 0 END) AS HUGEINT) AS s_match,
             |               CAST(sum(mu_best_e6) AS HUGEINT) AS s_mu,
             |               CAST(sum(CASE WHEN act = best_act
             |                             THEN r * 1000000 - mu_best_e6
             |                             ELSE 0 END) AS HUGEINT) AS s_dr
             |        FROM j)
             |SELECT CAST(n AS BIGINT) AS n, k_actions,
             |       CAST(s_log * 1000000 // n AS BIGINT) AS v_log_e6,
             |       CAST(k_actions * s_match * 1000000 // n AS BIGINT)
             |         AS v_ips_e6,
             |       CAST(s_mu // n AS BIGINT) AS v_dm_e6,
             |       CAST((s_mu + k_actions * s_dr) // n AS BIGINT) AS v_dr_e6
             |FROM agg CROSS JOIN k""".stripMargin)),

    // ── Compaction planner: per-ship-day row counts packed in day order
    //    into 16 ~equal bins (target = ceil(total/16)). The day axis is
    //    calendar-bounded, so the planning window is scale-invariant.
    QueryDef("q_compaction_bins",
      (s, d) => {
        val days = Tables.lineitem(s, d)
          .groupBy(expr(
            "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
            .as("day"))
          .agg(count(lit(1)).as("n_rows"))
        val tot = days.agg(sum(col("n_rows")).as("tot"))
        days.crossJoin(broadcast(tot))
          .withColumn("cum_before", coalesce(
            sum(col("n_rows")).over(Window.orderBy(col("day"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("bin", expr("cum_before div ((tot + 15) div 16)"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("rows_total"),
            min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      },
      Some("""WITH f AS (SELECT epoch_us(l_shipdate) // 86400000000 AS day,
             |                  CAST(count(*) AS BIGINT) AS n_rows
             |           FROM lineitem GROUP BY 1),
             |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tot FROM f),
             |c AS (SELECT day, n_rows,
             |             CAST(coalesce(sum(n_rows) OVER (ORDER BY day
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |               0) AS BIGINT) AS cum_before,
             |             (tot + 15) // 16 AS target
             |      FROM f CROSS JOIN t)
             |SELECT CAST(cum_before // target AS BIGINT) AS bin,
             |       CAST(count(*) AS BIGINT) AS n_files,
             |       CAST(sum(n_rows) AS BIGINT) AS rows_total,
             |       CAST(min(day) AS BIGINT) AS first_day,
             |       CAST(max(day) AS BIGINT) AS last_day
             |FROM c GROUP BY 1""".stripMargin)),

    // ── Dyad census over the deterministic event digraph
    //    (user bucket → event bucket, mod 500).
    QueryDef("q_dyad_census",
      (s, d) => Graph.dyadCensus(
        Tables.events(s, d).select((col("user_id") % 500).as("src"),
          (col("event_id") % 500).as("dst"))),
      Some("""WITH e AS (SELECT DISTINCT user_id % 500 AS src,
             |                  event_id % 500 AS dst
             |           FROM events WHERE user_id % 500 <> event_id % 500),
             |pairs AS (SELECT least(src, dst) AS lo, greatest(src, dst) AS hi,
             |                 CAST(count(*) AS BIGINT) AS dirs
             |          FROM e GROUP BY 1, 2),
             |a AS (SELECT CAST(coalesce(sum(CASE WHEN dirs = 2 THEN 1
             |                                    ELSE 0 END), 0) AS BIGINT)
             |               AS mutual,
             |             CAST(coalesce(sum(CASE WHEN dirs = 1 THEN 1
             |                                    ELSE 0 END), 0) AS BIGINT)
             |               AS asym
             |      FROM pairs),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes
             |       FROM (SELECT src AS id FROM e UNION SELECT dst FROM e)),
             |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
             |SELECT n_nodes, n_edges, mutual, asym,
             |       CAST(n_nodes * (n_nodes - 1) // 2 - mutual - asym
             |         AS BIGINT) AS null_dyads,
             |       CASE WHEN 2 * mutual + asym = 0 THEN NULL
             |            ELSE CAST(2 * mutual * 1000000 //
             |                   (2 * mutual + asym) AS BIGINT)
             |       END AS reciprocity_e6
             |FROM a CROSS JOIN nn CROSS JOIN ne""".stripMargin))
  )
}
