package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Behavior, Bm25, Quantiles, Stats}
import org.apache.spark.sql.functions._

/** Round-23 batch: Nelson–Aalen cumulative hazard, Lorenz decile
  * curve, and per-state transition entropy — each with an exact DuckDB
  * oracle twin.
  */
object Round23Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Nelson–Aalen over the same churn subjects as q_kaplan_meier:
    //    customers inactive > 60 days before corpus end are events.
    QueryDef("q_nelson_aalen",
      (s, d) => Stats.nelsonAalen(
        Tables.orders(s, d)
          .withColumn("day",
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
          .groupBy(col("o_custkey"))
          .agg(min(col("day")).as("f"), max(col("day")).as("l"))
          .crossJoin(broadcast(
            Tables.orders(s, d).agg(max(
              expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
              .as("e"))))
          .select((col("l") - col("f")).as("t"),
            when(col("e") - col("l") > 60L, 1L).otherwise(0L).as("ev")),
        "t", "ev"),
      Some("""WITH od AS (SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
             |           FROM orders),
             |cu AS (SELECT o_custkey, min(day) AS f, max(day) AS l FROM od GROUP BY 1),
             |g AS (SELECT max(day) AS e FROM od),
             |subj AS (SELECT l - f AS t, CASE WHEN e - l > 60 THEN 1 ELSE 0 END AS ev
             |         FROM cu CROSS JOIN g),
             |grp AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
             |               CAST(count(*) AS BIGINT) AS leave FROM subj GROUP BY t),
             |tot AS (SELECT CAST(sum(leave) AS BIGINT) AS n_all FROM grp),
             |walk AS (SELECT t, d, leave,
             |            CAST(n_all - (sum(leave) OVER w - leave) AS BIGINT) AS n_risk
             |         FROM grp CROSS JOIN tot
             |         WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
             |evs AS (SELECT t, n_risk, d,
             |          CAST(d * 1000000 // n_risk AS BIGINT) AS term_e6
             |        FROM walk WHERE d > 0)
             |SELECT t, n_risk, d, term_e6,
             |       CAST(sum(term_e6) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
             |            AS BIGINT) AS cumhaz_e6
             |FROM evs""".stripMargin)),

    // ── Lorenz deciles of purchase cents per event type — the curve
    //    behind q_gini, exact e6 shares at ⌊n·d/10⌋ cuts.
    QueryDef("q_lorenz",
      (s, d) => Quantiles.lorenz(
        Tables.events(s, d).select(col("event_type").as("g"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents")),
        "g", "cents"),
      Some("""WITH e AS (SELECT event_type AS g,
             |                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |          FROM events),
             |r AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS i,
             |             count(*) OVER (PARTITION BY g) AS n,
             |             sum(v) OVER (PARTITION BY g) AS tot
             |      FROM e),
             |x AS (SELECT g, v, i, n, tot, d.decile
             |      FROM r CROSS JOIN (SELECT unnest(generate_series(1, 10))
             |                         AS decile) d
             |      WHERE i <= (n * d.decile) // 10)
             |SELECT g, CAST(decile AS BIGINT) AS decile,
             |       CAST(max((n * decile) // 10) AS BIGINT) AS k_rows,
             |       CAST(sum(v) * 1000000 // max(tot) AS BIGINT) AS share_e6
             |FROM x GROUP BY g, decile""".stripMargin)),

    // ── Transition entropy per event type: how predictable the next
    //    event is, exact e6 fixed-point log₂.
    QueryDef("q_entropy_rate",
      (s, d) => Behavior.transitionEntropy(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_id", "event_type"),
      Some {
        val lg = Bm25.log2E6Sql("tot") + " - " + Bm25.log2E6Sql("c")
        s"""WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS t, event_id AS tie,
           |                  event_type AS et FROM events),
           |tr AS (SELECT src, et AS dst, CAST(count(*) AS BIGINT) AS c
           |       FROM (SELECT u, et, lag(et) OVER
           |               (PARTITION BY u ORDER BY t, tie) AS src
           |             FROM ev)
           |       WHERE src IS NOT NULL GROUP BY src, dst),
           |w AS (SELECT src, c,
           |        CAST(sum(c) OVER (PARTITION BY src) AS BIGINT) AS tot
           |      FROM tr)
           |SELECT src AS state, max(tot) AS n_out,
           |       CAST(sum(c * ($lg)) // max(tot) AS BIGINT) AS h_e6
           |FROM w GROUP BY src""".stripMargin
      })
  )
}
