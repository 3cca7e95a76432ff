package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-124 batch: session bounce rate (the single-event-session
  * share — the engagement health number beside q_dau_stickiness), an
  * equi-depth histogram with per-bucket NDV (the optimizer statistics
  * an ANALYZE pass materializes — boundaries by rank cutpoint, not
  * value width, so skew can't empty buckets), and growth streaks
  * (longest month-over-month up/down runs via sign islands). All
  * integer-exact.
  */
object Round124Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Bounce rate: sessions = 30-minute-gap splits per user (the
    //    registry's session convention); a bounce is a single-event
    //    session. One user-keyed lag/segment pass, per-event_type-of-
    //    first-event rollup.
    QueryDef("q_bounce_rate",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sess = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("pts", lag(col("ts"), 1).over(w))
          .withColumn("new_sess", when(col("pts").isNull ||
            expr("unix_micros(ts) - unix_micros(pts)") > 1800000000L, 1L)
            .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"), col("sess_id"))
              .orderBy(col("ts"), col("event_id"))))
        val per = sess.groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).as("n_events"),
            max(when(col("rn") === 1, col("event_type"))).as("first_type"))
        per.groupBy(col("first_type"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(when(col("n_events") === 1L, 1L).otherwise(0L))
              .as("n_bounces"))
          .selectExpr("first_type",
            "CAST(n_sessions AS BIGINT) AS n_sessions",
            "CAST(n_bounces AS BIGINT) AS n_bounces",
            "n_bounces * 1000000 div n_sessions AS bounce_e6")
      },
      Some("""WITH sq AS (
             |  SELECT user_id, ts, event_id, event_type,
             |         CASE WHEN lag(ts) OVER w IS NULL
             |               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
             |                  > 1800000000
             |              THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (SELECT user_id, ts, event_id, event_type,
             |                sum(new_sess) OVER (PARTITION BY user_id
             |                  ORDER BY ts, event_id
             |                  ROWS UNBOUNDED PRECEDING) AS sess_id
             |         FROM sq),
             |fr AS (SELECT user_id, sess_id, ts, event_id, event_type,
             |              row_number() OVER (PARTITION BY user_id,
             |                sess_id ORDER BY ts, event_id) AS rn
             |       FROM sess),
             |per AS (SELECT user_id, sess_id,
             |               CAST(count(*) AS BIGINT) AS n_events,
             |               max(CASE WHEN rn = 1 THEN event_type END)
             |                 AS first_type
             |        FROM fr GROUP BY 1, 2)
             |SELECT first_type,
             |       CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_bounces,
             |       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) * 1000000 // count(*) AS bounce_e6
             |FROM per GROUP BY 1""".stripMargin)),

    // ── Equi-depth histogram over order value cents: 10 rank-cutpoint
    //    buckets (bucket = (rn−1)·10 div n), per bucket lo/hi/count/
    //    NDV — the ANALYZE statistics a cost-based optimizer feeds on.
    //    One rank window (value-sorted, calendar-free) + one rollup.
    QueryDef("q_equidepth_hist",
      (s, d) => {
        val v = Tables.orders(s, d)
          .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("v"))
        val n = v.agg(count(lit(1)).as("n"))
        v.crossJoin(broadcast(n))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("v"))).cast("long"))
          .withColumn("bucket", expr("(rn - 1) * 10 div n"))
          .groupBy(col("bucket"))
          .agg(min(col("v")).as("lo_cents"), max(col("v")).as("hi_cents"),
            count(lit(1)).as("n_rows"), countDistinct(col("v")).as("ndv"))
          .selectExpr("CAST(bucket AS BIGINT) AS bucket",
            "lo_cents", "hi_cents", "CAST(n_rows AS BIGINT) AS n_rows",
            "CAST(ndv AS BIGINT) AS ndv")
      },
      Some("""WITH v AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
             |                    AS BIGINT) AS v
             |           FROM orders),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
             |rk AS (SELECT v,
             |              (CAST(row_number() OVER (ORDER BY v)
             |                 AS BIGINT) - 1) * 10 // n AS bucket
             |       FROM v CROSS JOIN n)
             |SELECT bucket, CAST(min(v) AS BIGINT) AS lo_cents,
             |       CAST(max(v) AS BIGINT) AS hi_cents,
             |       CAST(count(*) AS BIGINT) AS n_rows,
             |       CAST(count(DISTINCT v) AS BIGINT) AS ndv
             |FROM rk GROUP BY 1""".stripMargin)),

    // ── Growth streaks: sign islands over month-over-month revenue
    //    deltas (rn − rank-within-sign — the q_repetition_loops idiom
    //    on the time axis). Emits the longest up and down streaks with
    //    their endpoints. The month axis is calendar-bounded.
    QueryDef("q_growth_streaks",
      (s, d) => {
        val mo = Tables.orders(s, d)
          .groupBy(expr("year(o_orderdate) * 100 + month(o_orderdate)")
            .as("mo"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("rev"))
        val w = Window.orderBy(col("mo"))
        val sgn = mo
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("prev", lag(col("rev"), 1).over(w))
          .filter(col("prev").isNotNull && col("rev") =!= col("prev"))
          .withColumn("dir", when(col("rev") > col("prev"), "up")
            .otherwise("down"))
          .withColumn("isl", col("rn") - row_number().over(
            Window.partitionBy(col("dir")).orderBy(col("rn"))))
        sgn.groupBy(col("dir"), col("isl"))
          .agg(count(lit(1)).as("len"), min(col("mo")).as("from_mo"),
            max(col("mo")).as("to_mo"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("dir"))
              .orderBy(col("len").desc, col("from_mo"))))
          .filter(col("rk") === 1)
          .selectExpr("dir", "CAST(len AS BIGINT) AS len",
            "CAST(from_mo AS BIGINT) AS from_mo",
            "CAST(to_mo AS BIGINT) AS to_mo")
      },
      Some("""WITH mo AS (SELECT year(o_orderdate) * 100
             |                    + month(o_orderdate) AS mo,
             |                  CAST(sum(CAST(floor(o_totalprice * 100
             |                    + 0.5) AS BIGINT)) AS BIGINT) AS rev
             |           FROM orders GROUP BY 1),
             |sq AS (SELECT mo, rev,
             |              CAST(row_number() OVER (ORDER BY mo)
             |                AS BIGINT) AS rn,
             |              lag(rev) OVER (ORDER BY mo) AS prev
             |       FROM mo),
             |dirs AS (SELECT mo, rn,
             |                CASE WHEN rev > prev THEN 'up'
             |                     ELSE 'down' END AS dir
             |         FROM sq WHERE prev IS NOT NULL AND rev <> prev),
             |isl AS (SELECT mo, dir,
             |               rn - row_number() OVER (PARTITION BY dir
             |                 ORDER BY rn) AS isl
             |        FROM dirs),
             |runs AS (SELECT dir, isl, CAST(count(*) AS BIGINT) AS len,
             |                CAST(min(mo) AS BIGINT) AS from_mo,
             |                CAST(max(mo) AS BIGINT) AS to_mo
             |         FROM isl GROUP BY 1, 2)
             |SELECT dir, len, from_mo, to_mo
             |FROM (SELECT *, row_number() OVER (PARTITION BY dir
             |        ORDER BY len DESC, from_mo) AS rk
             |      FROM runs)
             |WHERE rk = 1""".stripMargin))
  )
}
