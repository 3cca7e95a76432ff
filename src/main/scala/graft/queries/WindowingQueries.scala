package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Window-semantics and skew-handling extensions beyond the reference's
  * single tumbling window (SURVEY.md §2.9 notes sliding/session windows as
  * absent; they are table stakes for a streaming engine, and the salted
  * aggregate is the standard skew escape at scale). */
object WindowingQueries {

  def defs: Seq[QueryDef] = Seq(

    // ── Sliding window (10-min length, 5-min slide): every event lands in
    //    exactly two windows. Oracle: union of the two shifted tumbling
    //    assignments.
    QueryDef("q_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("ws_es"), col("event_type"),
          col("cnt"), col("sum_value")),
      Some("""SELECT ws_es, event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
             |FROM (SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS ws_es, event_type, value FROM events
             |      UNION ALL
             |      SELECT CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT) AS ws_es, event_type, value FROM events) t
             |GROUP BY ws_es, event_type""".stripMargin)),

    // ── Session window (30-min inactivity gap) per user. Oracle:
    //    gaps-and-islands over exact micros.
    QueryDef("q_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"), col("cnt")),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t FROM events),
             |s AS (SELECT user_id, t,
             |             CASE WHEN lag(t) OVER w IS NULL
             |                    OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
             |g AS (SELECT user_id, t,
             |             sum(brk) OVER (PARTITION BY user_id ORDER BY t
             |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
             |      FROM s)
             |SELECT user_id, min(t) AS start_us, max(t) + 1800000000 AS end_us,
             |       count(*) AS cnt
             |FROM g GROUP BY user_id, grp""".stripMargin)),

    // ── Salted two-phase aggregate: the skew pattern (few hot keys fan out
    //    across 8 salts for the partial phase, then re-combine). Result is
    //    identical to the plain aggregate — which is exactly the oracle.
    QueryDef("q_salted_agg",
      (s, d) => Tables.events(s, d)
        .withColumn("salt", pmod(col("event_id"), lit(8)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("c"), sum(col("value")).as("sv"))
        .groupBy(col("event_type"))
        .agg(sum(col("c")).as("cnt"), round(sum(col("sv")), 4).as("sum_value")),
      Some("""SELECT event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY event_type""".stripMargin)),

    // ── Salted equi-join: hot join keys fan across 8 salts (small side
    //    replicated), result provably identical to the plain join.
    QueryDef("q_salted_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val dim = ev.select(col("event_type")).distinct()
          .withColumn("w", length(col("event_type")).cast("long"))
        graft.ops.Skew.saltedJoin(ev, dim, "event_type", 8, col("event_id"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"),
            round(sum(col("value") * col("w")), 4).as("wsum"))
      },
      Some("""SELECT event_type, count(*) AS cnt,
             |       round(sum(value * length(event_type)), 4) AS wsum
             |FROM events GROUP BY event_type""".stripMargin)),

    // ── CUBE over two dims with grouping indicators.
    QueryDef("q_cube",
      (s, d) => Tables.events(s, d)
        .withColumn("user_bucket", col("user_id") % 10)
        .cube(col("event_type"), col("user_bucket"))
        .agg(count(lit(1)).as("cnt"),
          grouping(col("event_type")).cast("int").as("g_type"),
          grouping(col("user_bucket")).cast("int").as("g_user")),
      Some("""SELECT event_type, user_id % 10 AS user_bucket, count(*) AS cnt,
             |       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
             |       CAST(GROUPING(user_id % 10) AS INTEGER) AS g_user
             |FROM events GROUP BY CUBE (event_type, user_id % 10)""".stripMargin))
  )
}
