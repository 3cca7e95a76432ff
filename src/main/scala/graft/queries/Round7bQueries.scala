package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Segmentation, TimeSeries}

/** Round-7 second batch: audience analytics (RFM segments, day-N
  * retention) and the integer-exact EWMA fold. */
object Round7bQueries {

  def defs: Seq[QueryDef] = Seq(

    // ── RFM quintile segmentation of customers from their order stream.
    //    Every bucket boundary is deterministic (ties order by entity),
    //    so the 3-digit segment codes hash-match the oracle.
    QueryDef("q_rfm_segments",
      (s, d) => Segmentation.rfm(
        Tables.orders(s, d)
          .withColumn("ts_s", unix_timestamp(col("o_orderdate")))
          .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5).cast("long")),
        "o_custkey", "ts_s", "cents"),
      Some("""WITH per AS (SELECT o_custkey AS entity,
             |                    CAST(max(epoch(o_orderdate)) AS BIGINT) AS last_s,
             |                    CAST(count(*) AS BIGINT) AS n_orders,
             |                    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
             |             FROM orders GROUP BY 1),
             |q AS (SELECT entity, last_s, n_orders, total_cents,
             |        CAST(ntile(5) OVER (ORDER BY last_s, entity) AS INT) AS r,
             |        CAST(ntile(5) OVER (ORDER BY n_orders, entity) AS INT) AS f,
             |        CAST(ntile(5) OVER (ORDER BY total_cents, entity) AS INT) AS m
             |      FROM per)
             |SELECT entity, last_s, n_orders, total_cents, r, f, m,
             |       r * 100 + f * 10 + m AS segment
             |FROM q""".stripMargin)),

    // ── Day-7 retention per activity day: distinct (user, epoch-day)
    //    self-joined against its horizon-shifted copy.
    QueryDef("q_retention_day7",
      (s, d) => Segmentation.retentionDayN(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", 7),
      Some("""WITH act AS (SELECT DISTINCT user_id AS entity,
             |                    epoch_us(ts) // 86400000000 AS day FROM events),
             |sh AS (SELECT entity, day - 7 AS day, 1 AS ret FROM act)
             |SELECT a.day, CAST(count(*) AS BIGINT) AS n_active,
             |       CAST(count(sh.ret) AS BIGINT) AS n_retained,
             |       CAST(count(sh.ret) * 1000000 // count(*) AS BIGINT) AS rate_e6
             |FROM act a LEFT JOIN sh ON sh.entity = a.entity AND sh.day = a.day
             |GROUP BY 1""".stripMargin)),

    // ── Per-type half-life EWMA of event values in cents: the truncating
    //    (s + x) div 2 recursion folds per key; the oracle replays the
    //    identical fold with list_reduce (0-prepended so both engines
    //    start from the same accumulator).
    QueryDef("q_ewma_smooth",
      (s, d) => TimeSeries.ewmaHalf(
        Tables.events(s, d)
          .withColumn("t_us", unix_micros(col("ts")))
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "t_us", "event_id", "cents"),
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS t, event_id,
             |                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c FROM events)
             |SELECT event_type AS key,
             |       list_reduce(list_prepend(CAST(0 AS BIGINT),
             |                                list(c ORDER BY t, event_id)),
             |                   (a, b) -> (a + b) // 2) AS ewma_cents,
             |       CAST(count(*) AS BIGINT) AS n_points
             |FROM e GROUP BY 1""".stripMargin))
  )
}
