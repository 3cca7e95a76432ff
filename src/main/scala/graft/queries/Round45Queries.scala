package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Behavior, Recsys}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-45 batch: recommender catalog-coverage/exposure audit (the
  * serving-quality report on top of q_item_cf), FIFO inventory matching
  * (cumulative-axis interval alignment — the warehouse age-of-stock
  * analytic), and the daily funnel conversion rollup that closes SURVEY
  * §7.4's deferred "stateless conversion-rate rollup over
  * windowed-funnel outcomes".
  */
object Round45Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Coverage + exposure concentration of the CF top-5 lists: how
    //    much of the catalog is ever recommended, and how concentrated
    //    exposure is on the 10 most-recommended parts. One derived
    //    aggregate over the shared Recsys.itemCf output.
    QueryDef("q_rec_coverage",
      (s, d) => {
        val recs = Recsys.itemCf(
          Tables.lineitem(s, d)
            .select(col("l_orderkey").as("b"), col("l_partkey").as("i")),
          "b", "i", 2L, 5).localCheckpoint(false)
        val catalog = Tables.part(s, d)
          .agg(countDistinct(col("p_partkey")).as("catalog_sz"))
        val exposure = recs.groupBy(col("rec"))
          .agg(count(lit(1)).as("exp"))
        val top10 = exposure
          .withColumn("rk", row_number().over(
            Window.orderBy(col("exp").desc, col("rec"))))
          .agg(sum(when(col("rk") <= 10, col("exp")).otherwise(0L))
            .as("top10_exp"), sum(col("exp")).as("total_exp"),
            count(lit(1)).as("n_distinct_recs"))
        val items = recs.agg(countDistinct(col("item"))
          .as("n_items_with_recs"))
        items.join(broadcast(top10)).join(broadcast(catalog))
          .select(col("n_items_with_recs"), col("n_distinct_recs"),
            col("catalog_sz"),
            expr("n_distinct_recs * 1000000 div catalog_sz")
              .as("coverage_e6"),
            expr("top10_exp * 1000000 div total_exp").as("top10_share_e6"))
      },
      Some(s"""WITH recs AS MATERIALIZED (${Round22Queries.itemCfSql}),
              |cat AS (SELECT count(DISTINCT p_partkey) AS catalog_sz
              |        FROM part),
              |ex AS (SELECT rec, count(*) AS exp FROM recs GROUP BY 1),
              |t10 AS (
              |  SELECT sum(CASE WHEN rk <= 10 THEN exp ELSE 0 END)
              |           AS top10_exp,
              |         sum(exp) AS total_exp, count(*) AS n_distinct_recs
              |  FROM (SELECT exp, row_number() OVER
              |          (ORDER BY exp DESC, rec) AS rk FROM ex)),
              |it AS (SELECT count(DISTINCT item) AS n_items_with_recs
              |       FROM recs)
              |SELECT CAST(n_items_with_recs AS BIGINT) AS n_items_with_recs,
              |       CAST(n_distinct_recs AS BIGINT) AS n_distinct_recs,
              |       CAST(catalog_sz AS BIGINT) AS catalog_sz,
              |       CAST(n_distinct_recs * 1000000 // catalog_sz AS BIGINT)
              |         AS coverage_e6,
              |       CAST(top10_exp * 1000000 // total_exp AS BIGINT)
              |         AS top10_share_e6
              |FROM it CROSS JOIN t10 CROSS JOIN cat""".stripMargin)),

    // ── FIFO inventory matching per supplier bucket: returns (R lines)
    //    consume restocks oldest-first. Both sides map onto a CUMULATIVE
    //    QUANTITY axis (restock r covers [cum−qty, cum) of supply,
    //    depletion d covers the same span of demand) so FIFO matching =
    //    interval overlap on that axis — a JOIN, not a sequential scan.
    //    Pair search is bucket-blocked (width 64 ≥ max qty ⇒ ≤ 2 buckets
    //    per interval; dedupe by canonical overlap-start bucket). Age is
    //    in days (no division until the final sign-factored average).
    QueryDef("q_fifo_matching",
      (s, d) => {
        val base = Tables.lineitem(s, d).select(
            (col("l_suppkey") % 50).as("k"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("t"),
            (col("l_orderkey") * 8 + col("l_linenumber")).as("tie"),
            col("l_quantity").cast("long").as("qty"),
            (col("l_returnflag") === "R").as("isdep"))
          .localCheckpoint(false) // one scan feeds both classes
        val wk = Window.partitionBy(col("k")).orderBy(col("t"), col("tie"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sup = base.filter(!col("isdep"))
          .withColumn("s_end", sum(col("qty")).over(wk))
          .select(col("k"), (col("s_end") - col("qty")).as("s_start"),
            col("s_end"), expr("t div 86400000000").as("s_day"))
        val dep = base.filter(col("isdep"))
          .withColumn("d_end", sum(col("qty")).over(wk))
          .select(col("k"), (col("d_end") - col("qty")).as("d_start"),
            col("d_end"), expr("t div 86400000000").as("d_day"))
        val supB = sup.withColumn("bkt",
          explode(expr("sequence(s_start div 64, (s_end - 1) div 64)")))
        val depB = dep.withColumn("bkt",
          explode(expr("sequence(d_start div 64, (d_end - 1) div 64)")))
        val matched = supB.join(depB, Seq("k", "bkt"))
          .filter(expr("least(s_end, d_end) > greatest(s_start, d_start)")
            && expr("bkt = greatest(s_start, d_start) div 64"))
          .select(col("k"),
            expr("least(s_end, d_end) - greatest(s_start, d_start)")
              .as("mq"),
            (col("d_day") - col("s_day")).as("age_days"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_matches"), sum(col("mq")).as("matched_qty"),
            sum(col("mq") * col("age_days")).as("qty_age_days"))
        val depTot = dep.groupBy(col("k"))
          .agg(sum(col("d_end") - col("d_start")).as("dep_qty"))
        depTot.join(matched, Seq("k"), "left")
          .select(col("k"), col("dep_qty"),
            coalesce(col("n_matches"), lit(0L)).as("n_matches"),
            coalesce(col("matched_qty"), lit(0L)).as("matched_qty"),
            (col("dep_qty") - coalesce(col("matched_qty"), lit(0L)))
              .as("unmatched_qty"),
            expr("""CASE WHEN coalesce(matched_qty, 0) = 0 THEN 0
                   |WHEN coalesce(qty_age_days, 0) >= 0
                   |THEN qty_age_days * 100 div matched_qty
                   |ELSE -((-qty_age_days) * 100 div matched_qty)
                   |END""".stripMargin).as("avg_age_days_e2"))
      },
      Some("""WITH base AS (
             |  SELECT l_suppkey % 50 AS k, epoch_us(l_shipdate) AS t,
             |         l_orderkey * 8 + l_linenumber AS tie,
             |         CAST(l_quantity AS BIGINT) AS qty,
             |         l_returnflag = 'R' AS isdep
             |  FROM lineitem),
             |sup AS (
             |  SELECT k, s_end - qty AS s_start, s_end,
             |         t // 86400000000 AS s_day
             |  FROM (SELECT k, t, qty,
             |          CAST(sum(qty) OVER (PARTITION BY k ORDER BY t, tie
             |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_end
             |        FROM base WHERE NOT isdep) s),
             |dep AS (
             |  SELECT k, d_end - qty AS d_start, d_end,
             |         t // 86400000000 AS d_day
             |  FROM (SELECT k, t, qty,
             |          CAST(sum(qty) OVER (PARTITION BY k ORDER BY t, tie
             |                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS d_end
             |        FROM base WHERE isdep) s),
             |supb AS (SELECT *, unnest(range(s_start // 64,
             |                               (s_end - 1) // 64 + 1)) AS bkt
             |         FROM sup),
             |depb AS (SELECT *, unnest(range(d_start // 64,
             |                               (d_end - 1) // 64 + 1)) AS bkt
             |         FROM dep),
             |mt AS (
             |  SELECT s.k,
             |         least(s.s_end, d.d_end)
             |           - greatest(s.s_start, d.d_start) AS mq,
             |         d.d_day - s.s_day AS age_days
             |  FROM supb s JOIN depb d ON s.k = d.k AND s.bkt = d.bkt
             |  WHERE least(s.s_end, d.d_end) > greatest(s.s_start, d.d_start)
             |    AND s.bkt = greatest(s.s_start, d.d_start) // 64),
             |mg AS (
             |  SELECT k, count(*) AS n_matches, sum(mq) AS matched_qty,
             |         sum(mq * age_days) AS qty_age_days
             |  FROM mt GROUP BY 1),
             |dt AS (SELECT k, sum(d_end - d_start) AS dep_qty
             |       FROM dep GROUP BY 1)
             |SELECT dt.k, CAST(dep_qty AS BIGINT) AS dep_qty,
             |       CAST(coalesce(n_matches, 0) AS BIGINT) AS n_matches,
             |       CAST(coalesce(matched_qty, 0) AS BIGINT) AS matched_qty,
             |       CAST(dep_qty - coalesce(matched_qty, 0) AS BIGINT)
             |         AS unmatched_qty,
             |       CAST(CASE WHEN coalesce(matched_qty, 0) = 0 THEN 0
             |            WHEN coalesce(qty_age_days, 0) >= 0
             |            THEN qty_age_days * 100 // matched_qty
             |            ELSE -((-qty_age_days) * 100 // matched_qty)
             |            END AS BIGINT) AS avg_age_days_e2
             |FROM dt LEFT JOIN mg ON dt.k = mg.k""".stripMargin)),

    // ── Daily funnel conversion rollup over the shared session-funnel
    //    outcomes (1-hour gap sessions, view→click→purchase): per
    //    session-start day, sessions and stage-reach counts with the e6
    //    conversion rate — the deferred §7.4 downstream rollup.
    QueryDef("q_funnel_daily",
      (s, d) => Behavior.funnelSessions(
          Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
          "user_id", "t_us", "event_type",
          Seq("view", "click", "purchase"), 3600000000L)
        .groupBy(expr("session_start_us div 86400000000").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("stage") >= 1, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("stage") >= 2, 1L).otherwise(0L)).as("n_click"),
          sum(when(col("stage") >= 3, 1L).otherwise(0L)).as("n_purchase"))
        .withColumn("cvr_e6",
          expr("n_purchase * 1000000 div n_sessions")),
      Some("""WITH e AS (SELECT user_id AS entity, epoch_us(ts) AS t,
             |                  event_type AS et FROM events),
             |o AS (SELECT entity, t, et,
             |        CASE WHEN lag(t) OVER w IS NULL
             |               OR t - lag(t) OVER w > 3600000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e WINDOW w AS (PARTITION BY entity ORDER BY t, et)),
             |s AS (SELECT entity, t, et,
             |        CAST(sum(new_s) OVER (PARTITION BY entity
             |          ORDER BY t, et ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |          AS sid
             |      FROM o),
             |g AS (SELECT entity, sid, min(t) AS st FROM s GROUP BY 1, 2),
             |s1 AS (SELECT entity, sid, min(t) AS t1 FROM s
             |       WHERE et = 'view' GROUP BY 1, 2),
             |s2 AS (SELECT s.entity, s.sid, min(t) AS t2
             |       FROM s JOIN s1 USING (entity, sid)
             |       WHERE et = 'click' AND t > t1 GROUP BY 1, 2),
             |s3 AS (SELECT s.entity, s.sid, min(t) AS t3
             |       FROM s JOIN s2 USING (entity, sid)
             |       WHERE et = 'purchase' AND t > t2 GROUP BY 1, 2),
             |st AS (SELECT g.st // 86400000000 AS day,
             |         CASE WHEN t3 IS NOT NULL THEN 3
             |              WHEN t2 IS NOT NULL THEN 2
             |              WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
             |       FROM g LEFT JOIN s1 USING (entity, sid)
             |              LEFT JOIN s2 USING (entity, sid)
             |              LEFT JOIN s3 USING (entity, sid))
             |SELECT day, CAST(count(*) AS BIGINT) AS n_sessions,
             |       CAST(sum(CASE WHEN stage >= 1 THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_view,
             |       CAST(sum(CASE WHEN stage >= 2 THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_click,
             |       CAST(sum(CASE WHEN stage >= 3 THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_purchase,
             |       CAST(sum(CASE WHEN stage >= 3 THEN 1 ELSE 0 END)
             |            * 1000000 // count(*) AS BIGINT) AS cvr_e6
             |FROM st GROUP BY 1""".stripMargin))
  )
}
