package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TimeSeries
import org.apache.spark.sql.functions._

/** Round-32 batch: watermark-lateness audit — the batch replay of the
  * reference's 10-minute watermark admission rule
  * (`heatmap_stream.py:107`) over the events feed.
  */
object Round32Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Would a 10-min watermark drop anything? Replay per event type in
    //    event_id (producer append) order.
    QueryDef("q_watermark_audit",
      (s, d) => TimeSeries.watermarkAudit(
        Tables.events(s, d), "event_type", "ts", "event_id",
        delayUs = 600L * 1000000L),
      Some("""WITH e AS (
             |  SELECT event_type AS k, epoch_us(ts) AS t_us,
             |         event_id AS seq
             |  FROM events),
             |wm AS (
             |  SELECT k, t_us,
             |         max(t_us) OVER (PARTITION BY k ORDER BY seq
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |           - 600000000 AS wm_us
             |  FROM e),
             |l AS (
             |  SELECT k,
             |         CASE WHEN wm_us IS NULL THEN 0
             |              ELSE greatest(wm_us - t_us, 0) END AS late_us
             |  FROM wm)
             |SELECT k, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN late_us = 0 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_kept,
             |       CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_dropped,
             |       CAST(max(late_us) // 1000000 AS BIGINT) AS max_late_s
             |FROM l GROUP BY k""".stripMargin))
  )
}
