package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Engagement
import org.apache.spark.sql.functions._

/** Round-35 batch: engagement analytics — DAU/WAU stickiness (scatter
  * formulation, no distinct-range window) and trigram path mining.
  */
object Round35Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── DAU / trailing-7d WAU per observed day.
    QueryDef("q_dau_stickiness",
      (s, d) => Engagement.stickiness(Tables.events(s, d), "user_id", "ts"),
      Some("""WITH ud AS (
             |  SELECT DISTINCT user_id AS u,
             |         epoch_us(ts) // 86400000000 AS day
             |  FROM events),
             |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
             |        FROM ud GROUP BY 1),
             |sc AS (SELECT DISTINCT u, day + k.k AS day
             |       FROM ud, (SELECT unnest(generate_series(0, 6)) AS k) k),
             |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
             |        FROM sc GROUP BY 1)
             |SELECT dau.day, dau.dau, wau.wau,
             |       CAST(dau.dau * 1000000 // wau.wau AS BIGINT) AS stick_e6
             |FROM dau JOIN wau ON wau.day = dau.day""".stripMargin)),

    // ── Top-10 event-type trigrams over user journeys.
    QueryDef("q_event_trigrams",
      (s, d) => Engagement.trigrams(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type", 10),
      Some("""WITH e AS (
             |  SELECT user_id AS ent, epoch_us(ts) AS t, event_id AS tie,
             |         event_type AS e1
             |  FROM events),
             |p AS (
             |  SELECT e1,
             |         lead(e1, 1) OVER (PARTITION BY ent ORDER BY t, tie)
             |           AS e2,
             |         lead(e1, 2) OVER (PARTITION BY ent ORDER BY t, tie)
             |           AS e3
             |  FROM e)
             |SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS cnt
             |FROM p WHERE e3 IS NOT NULL
             |GROUP BY 1, 2, 3
             |ORDER BY cnt DESC, e1, e2, e3 LIMIT 10""".stripMargin))
  )
}
