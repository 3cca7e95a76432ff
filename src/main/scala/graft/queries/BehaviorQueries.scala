package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.Behavior

/** Behavioral / event-sequence analytics over the keyed, time-ordered
  * `events` stream — the same shape as the reference's per-vehicle position
  * feed (`mbta_to_kafka.py:79` keys by vehicleId). Funnels, Markov
  * transition matrices, and frequent paths are the standard telemetry
  * questions over such a stream; none need more than one shuffle on the
  * entity key (see [[graft.ops.Behavior]] scaladoc for the scale argument).
  */
object BehaviorQueries {

  def defs: Seq[QueryDef] = Seq(

    // ── Funnel view→click→purchase per user: highest stage reached with
    //    strictly-increasing event times. Single groupBy(user) shuffle; the
    //    per-user fold is a codegen'd higher-order aggregate, so funnel
    //    depth adds zero shuffles (vs the naive one-join-per-step plan).
    //    Oracle: stepwise min-ts cascade (greedy-earliest ≡ stepwise-min).
    QueryDef("q_funnel_stages",
      (s, d) => Behavior.funnelStages(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_type", Seq("view", "click", "purchase")),
      Some("""WITH e AS (SELECT user_id AS entity, epoch_us(ts) AS t, event_type AS et FROM events),
             |u AS (SELECT DISTINCT entity FROM e),
             |s1 AS (SELECT entity, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
             |s2 AS (SELECT e.entity, min(t) AS t2 FROM e JOIN s1 USING (entity)
             |       WHERE et = 'click' AND t > t1 GROUP BY 1),
             |s3 AS (SELECT e.entity, min(t) AS t3 FROM e JOIN s2 USING (entity)
             |       WHERE et = 'purchase' AND t > t2 GROUP BY 1)
             |SELECT entity,
             |       CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
             |FROM u LEFT JOIN s1 USING (entity) LEFT JOIN s2 USING (entity)
             |       LEFT JOIN s3 USING (entity)""".stripMargin)),

    // ── First-order transition (Markov) matrix src→dst with integer e6
    //    probabilities (cnt*1e6 div Σ_src — all-integer, cross-engine
    //    exact; `ts` is globally unique in the testdata so the ordering
    //    window is deterministic).
    QueryDef("q_event_transitions",
      (s, d) => Behavior.transitions(Tables.events(s, d),
        "user_id", "ts", "event_type"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et FROM events),
             |p AS (SELECT et AS src, lead(et) OVER (PARTITION BY user_id ORDER BY t) AS dst
             |      FROM e)
             |SELECT src, dst, count(*) AS cnt,
             |       CAST(count(*) * 1000000 // sum(count(*)) OVER (PARTITION BY src) AS BIGINT) AS prob_e6
             |FROM p WHERE dst IS NOT NULL GROUP BY src, dst""".stripMargin)),

    // ── Top-15 most frequent consecutive length-3 event-type paths.
    //    |types|³ = 125 candidate paths ⇒ the final top-k aggregate is
    //    tiny regardless of input scale; ties break on path text.
    QueryDef("q_event_paths",
      (s, d) => Behavior.topPaths(Tables.events(s, d),
        "user_id", "ts", "event_type", 15),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et FROM events),
             |p AS (SELECT et AS e1, lead(et, 1) OVER w AS e2, lead(et, 2) OVER w AS e3
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t))
             |SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS cnt
             |FROM p WHERE e3 IS NOT NULL
             |GROUP BY 1 ORDER BY cnt DESC, path LIMIT 15""".stripMargin))
  )
}
