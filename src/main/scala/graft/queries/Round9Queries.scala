package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Anomaly, Bm25, Incremental, IntervalJoin, Ranking, TimeSeries}

/** Round-9 extensions: integer least-squares trends, incremental
  * aggregate maintenance (the materialized-view delta path), and offline
  * changepoint scanning. All-integer arithmetic throughout.
  */
object Round9Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Per-type linear trend of event values: e6 cents-per-second
    //    least-squares slope on centered time, all integer.
    QueryDef("q_trend_slope",
      (s, d) => TimeSeries.trendSlope(
        Tables.events(s, d)
          .withColumn("t_us", unix_micros(col("ts")))
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "t_us", "cents"),
      Some("""WITH e AS (SELECT event_type AS key, epoch_us(ts) // 1000000 AS t,
             |                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cv
             |           FROM events),
             |ctr AS (SELECT key, t - min(t) OVER (PARTITION BY key) AS tc, cv FROM e),
             |g AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(tc) AS BIGINT) AS st,
             |             CAST(sum(cv) AS BIGINT) AS sy,
             |             CAST(sum(tc * cv) AS BIGINT) AS sty,
             |             CAST(sum(tc * tc) AS BIGINT) AS stt
             |      FROM ctr GROUP BY key)
             |SELECT key, n,
             |       round((CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
             |               - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
             |             / nullif(CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
             |               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE),
             |               CAST(0 AS DOUBLE)), 6) AS slope
             |FROM g""".stripMargin)),

    // ── Materialized-aggregate maintenance: base excludes orderkey % 10
    //    = 0; the change feed inserts those and deletes base rows with
    //    orderkey % 7 = 0. The oracle recomputes the final set directly
    //    — equality proves delta-merge ≡ full recompute.
    QueryDef("q_incremental_agg",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderpriority").as("g"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
        val base = o.filter(col("o_orderkey") % 10 =!= 0)
          .groupBy(col("g"))
          .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
        val changes = o.filter(col("o_orderkey") % 10 === 0)
          .select(col("g"), col("v"), lit(1L).as("op"))
          .unionByName(o.filter(col("o_orderkey") % 10 =!= 0 &&
              col("o_orderkey") % 7 === 0)
            .select(col("g"), col("v"), lit(-1L).as("op")))
        Incremental.maintainAgg(base, changes)
      },
      Some("""SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS cnt,
             |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             |         AS total
             |FROM orders
             |WHERE o_orderkey % 10 = 0
             |   OR (o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 0)
             |GROUP BY 1""".stripMargin)),

    // ── Offline changepoint: the split maximizing the between-segment
    //    mean shift per event type (earliest split on ties).
    QueryDef("q_changepoint",
      (s, d) => Anomaly.changepoint(
        Tables.events(s, d)
          .withColumn("t_us", unix_micros(col("ts")))
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "t_us", "event_id", "cents"),
      Some("""WITH e AS (SELECT event_type AS key, epoch_us(ts) AS t, event_id,
             |                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS cv
             |           FROM events),
             |w AS (SELECT key, t,
             |             row_number() OVER (PARTITION BY key ORDER BY t, event_id) AS rn,
             |             sum(cv) OVER (PARTITION BY key ORDER BY t, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS s1,
             |             CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n,
             |             sum(cv) OVER (PARTITION BY key) AS s
             |      FROM e),
             |sc AS (SELECT key, t, rn, n,
             |              abs(s1 * (n - rn) - (s - s1) * rn) * 1000000
             |                // (rn * (n - rn)) AS score_e6
             |       FROM w WHERE rn < n),
             |r AS (SELECT key, t, score_e6, n,
             |             row_number() OVER (PARTITION BY key
             |                                ORDER BY score_e6 DESC, rn ASC) AS pick
             |      FROM sc)
             |SELECT key, t AS split_t, CAST(score_e6 AS BIGINT) AS score_e6, n
             |FROM r WHERE pick = 1""".stripMargin)),

    // ── Reciprocal rank fusion of two document rankings (by raw length,
    //    by distinct-word count — both tie-broken on doc_id): the hybrid
    //    lexical+vector retrieval combiner, e6 integer reciprocals.
    QueryDef("q_rank_fusion",
      (s, d) => {
        val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
        val byLen = docs.select(col("doc_id").as("id"),
          row_number().over(
            Window.orderBy(length(col("text")).desc, col("doc_id"))).as("rank"))
        val byVocab = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("doc_id")).agg(countDistinct(col("w")).as("nw"))
          .select(col("doc_id").as("id"), row_number().over(
            Window.orderBy(col("nw").desc, col("doc_id"))).as("rank"))
        Ranking.rrf(Seq(byLen, byVocab), 60L)
      },
      Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
             |r1 AS (SELECT doc_id AS id,
             |              row_number() OVER (ORDER BY length(text) DESC, doc_id) AS rank
             |       FROM d),
             |v AS (SELECT doc_id, count(DISTINCT wd) AS nw
             |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM d) u
             |      WHERE wd <> '' GROUP BY doc_id),
             |r2 AS (SELECT doc_id AS id,
             |              row_number() OVER (ORDER BY nw DESC, doc_id) AS rank
             |       FROM v),
             |c AS (SELECT id, 1000000 // (60 + rank) AS c FROM r1
             |      UNION ALL SELECT id, 1000000 // (60 + rank) FROM r2)
             |SELECT id, CAST(sum(c) AS BIGINT) AS score_e6,
             |       CAST(count(*) AS BIGINT) AS n_lists
             |FROM c GROUP BY id""".stripMargin)),

    // ── Interval-union coverage: every event opens a 30-minute exposure
    //    window; per type, merged segment count and covered seconds.
    QueryDef("q_interval_coverage",
      (s, d) => IntervalJoin.coverage(
        Tables.events(s, d)
          .withColumn("t_s", expr("unix_micros(ts) div 1000000"))
          .select(col("event_type"), col("t_s").as("s0"),
            (col("t_s") + 1800L).as("e0")),
        "event_type", "s0", "e0"),
      Some("""WITH iv AS (SELECT event_type AS key,
             |                  epoch_us(ts) // 1000000 AS s,
             |                  epoch_us(ts) // 1000000 + 1800 AS e
             |           FROM events),
             |w AS (SELECT key, s, e,
             |             max(e) OVER (PARTITION BY key ORDER BY s, e
             |                          ROWS BETWEEN UNBOUNDED PRECEDING
             |                          AND 1 PRECEDING) AS prev_max
             |      FROM iv),
             |f AS (SELECT key, s, e,
             |             CASE WHEN prev_max IS NULL OR s > prev_max
             |                  THEN 1 ELSE 0 END AS brk
             |      FROM w),
             |g AS (SELECT key, s, e,
             |             sum(brk) OVER (PARTITION BY key ORDER BY s, e
             |                            ROWS UNBOUNDED PRECEDING) AS seg
             |      FROM f),
             |seg AS (SELECT key, seg, min(s) AS seg_s, max(e) AS seg_e,
             |               count(*) AS n_iv
             |        FROM g GROUP BY key, seg)
             |SELECT key, CAST(count(*) AS BIGINT) AS n_segments,
             |       CAST(sum(n_iv) AS BIGINT) AS n_intervals,
             |       CAST(sum(seg_e - seg_s) AS BIGINT) AS covered
             |FROM seg GROUP BY key""".stripMargin)),

    // ── Nearest-event join: sampled probes (event_id % 100 = 0) matched
    //    to the closest other event of the same type in EITHER direction;
    //    the oracle does the quadratic argmin the window trick avoids.
    QueryDef("q_nearest_event",
      (s, d) => {
        val ev = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
        TimeSeries.nearestEvent(
          ev.filter(col("event_id") % 100 === 0),
          ev.filter(col("event_id") % 100 =!= 0),
          "event_type", "t_us", "event_id")
      },
      Some("""WITH e AS (SELECT event_type AS key, epoch_us(ts) AS t,
             |                 event_id AS id FROM events),
             |l AS (SELECT * FROM e WHERE id % 100 = 0),
             |r AS (SELECT * FROM e WHERE id % 100 <> 0),
             |j AS (SELECT l.key, l.id AS left_id, r.id AS rid,
             |             abs(r.t - l.t) AS dist, r.t AS rt
             |      FROM l LEFT JOIN r ON r.key = l.key),
             |p AS (SELECT key, left_id, rid, dist,
             |             row_number() OVER (PARTITION BY key, left_id
             |                                ORDER BY dist, rt, rid) AS pk
             |      FROM j)
             |SELECT key, left_id, rid AS right_id, CAST(dist AS BIGINT) AS gap
             |FROM p WHERE pk = 1""".stripMargin)),

    // ── NDCG@10 per priority class: price ranking scored against the
    //    synthetic relevance o_orderkey % 4 with the portable fixed-point
    //    log₂ discount — the ranking-eval loop of a retrieval pipeline.
    QueryDef("q_ndcg",
      (s, d) => Ranking.ndcgAtK(
        Tables.orders(s, d).select(col("o_orderpriority").as("g"),
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("o_orderpriority"))
              .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("long").as("rank"),
          (col("o_orderkey") % 4).as("rel")),
        "g", "rank", "rel", 10),
      Some(s"""WITH r AS (SELECT o_orderpriority AS g,
             |                  CAST(row_number() OVER (PARTITION BY o_orderpriority
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
             |                  CAST(o_orderkey % 4 AS BIGINT) AS rel
             |           FROM orders),
             |i AS (SELECT g, rank, rel,
             |             CAST(row_number() OVER (PARTITION BY g
             |                  ORDER BY rel DESC, rank) AS BIGINT) AS irank
             |      FROM r),
             |c AS (SELECT g,
             |        CASE WHEN rank <= 10 THEN (rel * 1000000000000)
             |             // ${Bm25.log2E6Sql("(rank + 1)")} ELSE 0 END AS cp,
             |        CASE WHEN irank <= 10 THEN (rel * 1000000000000)
             |             // ${Bm25.log2E6Sql("(irank + 1)")} ELSE 0 END AS ci
             |      FROM i)
             |SELECT g, CAST(sum(cp) AS BIGINT) AS dcg_e6,
             |       CAST(sum(ci) AS BIGINT) AS idcg_e6,
             |       CAST(sum(cp) * 1000000 // nullif(sum(ci), 0) AS BIGINT) AS ndcg_e6
             |FROM c GROUP BY g""".stripMargin))
  )
}
