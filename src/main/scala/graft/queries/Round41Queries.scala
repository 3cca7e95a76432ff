package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-41 batch: two synchronous perceptron training rounds (the
  * integer-exact linear-classifier counterpart of q_naive_bayes /
  * q_knn_classify), reciprocal-best-match entity linking over the
  * embeddings folds, the event-time disorder (lateness) histogram that
  * quantifies what q_watermark_audit adjudicates, and the
  * Wald–Wolfowitz runs test on the daily delta signs.
  */
object Round41Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Two synchronous perceptron rounds on document features
    //    (bias, n_chars, space count), label +1 ⇔ lang = 'en'. Round 1
    //    starts from w = 0 (every margin 0 ⇒ every row updates, so w₁ is
    //    ONE aggregate); round 2 updates on rows w₁ misclassifies.
    //    Batch-synchronous = order-free = exactly reproducible — the
    //    only perceptron a distributed engine should promise.
    QueryDef("q_perceptron",
      (s, d) => {
        val base = Tables.documents(s, d).select(
            when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
            lit(1L).as("x1"), col("n_chars").as("x2"),
            (length(col("text")) -
              length(regexp_replace(col("text"), " ", "")))
              .cast("long").as("x3"))
          .localCheckpoint(false) // one scan feeds both rounds
        val w1 = base.agg(count(lit(1)).as("n_upd"),
          sum(col("y") * col("x1")).as("w1b"),
          sum(col("y") * col("x2")).as("w1c"),
          sum(col("y") * col("x3")).as("w1s"))
        val r2 = base.join(broadcast(w1))
          .filter(col("y") * (col("w1b") * col("x1") + col("w1c") * col("x2")
            + col("w1s") * col("x3")) <= 0)
          .agg(count(lit(1)).as("n_upd2"),
            (max(col("w1b")) + sum(col("y") * col("x1"))).as("w2b"),
            (max(col("w1c")) + sum(col("y") * col("x2"))).as("w2c"),
            (max(col("w1s")) + sum(col("y") * col("x3"))).as("w2s"))
        w1.select(lit(1L).as("round"), col("n_upd"), col("w1b").as("w_bias"),
            col("w1c").as("w_chars"), col("w1s").as("w_spaces"))
          .unionAll(r2.select(lit(2L).as("round"), col("n_upd2").as("n_upd"),
            col("w2b").as("w_bias"), col("w2c").as("w_chars"),
            col("w2s").as("w_spaces")))
      },
      Some("""WITH base AS (
             |  SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
             |         CAST(1 AS BIGINT) AS x1, n_chars AS x2,
             |         CAST(length(text) - length(replace(text, ' ', ''))
             |              AS BIGINT) AS x3
             |  FROM documents),
             |w1 AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_upd,
             |         CAST(sum(y * x1) AS BIGINT) AS w1b,
             |         CAST(sum(y * x2) AS BIGINT) AS w1c,
             |         CAST(sum(y * x3) AS BIGINT) AS w1s
             |  FROM base),
             |r2 AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_upd,
             |         CAST(max(w1b) + sum(y * x1) AS BIGINT) AS w2b,
             |         CAST(max(w1c) + sum(y * x2) AS BIGINT) AS w2c,
             |         CAST(max(w1s) + sum(y * x3) AS BIGINT) AS w2s
             |  FROM base CROSS JOIN w1
             |  WHERE y * (w1b * x1 + w1c * x2 + w1s * x3) <= 0)
             |SELECT 1 AS round, n_upd, w1b AS w_bias, w1c AS w_chars,
             |       w1s AS w_spaces FROM w1
             |UNION ALL
             |SELECT 2 AS round, n_upd, w2b, w2c, w2s FROM r2""".stripMargin)),

    // ── Reciprocal best match between embedding folds 0 and 1 (the
    //    mutual-nearest-neighbor entity-linking rule): keep (a, b) only
    //    when b is a's exact-L2 argmin AND a is b's. Distances are the
    //    repo-standard e6-quantized exact integer squared L2; fold 1
    //    broadcasts (the smaller linking side), fold 0 never shuffles
    //    until the two argmin windows.
    QueryDef("q_reciprocal_best",
      (s, d) => {
        val q = Tables.embeddings(s, d).select(col("vec_id"),
          expr("""transform(CAST(embedding AS ARRAY<DOUBLE>),
                 |x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))
                 |""".stripMargin).as("qv"))
        val width = s.sessionState.conf.numShufflePartitions
        val a = q.filter(col("vec_id") % 5 === 0)
          .select(col("vec_id").as("a_id"), col("qv").as("av"))
          .repartition(width)
        val b = q.filter(col("vec_id") % 5 === 1)
          .select(col("vec_id").as("b_id"), col("qv").as("bv"))
        val pairs = a.crossJoin(broadcast(b))
          .select(col("a_id"), col("b_id"),
            expr("""aggregate(zip_with(av, bv, (x, y) -> (x - y) * (x - y)),
                   |0L, (acc, v) -> acc + v)""".stripMargin).as("d2_e12"))
          .localCheckpoint(false) // both argmin windows read ONE pair scan
        val bestA = pairs.withColumn("rk", row_number().over(
            Window.partitionBy(col("a_id"))
              .orderBy(col("d2_e12"), col("b_id"))))
          .filter(col("rk") === 1).drop("rk")
        val bestB = pairs.withColumn("rk", row_number().over(
            Window.partitionBy(col("b_id"))
              .orderBy(col("d2_e12"), col("a_id"))))
          .filter(col("rk") === 1).select(col("a_id"), col("b_id"))
        bestA.join(bestB, Seq("a_id", "b_id"))
          .select(col("a_id"), col("b_id"), col("d2_e12"))
      },
      Some("""WITH q AS MATERIALIZED (
             |  SELECT vec_id,
             |         list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
             |  FROM embeddings),
             |pairs AS MATERIALIZED (
             |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |         list_sum(list_transform(generate_series(1, len(a.qv)),
             |           i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
             |           AS d2_e12
             |  FROM q a JOIN q b
             |    ON a.vec_id % 5 = 0 AND b.vec_id % 5 = 1),
             |ba AS (SELECT a_id, b_id, d2_e12 FROM (
             |         SELECT a_id, b_id, d2_e12, row_number() OVER
             |           (PARTITION BY a_id ORDER BY d2_e12, b_id) AS rk
             |         FROM pairs) WHERE rk = 1),
             |bb AS (SELECT a_id, b_id FROM (
             |         SELECT a_id, b_id, row_number() OVER
             |           (PARTITION BY b_id ORDER BY d2_e12, a_id) AS rk
             |         FROM pairs) WHERE rk = 1)
             |SELECT ba.a_id, ba.b_id, CAST(ba.d2_e12 AS BIGINT) AS d2_e12
             |FROM ba JOIN bb ON ba.a_id = bb.a_id AND ba.b_id = bb.b_id
             |""".stripMargin)),

    // ── Event-time disorder histogram: lateness = running-max event
    //    time in ARRIVAL order minus own event time, banded per type.
    //    The shared events table is perfectly time-sorted (zero native
    //    disorder — verified), so arrival order models a jittering
    //    producer deterministically: each event arrives at
    //    t + hash(event_id) mod 600 seconds (a Knuth multiplicative
    //    hash — portable integer arithmetic on both engines). The
    //    distribution behind any watermark choice (q_watermark_audit
    //    answers for ONE delay; this shows the whole curve). One keyed
    //    window + one tiny aggregate.
    QueryDef("q_lateness_histogram",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"), col("event_id"),
            unix_micros(col("ts")).as("t"))
          .withColumn("arr",
            expr("t + (event_id * 2654435761 % 600) * 1000000"))
          .withColumn("late_s",
            expr("(max(t) OVER (PARTITION BY event_type "
              + "ORDER BY arr, event_id "
              + "ROWS UNBOUNDED PRECEDING) - t) div 1000000"))
          .withColumn("band",
            when(col("late_s") === 0, "0_ontime")
              .when(col("late_s") <= 60, "1_le_1m")
              .when(col("late_s") <= 300, "2_le_5m")
              .when(col("late_s") <= 600, "3_le_10m")
              .when(col("late_s") <= 1800, "4_le_30m")
              .otherwise("5_gt_30m"))
          .groupBy(col("event_type"), col("band"))
          .agg(count(lit(1)).as("cnt"), max(col("late_s")).as("max_late_s"))
      },
      Some("""WITH a AS (
             |  SELECT event_type, event_id, epoch_us(ts) AS t,
             |         epoch_us(ts) + (event_id * 2654435761 % 600) * 1000000
             |           AS arr
             |  FROM events),
             |l AS (
             |  SELECT event_type,
             |         (max(t) OVER (PARTITION BY event_type
             |            ORDER BY arr, event_id ROWS UNBOUNDED PRECEDING)
             |          - t) // 1000000 AS late_s
             |  FROM a),
             |b AS (
             |  SELECT event_type, late_s,
             |         CASE WHEN late_s = 0 THEN '0_ontime'
             |              WHEN late_s <= 60 THEN '1_le_1m'
             |              WHEN late_s <= 300 THEN '2_le_5m'
             |              WHEN late_s <= 600 THEN '3_le_10m'
             |              WHEN late_s <= 1800 THEN '4_le_30m'
             |              ELSE '5_gt_30m' END AS band
             |  FROM l)
             |SELECT event_type, band, CAST(count(*) AS BIGINT) AS cnt,
             |       CAST(max(late_s) AS BIGINT) AS max_late_s
             |FROM b GROUP BY 1, 2""".stripMargin)),

    // ── Wald–Wolfowitz runs test on the SIGN of day-over-day delta of
    //    each type's daily count series (zero deltas dropped, standard
    //    practice): observed runs vs the exact expected-runs formula
    //    1 + 2·n₊·n₋/(n₊+n₋) in e6. Randomness check of the daily
    //    series — pairs with q_mann_kendall (monotone trend) and
    //    q_burstiness (dispersion).
    QueryDef("q_runs_test",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type").as("k"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val wd = Window.partitionBy(col("k")).orderBy(col("day"))
        val signs = daily
          .withColumn("delta", col("c") - lag(col("c"), 1).over(wd))
          .filter(col("delta").isNotNull && col("delta") =!= 0)
          .withColumn("sgn", when(col("delta") > 0, 1L).otherwise(-1L))
        val ws = Window.partitionBy(col("k")).orderBy(col("day"))
        signs
          .withColumn("chg",
            when(lag(col("sgn"), 1).over(ws).isNull ||
              lag(col("sgn"), 1).over(ws) =!= col("sgn"), 1L).otherwise(0L))
          .groupBy(col("k"))
          .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_plus"),
            sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_minus"),
            sum(col("chg")).as("runs"))
          .withColumn("exp_runs_e6",
            expr("1000000 + (2 * n_plus * n_minus * 1000000) "
              + "div (n_plus + n_minus)"))
      },
      Some("""WITH daily AS (
             |  SELECT event_type AS k, epoch_us(ts) // 86400000000 AS day,
             |         count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |d AS (
             |  SELECT k, day, c - lag(c) OVER (PARTITION BY k ORDER BY day)
             |           AS delta
             |  FROM daily),
             |s AS (
             |  SELECT k, day, CASE WHEN delta > 0 THEN 1 ELSE -1 END AS sgn
             |  FROM d WHERE delta IS NOT NULL AND delta <> 0),
             |c AS (
             |  SELECT k, sgn,
             |         CASE WHEN lag(sgn) OVER (PARTITION BY k ORDER BY day)
             |                IS DISTINCT FROM sgn THEN 1 ELSE 0 END AS chg
             |  FROM s),
             |g AS (
             |  SELECT k,
             |         sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS n_plus,
             |         sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS n_minus,
             |         sum(chg) AS runs
             |  FROM c GROUP BY 1)
             |SELECT k, CAST(n_plus AS BIGINT) AS n_plus,
             |       CAST(n_minus AS BIGINT) AS n_minus,
             |       CAST(runs AS BIGINT) AS runs,
             |       CAST(1000000 + (2 * n_plus * n_minus * 1000000)
             |            // (n_plus + n_minus) AS BIGINT) AS exp_runs_e6
             |FROM g""".stripMargin))
  )
}
