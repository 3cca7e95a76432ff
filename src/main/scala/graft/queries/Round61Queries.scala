package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-61 batch: CDC replay with delete tombstones (the
  * insert/update/delete log-application semantics q_upsert_merge's
  * monotonic guard does not cover), a point-in-time feature join with a
  * staleness cap (the leak-free training-set constructor — as-of
  * semantics per label event), and a label-leakage audit (counting
  * feature rows whose REAL availability postdates the label they'd
  * train against — the PIT violation detector).
  */
object Round61Queries {

  private val hourUs = 3600000000L
  private val dayUs = 86400000000L

  def defs: Seq[QueryDef] = Seq(

    // ── CDC replay: op stream keyed by user bucket, every 10th event a
    //    DELETE tombstone, last-writer-wins on (ts, event_id).
    QueryDef("q_cdc_replay",
      (s, d) => {
        val log = Tables.events(s, d).select(
          (col("user_id") % 200).as("k"),
          expr("unix_micros(ts)").as("t"), col("event_id").as("eid"),
          when(col("event_id") % 10 === 0, "D").otherwise("U").as("op"),
          floor(col("value") * 100 + 0.5).cast("long").as("v"))
        val w = Window.partitionBy(col("k"))
        log
          .withColumn("rn", row_number().over(
            w.orderBy(col("t").desc, col("eid").desc)))
          .withColumn("n_ops", count(lit(1)).over(w))
          .withColumn("n_deletes",
            sum(when(col("op") === "D", 1L).otherwise(0L)).over(w))
          .where(col("rn") === 1 && col("op") =!= "D")
          .select(col("k"), col("n_ops"), col("n_deletes"),
            col("v").as("final_cents"), col("eid").as("last_eid"))
      },
      Some("""WITH log AS (
             |  SELECT user_id % 200 AS k, epoch_us(ts) AS t,
             |         event_id AS eid,
             |         CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events),
             |wnd AS (
             |  SELECT *, row_number() OVER (PARTITION BY k
             |           ORDER BY t DESC, eid DESC) AS rn,
             |         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n_ops,
             |         CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
             |           OVER (PARTITION BY k) AS BIGINT) AS n_deletes
             |  FROM log)
             |SELECT k, n_ops, n_deletes, v AS final_cents, eid AS last_eid
             |FROM wnd WHERE rn = 1 AND op <> 'D'""".stripMargin)),

    // ── PIT features: for each label event (every 17th), the latest
    //    NON-label event's value/type at-or-before the label time, with
    //    a 7-day freshness verdict. One user-keyed window — no join.
    QueryDef("q_pit_features",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id").as("u"),
          expr("unix_micros(ts)").as("t"), col("event_id").as("eid"),
          col("event_type").as("et"),
          floor(col("value") * 100 + 0.5).cast("long").as("v"))
        val uni = ev.where(col("eid") % 17 =!= 0)
          .select(col("u"), col("t"), lit(0L).as("kind"), col("eid"),
            col("v"), col("et"))
          .unionByName(ev.where(col("eid") % 17 === 0)
            .select(col("u"), col("t"), lit(1L).as("kind"), col("eid"),
              lit(null).cast("long").as("v"),
              lit(null).cast("string").as("et")))
        val w = Window.partitionBy(col("u"))
          .orderBy(col("t"), col("kind"), col("eid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        uni
          .withColumn("fv", last(col("v"), ignoreNulls = true).over(w))
          .withColumn("ftt", last(when(col("v").isNotNull, col("t")),
            ignoreNulls = true).over(w))
          .withColumn("fet", last(when(col("v").isNotNull, col("et")),
            ignoreNulls = true).over(w))
          .where(col("kind") === 1L)
          .select(col("u"), col("t").as("label_t_us"), col("eid").as("lid"),
            col("fv").as("feat_cents"), col("fet").as("feat_type"),
            when(col("ftt").isNull, lit(null).cast("boolean"))
              .otherwise(col("t") - col("ftt") <= lit(7L * dayUs))
              .as("fresh"))
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
              |         event_type AS et,
              |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
              |  FROM events),
              |uni AS (
              |  SELECT u, t, 0 AS kind, eid, v, et FROM ev
              |  WHERE eid % 17 <> 0
              |  UNION ALL
              |  SELECT u, t, 1, eid, NULL, NULL FROM ev WHERE eid % 17 = 0),
              |wnd AS (
              |  SELECT u, t, kind, eid,
              |         last_value(v IGNORE NULLS) OVER w AS fv,
              |         last_value(CASE WHEN v IS NOT NULL THEN t END
              |           IGNORE NULLS) OVER w AS ftt,
              |         last_value(CASE WHEN v IS NOT NULL THEN et END
              |           IGNORE NULLS) OVER w AS fet
              |  FROM uni
              |  WINDOW w AS (PARTITION BY u ORDER BY t, kind, eid
              |               ROWS UNBOUNDED PRECEDING))
              |SELECT u, t AS label_t_us, eid AS lid, fv AS feat_cents,
              |       fet AS feat_type,
              |       CASE WHEN ftt IS NULL THEN NULL
              |            ELSE t - ftt <= ${7L * dayUs} END AS fresh
              |FROM wnd WHERE kind = 1""".stripMargin)),

    // ── Leakage audit: features carry a snapshot time skewed ±1h from
    //    the real event time; count candidate features in each label's
    //    24h lookback whose REAL time postdates the label. The Spark
    //    side runs the (user, day)-bucketed join — same semantics as
    //    the oracle's range join, but shuffle-bounded at scale.
    QueryDef("q_leakage_audit",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id").as("u"),
          expr("unix_micros(ts)").as("t"), col("event_id").as("eid"),
          col("event_type").as("et"))
        val feats = ev.where(col("eid") % 17 =!= 0)
          .select(col("u"), col("t"),
            (col("t") + (col("eid") % 3 - 1) * hourUs).as("snap"))
          .withColumn("bd", expr(s"snap div $dayUs"))
        val labs = ev.where(col("eid") % 17 === 0)
          .select(col("u"), col("t").as("lt"), col("et").as("let"))
          .localCheckpoint(false) // reused: label counts + pair join
        val lb = labs.withColumn("ld", expr(s"lt div $dayUs"))
          .withColumn("bd", explode(array(col("ld") - 1, col("ld"))))
        val pairs = feats.join(lb, Seq("u", "bd"))
          .where(col("snap") > col("lt") - dayUs && col("snap") <= col("lt"))
          .groupBy(col("let"))
          .agg(count(lit(1)).as("n_used"),
            sum(when(col("t") > col("lt"), 1L).otherwise(0L)).as("n_leaked"))
        labs.groupBy(col("let")).agg(count(lit(1)).as("n_labels"))
          .join(pairs, Seq("let"), "left")
          .selectExpr("let AS label_type", "n_labels",
            "coalesce(n_used, CAST(0 AS BIGINT)) AS n_used",
            "coalesce(n_leaked, CAST(0 AS BIGINT)) AS n_leaked",
            """CASE WHEN coalesce(n_used, CAST(0 AS BIGINT)) = 0 THEN 0
              |     ELSE n_leaked * 1000000 div n_used
              |END AS leak_e6""".stripMargin)
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id AS u, epoch_us(ts) AS t, event_id AS eid,
              |         event_type AS et
              |  FROM events),
              |feats AS (SELECT u, t, t + (eid % 3 - 1) * $hourUs AS snap
              |          FROM ev WHERE eid % 17 <> 0),
              |labs AS (SELECT u, t AS lt, et AS let FROM ev
              |         WHERE eid % 17 = 0),
              |pairs AS (
              |  SELECT let, CAST(count(*) AS BIGINT) AS n_used,
              |         CAST(sum(CASE WHEN f.t > lt THEN 1 ELSE 0 END)
              |           AS BIGINT) AS n_leaked
              |  FROM feats f JOIN labs ON f.u = labs.u
              |    AND f.snap > lt - $dayUs AND f.snap <= lt
              |  GROUP BY 1),
              |lc AS (SELECT let, CAST(count(*) AS BIGINT) AS n_labels
              |       FROM labs GROUP BY 1)
              |SELECT lc.let AS label_type, n_labels,
              |       coalesce(n_used, 0) AS n_used,
              |       coalesce(n_leaked, 0) AS n_leaked,
              |       CASE WHEN coalesce(n_used, 0) = 0 THEN 0
              |            ELSE n_leaked * 1000000 // n_used END AS leak_e6
              |FROM lc LEFT JOIN pairs ON lc.let = pairs.let"""
        .stripMargin))
  )
}
