package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-103 batch: probabilistic-classifier evaluation — Brier score,
  * Youden-optimal ROC threshold, and expected calibration error — over
  * a deterministic binned-frequency model (train-split bucket rates
  * predict purchase; no logistic fit, so everything stays integer-exact
  * and oracle-portable).
  *
  * Shared model at (user, week) grain — per-user "ever purchased" is
  * ~1 everywhere (degenerate calibration), while weekly purchase
  * propensity spans 0.67→1.0 across activity buckets: activity =
  * events that week (feature), y = purchased that week (label). Train
  * = user_id % 5 < 4; the capped activity bucket's train purchase-rate
  * (e6) is the predicted probability.
  */
object Round103Queries {

  private val userSql =
    """SELECT user_id, epoch_us(ts) // 604800000000 AS wk,
      |       CAST(count(*) AS BIGINT) AS activity,
      |       max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |FROM events GROUP BY 1, 2""".stripMargin

  private def users(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(col("user_id"), expr("unix_micros(ts) div 604800000000").as("wk"))
      .agg(count(lit(1)).as("activity"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))

  def defs: Seq[QueryDef] = Seq(

    // ── Brier score: mean squared error of the predicted probability
    //    vs the binary outcome, on the held-out fifth. Buckets capped
    //    (activity div 3, max 9) so the model frame is ≤10 rows and
    //    broadcasts; unseen buckets fall back to the global train rate.
    QueryDef("q_brier",
      (s, d) => {
        val u = users(s, d)
          .withColumn("bucket", expr("least(activity div 3, 9L)"))
          .localCheckpoint(false) // train rates + test scoring reuse it
        val train = u.where(expr("user_id % 5 < 4"))
        val rates = train.groupBy(col("bucket"))
          .agg(expr("sum(y) * 1000000 div count(*)").as("p_e6"))
        val fallback = train.agg(
          expr("sum(y) * 1000000 div count(*)").as("p0_e6"))
        u.where(expr("user_id % 5 = 4"))
          .join(broadcast(rates), Seq("bucket"), "left")
          .crossJoin(broadcast(fallback))
          .withColumn("p", coalesce(col("p_e6"), col("p0_e6")))
          .agg(count(lit(1)).as("n_test"),
            expr("sum((p - y * 1000000) * (p - y * 1000000))").as("se"))
          .selectExpr("CAST(n_test AS BIGINT) AS n_test",
            "se div n_test AS brier_e12")
      },
      Some(s"""WITH u AS ($userSql),
              |b AS (SELECT user_id, y, least(activity // 3, 9) AS bucket
              |      FROM u),
              |rates AS (SELECT bucket,
              |                 CAST(sum(y) AS BIGINT) * 1000000 // count(*)
              |                   AS p_e6
              |          FROM b WHERE user_id % 5 < 4 GROUP BY 1),
              |fb AS (SELECT CAST(sum(y) AS BIGINT) * 1000000 // count(*)
              |                AS p0_e6
              |       FROM b WHERE user_id % 5 < 4)
              |SELECT CAST(count(*) AS BIGINT) AS n_test,
              |       CAST(sum((coalesce(p_e6, p0_e6) - y * 1000000)
              |                * (coalesce(p_e6, p0_e6) - y * 1000000))
              |         AS BIGINT) // count(*) AS brier_e12
              |FROM b LEFT JOIN rates USING (bucket) CROSS JOIN fb
              |WHERE user_id % 5 = 4""".stripMargin)),

    // ── Youden-optimal threshold: score = clicks that week; classify
    //    "will purchase this week" positive at s ≥ t. Cumulative TP/FP
    //    down the descending score axis (bounded: distinct weekly click
    //    counts), J = TPR − FPR (subtraction of exact e6 ratios — no
    //    negative division). Weekly grain keeps both classes populated.
    QueryDef("q_youden",
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
          .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicks"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        val byScore = u.groupBy(col("clicks"))
          .agg(sum(col("y")).as("pos"),
            sum(lit(1L) - col("y")).as("neg"))
          .localCheckpoint(false) // axis + totals
        val tot = byScore.agg(sum(col("pos")).as("tp_all"),
          sum(col("neg")).as("fp_all"))
        val ord = Window.orderBy(col("clicks").desc)
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        byScore.crossJoin(broadcast(tot))
          .withColumn("tp", sum(col("pos")).over(cum))
          .withColumn("fp", sum(col("neg")).over(cum))
          .withColumn("tpr_e6", expr("tp * 1000000 div greatest(tp_all, 1)"))
          .withColumn("fpr_e6", expr("fp * 1000000 div greatest(fp_all, 1)"))
          .withColumn("j_e6", col("tpr_e6") - col("fpr_e6"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("j_e6").desc, col("clicks"))))
          .where(col("rk") === 1)
          .select(col("clicks").as("threshold"), col("tp"), col("fp"),
            col("tpr_e6"), col("fpr_e6"), col("j_e6"))
      },
      Some("""WITH u AS (SELECT user_id,
             |                  epoch_us(ts) // 604800000000 AS wk,
             |                  CAST(sum(CASE WHEN event_type = 'click'
             |                    THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
             |                  max(CASE WHEN event_type = 'purchase'
             |                    THEN 1 ELSE 0 END) AS y
             |           FROM events GROUP BY 1, 2),
             |s AS (SELECT clicks, CAST(sum(y) AS BIGINT) AS pos,
             |             CAST(sum(1 - y) AS BIGINT) AS neg
             |      FROM u GROUP BY 1),
             |t AS (SELECT CAST(sum(pos) AS BIGINT) AS tp_all,
             |             CAST(sum(neg) AS BIGINT) AS fp_all FROM s),
             |c AS (SELECT clicks,
             |             CAST(sum(pos) OVER (ORDER BY clicks DESC
             |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
             |             CAST(sum(neg) OVER (ORDER BY clicks DESC
             |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp,
             |             tp_all, fp_all
             |      FROM s CROSS JOIN t),
             |j AS (SELECT clicks, tp, fp,
             |             tp * 1000000 // greatest(tp_all, 1) AS tpr_e6,
             |             fp * 1000000 // greatest(fp_all, 1) AS fpr_e6,
             |             tp * 1000000 // greatest(tp_all, 1)
             |               - fp * 1000000 // greatest(fp_all, 1) AS j_e6
             |      FROM c)
             |SELECT clicks AS threshold, tp, fp, tpr_e6, fpr_e6, j_e6
             |FROM (SELECT *, row_number() OVER (ORDER BY j_e6 DESC, clicks)
             |        AS rk FROM j)
             |WHERE rk = 1""".stripMargin)),

    // ── Expected calibration error: test predictions binned by
    //    confidence decile; per bin |accuracy − confidence|, weighted
    //    by bin mass. The reliability-diagram table + the ECE scalar
    //    (window total over the ≤10-bin axis) in one result.
    QueryDef("q_ece",
      (s, d) => {
        val u = users(s, d)
          .withColumn("bucket", expr("least(activity div 3, 9L)"))
          .localCheckpoint(false)
        val train = u.where(expr("user_id % 5 < 4"))
        val rates = train.groupBy(col("bucket"))
          .agg(expr("sum(y) * 1000000 div count(*)").as("p_e6"))
        val fallback = train.agg(
          expr("sum(y) * 1000000 div count(*)").as("p0_e6"))
        val bins = u.where(expr("user_id % 5 = 4"))
          .join(broadcast(rates), Seq("bucket"), "left")
          .crossJoin(broadcast(fallback))
          .withColumn("p", coalesce(col("p_e6"), col("p0_e6")))
          .groupBy(expr("least(p div 100000, 9L)").as("bin"))
          .agg(count(lit(1)).as("n_b"),
            expr("sum(p) div count(*)").as("conf_e6"),
            expr("sum(y) * 1000000 div count(*)").as("acc_e6"))
        val all = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        bins
          .withColumn("n", sum(col("n_b")).over(all))
          .withColumn("wsum",
            sum(expr("n_b * abs(acc_e6 - conf_e6)")).over(all))
          .selectExpr("bin", "n_b", "conf_e6", "acc_e6",
            "wsum div n AS ece_e6")
      },
      Some(s"""WITH u AS ($userSql),
              |b AS (SELECT user_id, y, least(activity // 3, 9) AS bucket
              |      FROM u),
              |rates AS (SELECT bucket,
              |                 CAST(sum(y) AS BIGINT) * 1000000 // count(*)
              |                   AS p_e6
              |          FROM b WHERE user_id % 5 < 4 GROUP BY 1),
              |fb AS (SELECT CAST(sum(y) AS BIGINT) * 1000000 // count(*)
              |                AS p0_e6
              |       FROM b WHERE user_id % 5 < 4),
              |te AS (SELECT y, coalesce(p_e6, p0_e6) AS p
              |       FROM b LEFT JOIN rates USING (bucket) CROSS JOIN fb
              |       WHERE user_id % 5 = 4),
              |bins AS (SELECT least(p // 100000, 9) AS bin,
              |                CAST(count(*) AS BIGINT) AS n_b,
              |                CAST(sum(p) AS BIGINT) // count(*) AS conf_e6,
              |                CAST(sum(y) AS BIGINT) * 1000000 // count(*)
              |                  AS acc_e6
              |         FROM te GROUP BY 1)
              |SELECT bin, n_b, conf_e6, acc_e6,
              |       CAST(sum(n_b * abs(acc_e6 - conf_e6)) OVER ()
              |         // sum(n_b) OVER () AS BIGINT) AS ece_e6
              |FROM bins""".stripMargin))
  )
}
