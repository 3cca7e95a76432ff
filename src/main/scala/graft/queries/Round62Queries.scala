package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-62 batch: sample-ratio-mismatch check (the assignment-health
  * gate that must pass before q_ab_test's outcome read means anything),
  * autocomplete prefix top-k (the search-suggest ranking primitive),
  * and seasonal anomaly detection (day-of-week × hour baseline, MAD
  * residual gate — the calendar-aware complement of q_anomaly_zscore /
  * q_volume_anomaly).
  */
object Round62Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── SRM: per experiment (event type), distinct users split by
    //    u % 2 should be 50/50; 1-dof chi-square entirely in integers,
    //    flagged at 3.84 (α = .05) via cross-multiplication.
    QueryDef("q_srm_check",
      (s, d) => Tables.events(s, d)
        .select(col("event_type").as("exp_id"), col("user_id").as("u"))
        .distinct()
        .groupBy(col("exp_id"))
        .agg(sum(when(col("u") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("u") % 2 =!= 0, 1L).otherwise(0L)).as("n_b"))
        .selectExpr("exp_id", "n_a", "n_b",
          "(n_a - n_b) * (n_a - n_b) * 1000000 div (n_a + n_b) AS chi2_e6",
          "(n_a - n_b) * (n_a - n_b) * 100 > 384 * (n_a + n_b) AS srm"),
      Some("""WITH units AS (SELECT DISTINCT event_type AS exp_id,
             |                      user_id AS u FROM events),
             |c AS (SELECT exp_id,
             |             CAST(sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n_a,
             |             CAST(sum(CASE WHEN u % 2 <> 0 THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n_b
             |      FROM units GROUP BY 1)
             |SELECT exp_id, n_a, n_b,
             |       (n_a - n_b) * (n_a - n_b) * 1000000 // (n_a + n_b)
             |         AS chi2_e6,
             |       (n_a - n_b) * (n_a - n_b) * 100 > 384 * (n_a + n_b)
             |         AS srm
             |FROM c""".stripMargin)),

    // ── Autocomplete: 3-char prefix of the first word of part names,
    //    top-3 completions by frequency (count desc, word asc).
    QueryDef("q_autocomplete_topk",
      (s, d) => {
        val words = Tables.part(s, d)
          .select(split(col("p_name"), " ").getItem(0).as("word"))
          .where(length(col("word")) >= 3)
        words.groupBy(substring(col("word"), 1, 3).as("prefix"),
            col("word"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("prefix"))
              .orderBy(col("cnt").desc, col("word"))).cast("long"))
          .where(col("rk") <= 3)
      },
      Some("""WITH words AS (
             |  SELECT string_split(p_name, ' ')[1] AS word FROM part
             |  WHERE length(string_split(p_name, ' ')[1]) >= 3),
             |c AS (SELECT substr(word, 1, 3) AS prefix, word,
             |             CAST(count(*) AS BIGINT) AS cnt
             |      FROM words GROUP BY 1, 2),
             |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY prefix
             |        ORDER BY cnt DESC, word) AS BIGINT) AS rk FROM c)
             |SELECT prefix, word, cnt, rk FROM r WHERE rk <= 3"""
        .stripMargin)),

    // ── Seasonal anomaly: hourly counts vs the (dow × hour) baseline
    //    mean; flag hours whose |residual| exceeds 3×MAD. All integer —
    //    truncating means, exact median-of-|residual| by position.
    QueryDef("q_seasonal_anomaly",
      (s, d) => {
        val cnt = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(col("h")).agg(count(lit(1)).as("c"))
          .withColumn("dow", expr("(h div 24 + 4) % 7"))
          .withColumn("hod", expr("h % 24"))
        val base = cnt.groupBy(col("dow"), col("hod"))
          .agg(expr("sum(c) div count(1)").as("mean_c"))
        val resid = cnt.join(broadcast(base), Seq("dow", "hod"))
          .withColumn("resid", col("c") - col("mean_c"))
          .localCheckpoint(false) // reused: MAD + anomaly filter
        val mad = resid
          .withColumn("rn", row_number().over(
            Window.orderBy(abs(col("resid")), col("h"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
          .where(col("rn") === expr("(n + 1) div 2"))
          .select(abs(col("resid")).as("mad"))
        resid.crossJoin(broadcast(mad))
          .where(abs(col("resid")) > col("mad") * 3)
          .select(col("h"), col("dow"), col("hod"), col("c"),
            col("mean_c"), col("resid"), col("mad"))
      },
      Some("""WITH cnt AS (
             |  SELECT h, CAST(count(*) AS BIGINT) AS c,
             |         (h // 24 + 4) % 7 AS dow, h % 24 AS hod
             |  FROM (SELECT epoch_us(ts) // 3600000000 AS h FROM events)
             |  GROUP BY 1),
             |base AS (SELECT dow, hod,
             |                CAST(sum(c) // count(*) AS BIGINT) AS mean_c
             |         FROM cnt GROUP BY 1, 2),
             |resid AS (SELECT cnt.h, cnt.dow, cnt.hod, cnt.c, base.mean_c,
             |                 cnt.c - base.mean_c AS resid
             |          FROM cnt JOIN base ON cnt.dow = base.dow
             |               AND cnt.hod = base.hod),
             |mad AS (SELECT abs(resid) AS mad FROM (
             |          SELECT resid,
             |                 row_number() OVER (ORDER BY abs(resid), h)
             |                   AS rn,
             |                 count(*) OVER () AS n
             |          FROM resid)
             |        WHERE rn = (n + 1) // 2)
             |SELECT h, dow, hod, c, mean_c, resid, mad
             |FROM resid CROSS JOIN mad
             |WHERE abs(resid) > mad * 3""".stripMargin))
  )
}
