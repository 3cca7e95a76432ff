package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Sketches, Stats}
import org.apache.spark.sql.functions._

/** Round-152 batch: event-history analysis beyond single-cause
  * survival — Aalen–Johansen competing-risks cumulative incidence
  * (churn split into two exclusive causes; "1 − KM per cause"
  * over-counts, the AJ estimator doesn't), the recurrent-event mean
  * cumulative function (orders per still-observed customer by days
  * since first order — the Nelson–Aalen analogue where subjects stay
  * at risk after each event), and a Lexis surface (event counts and
  * per-cohort rates on the age × period grid — the demographer's view
  * of retention).
  *
  * All-integer: the AJ survival factor reuses the KM e6 log₂/2^(−y)
  * machinery; MCF and Lexis are pure count ratios. Every walk runs on
  * a bounded axis (distinct durations / day offsets / week grid) after
  * one fact-sized aggregate.
  */
object Round152Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Competing risks over customer churn: duration = last−first
    //    order day; churned (global last day − l > 60) splits by the
    //    final order's priority — urgent/high = cause 1, rest cause 2;
    //    still-active customers are censored (0).
    QueryDef("q_competing_risks",
      (s, d) => {
        val od = Tables.orders(s, d)
          .select(col("o_custkey"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
              .as("day"),
            col("o_orderpriority").as("pr"))
        // two orders can share the last day — tie-break on max(pr)
        // EXPLICITLY (struct-max vs max_by disagree on ties cross-engine)
        val cu0 = od.groupBy(col("o_custkey"))
          .agg(min(col("day")).as("f"), max(col("day")).as("l"))
        val cu = od.join(cu0, "o_custkey")
          .filter(col("day") === col("l"))
          .groupBy(col("o_custkey"), col("f"), col("l"))
          .agg(max(col("pr")).as("lpr"))
        val subj = cu.crossJoin(broadcast(od.agg(max(col("day")).as("e"))))
          .select((col("l") - col("f")).as("t"),
            when(col("e") - col("l") <= 60L, 0L)
              .when(col("lpr").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(2L).as("cz"))
        Stats.competingRisks(subj, "t", "cz")
      },
      Some {
        val stepL = Bm25.log2E6Sql("(n_risk - d)") + " - " +
          Bm25.log2E6Sql("n_risk")
        s"""WITH od AS (SELECT o_custkey,
           |              epoch_us(o_orderdate) // 86400000000 AS day,
           |              o_orderpriority AS pr FROM orders),
           |cu0 AS (SELECT o_custkey, min(day) AS f, max(day) AS l
           |        FROM od GROUP BY 1),
           |cu AS (SELECT od.o_custkey, cu0.f, cu0.l, max(od.pr) AS lpr
           |       FROM od JOIN cu0 ON od.o_custkey = cu0.o_custkey
           |         AND od.day = cu0.l
           |       GROUP BY 1, 2, 3),
           |g AS (SELECT max(day) AS e FROM od),
           |subj AS (SELECT l - f AS t,
           |           CASE WHEN e - l <= 60 THEN 0
           |                WHEN lpr IN ('1-URGENT', '2-HIGH') THEN 1
           |                ELSE 2 END AS cz
           |         FROM cu CROSS JOIN g),
           |grp AS (SELECT t,
           |          CAST(sum(CASE WHEN cz = 1 THEN 1 ELSE 0 END)
           |            AS BIGINT) AS d1,
           |          CAST(sum(CASE WHEN cz = 2 THEN 1 ELSE 0 END)
           |            AS BIGINT) AS d2,
           |          CAST(count(*) AS BIGINT) AS leave
           |        FROM subj GROUP BY 1),
           |tot AS (SELECT CAST(sum(leave) AS BIGINT) AS n_all FROM grp),
           |walk AS (SELECT t, d1, d2, d1 + d2 AS d,
           |           CAST(n_all - (sum(leave) OVER w - leave) AS BIGINT)
           |             AS n_risk
           |         FROM grp CROSS JOIN tot
           |         WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
           |evs AS (SELECT t, n_risk, d1, d2, d FROM walk WHERE d > 0),
           |sc AS (SELECT t, n_risk, d1, d2, d,
           |         CAST(coalesce(sum(CASE WHEN n_risk > d THEN $stepL
           |           ELSE 0 END) OVER wp, 0) AS BIGINT) AS sl_prev,
           |         coalesce(max(CASE WHEN n_risk = d THEN 1 ELSE 0 END)
           |           OVER wp, 0) AS dead_prev
           |       FROM evs WINDOW wp AS (ORDER BY t
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
           |tm AS (SELECT t, n_risk, d1, d2,
           |         CASE WHEN dead_prev = 1 THEN 0
           |           ELSE ${Sketches.pow2NegE6Sql("(0 - sl_prev)")}
           |         END AS lag_surv_e6
           |       FROM sc)
           |SELECT t, n_risk, d1, d2,
           |       CAST(sum(lag_surv_e6 * d1 // n_risk) OVER w AS BIGINT)
           |         AS cif1_e6,
           |       CAST(sum(lag_surv_e6 * d2 // n_risk) OVER w AS BIGINT)
           |         AS cif2_e6
           |FROM tm WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)"""
          .stripMargin
      }),

    // ── Recurrent-event MCF: orders per customer by day offset since
    //    first order (offset 0 = entry, excluded); the risk set at
    //    offset t = customers whose administrative follow-up
    //    (global last day − first day) is ≥ t. The union-sweep gives
    //    n_risk without a correlated lookup: follow-up rows sort AFTER
    //    same-day event rows, so the strictly-preceding running sum
    //    counts exactly the subjects censored before t.
    QueryDef("q_recurrent_mcf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val od = Tables.orders(s, d)
          .select(col("o_custkey"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
              .as("day"))
        val cu = od.groupBy(col("o_custkey")).agg(min(col("day")).as("f"))
          .crossJoin(broadcast(od.agg(max(col("day")).as("e"))))
          .select(col("o_custkey"), col("f"), (col("e") - col("f")).as("fu"))
        val evs = od.join(cu, "o_custkey")
          .select((col("day") - col("f")).as("tm")).filter(col("tm") > 0L)
          .groupBy(col("tm")).agg(count(lit(1)).as("d"))
          .select(col("tm"), col("d"), lit(0L).as("c"), lit(0L).as("tag"))
        val fus = cu.groupBy(col("fu").as("tm"))
          .agg(count(lit(1)).as("c"))
          .select(col("tm"), lit(0L).as("d"), col("c"), lit(1L).as("tag"))
        val nAll = cu.agg(count(lit(1)).as("n_all"))
        val sweep = Window.orderBy(col("tm"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ord = Window.orderBy(col("tm"), col("tag"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        evs.unionByName(fus)
          .crossJoin(broadcast(nAll))
          .withColumn("gone", coalesce(sum(col("c")).over(sweep), lit(0L)))
          .withColumn("n_risk", col("n_all") - col("gone"))
          .withColumn("term_e6",
            when(col("tag") === 0L && col("n_risk") > 0L,
              expr("d * 1000000 div n_risk")).otherwise(lit(0L)))
          .withColumn("mcf_e6", sum(col("term_e6")).over(ord))
          .filter(col("tag") === 0L && col("n_risk") > 0L)
          .selectExpr("tm AS t", "CAST(n_risk AS BIGINT) AS n_risk",
            "CAST(d AS BIGINT) AS d", "mcf_e6")
      },
      Some("""WITH od AS (SELECT o_custkey,
             |              epoch_us(o_orderdate) // 86400000000 AS day
             |            FROM orders),
             |cu AS (SELECT o_custkey, min(day) AS f FROM od GROUP BY 1),
             |g AS (SELECT max(day) AS e FROM od),
             |fu AS (SELECT cu.o_custkey, cu.f, g.e - cu.f AS fu
             |       FROM cu CROSS JOIN g),
             |evs AS (SELECT od.day - fu.f AS tm,
             |               CAST(count(*) AS BIGINT) AS d,
             |               CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS tag
             |        FROM od JOIN fu ON od.o_custkey = fu.o_custkey
             |        WHERE od.day - fu.f > 0 GROUP BY 1),
             |fus AS (SELECT fu AS tm, CAST(0 AS BIGINT) AS d,
             |               CAST(count(*) AS BIGINT) AS c,
             |               CAST(1 AS BIGINT) AS tag
             |        FROM fu GROUP BY 1),
             |na AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM fu),
             |u AS (SELECT * FROM evs UNION ALL SELECT * FROM fus),
             |sw AS (SELECT tm, d, c, tag,
             |         n_all - CAST(coalesce(sum(c) OVER (ORDER BY tm, tag
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             |           0) AS BIGINT) AS n_risk
             |       FROM u CROSS JOIN na),
             |tmx AS (SELECT tm, d, tag, n_risk,
             |          CASE WHEN tag = 0 AND n_risk > 0
             |            THEN d * 1000000 // n_risk ELSE 0 END AS term_e6
             |        FROM sw)
             |SELECT tm AS t, n_risk, d,
             |       CAST(sum(term_e6) OVER (ORDER BY tm, tag
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS mcf_e6
             |FROM tmx
             |QUALIFY tag = 0 AND n_risk > 0""".stripMargin)),

    // ── Lexis surface: events on the (weeks-since-first-event ×
    //    calendar-week) grid, ages 0–7; cohort size = users whose
    //    first week is period − age; rate = events per cohort member
    //    (e6). The demographic age/period/cohort decomposition's raw
    //    material, built from one user rollup + one grid rollup.
    QueryDef("q_lexis_surface",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            expr("unix_micros(ts) div 604800000000").as("wk"))
        val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("w0"))
        val cohort = first.groupBy(col("w0")).agg(count(lit(1)).as("cn"))
        ev.join(first, "user_id")
          .select(col("wk").as("period"), (col("wk") - col("w0")).as("age"))
          .filter(col("age") <= 7L)
          .groupBy(col("period"), col("age"))
          .agg(count(lit(1)).as("n_events"))
          .join(broadcast(cohort),
            col("period") - col("age") === col("w0"))
          .selectExpr("CAST(period AS BIGINT) AS period",
            "CAST(age AS BIGINT) AS age",
            "CAST(n_events AS BIGINT) AS n_events",
            "CAST(cn AS BIGINT) AS cohort_n",
            "n_events * 1000000 div cn AS rate_e6")
      },
      Some("""WITH ev AS (SELECT user_id,
             |              epoch_us(ts) // 604800000000 AS wk FROM events),
             |f AS (SELECT user_id, min(wk) AS w0 FROM ev GROUP BY 1),
             |coh AS (SELECT w0, CAST(count(*) AS BIGINT) AS cn
             |        FROM f GROUP BY 1),
             |cell AS (SELECT e.wk AS period, e.wk - f.w0 AS age,
             |                CAST(count(*) AS BIGINT) AS n_events
             |         FROM ev e JOIN f ON e.user_id = f.user_id
             |         WHERE e.wk - f.w0 <= 7 GROUP BY 1, 2)
             |SELECT CAST(c.period AS BIGINT) AS period,
             |       CAST(c.age AS BIGINT) AS age, c.n_events,
             |       coh.cn AS cohort_n,
             |       c.n_events * 1000000 // coh.cn AS rate_e6
             |FROM cell c JOIN coh ON c.period - c.age = coh.w0"""
        .stripMargin))
  )
}
