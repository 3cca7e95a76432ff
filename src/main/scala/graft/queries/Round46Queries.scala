package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Stats}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-46 batch: two-group log-rank test (the hypothesis-test closer
  * of the survival family — q_kaplan_meier / q_nelson_aalen report
  * curves, this answers "do the two cohorts differ"), Theil's
  * uncertainty coefficient (the DIRECTIONAL categorical-association
  * audit, complementing the symmetric Cramér's V in q_chi_square), and
  * the per-segment decile lift/gains table (the campaign-targeting
  * report on top of the scoring family: q_calibration_ece grades
  * probability quality, this grades RANKING usefulness).
  */
object Round46Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Log-rank over the q_kaplan_meier churn subjects, split into
    //    even/odd customer cohorts. Same distinct-duration risk-set
    //    walk; the statistic adds per-time hypergeometric expectation
    //    and variance — all integer e6, overflow-ordered.
    QueryDef("q_logrank",
      (s, d) => Stats.logRank(
        Tables.orders(s, d)
          .withColumn("day",
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
          .groupBy(col("o_custkey"))
          .agg(min(col("day")).as("f"), max(col("day")).as("l"))
          .crossJoin(broadcast(
            Tables.orders(s, d).agg(max(
              expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"))
              .as("e"))))
          .select((col("l") - col("f")).as("t"),
            when(col("e") - col("l") > 60L, 1L).otherwise(0L).as("ev"),
            (col("o_custkey") % 2).as("g"))),
      Some("""WITH od AS (SELECT o_custkey, epoch_us(o_orderdate) // 86400000000 AS day
             |           FROM orders),
             |cu AS (SELECT o_custkey, min(day) AS f, max(day) AS l FROM od GROUP BY 1),
             |gl AS (SELECT max(day) AS e FROM od),
             |subj AS (SELECT l - f AS t, CASE WHEN e - l > 60 THEN 1 ELSE 0 END AS ev,
             |                o_custkey % 2 AS g FROM cu CROSS JOIN gl),
             |grp AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d,
             |               CAST(sum(ev * g) AS BIGINT) AS d1,
             |               CAST(count(*) AS BIGINT) AS leave,
             |               CAST(sum(g) AS BIGINT) AS leave1
             |        FROM subj GROUP BY t),
             |tot AS (SELECT CAST(sum(leave) AS BIGINT) AS n_all,
             |               CAST(sum(leave1) AS BIGINT) AS n1_all FROM grp),
             |walk AS (SELECT t, d, d1,
             |            CAST(n_all - (sum(leave) OVER w - leave) AS BIGINT) AS n,
             |            CAST(n1_all - (sum(leave1) OVER w - leave1) AS BIGINT) AS n1
             |         FROM grp CROSS JOIN tot
             |         WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
             |terms AS (SELECT d1, (d * n1 * 1000000) // n AS e1_e6,
             |             ((((d * n1 * 1000000) // n) * (n - n1)) // n)
             |               * (n - d) // greatest(n - 1, 1) AS v_e6
             |          FROM walk WHERE d > 0),
             |agg AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
             |               CAST(sum(e1_e6) AS BIGINT) AS e1_e6,
             |               CAST(sum(v_e6) AS BIGINT) AS v_e6 FROM terms)
             |SELECT o1, e1_e6, v_e6,
             |       CAST(((abs(o1 * 1000000 - e1_e6) // 1000)
             |         * (abs(o1 * 1000000 - e1_e6) // 1000) * 1000)
             |         // greatest(v_e6, 1) AS BIGINT) AS chi2_e3
             |FROM agg""".stripMargin)),

    // ── Theil's U(event_type | day-of-week): what fraction of the
    //    event-mix entropy the weekday explains. Same cell aggregate as
    //    q_mutual_info, plus the H(X) margin pass and the clamped
    //    final ratio.
    QueryDef("q_theils_u",
      (s, d) => Stats.theilsU(
        Tables.events(s, d)
          .select(col("event_type").as("x"),
            expr("(unix_micros(ts) div 86400000000) % 7").as("y")),
        "x", "y"),
      Some {
        val lg = Bm25.log2E6Sql("(cxy * n)") + " - " + Bm25.log2E6Sql("(cx * cy)")
        val hg = Bm25.log2E6Sql("n") + " - " + Bm25.log2E6Sql("cx")
        s"""WITH e AS (SELECT event_type AS x,
           |                 (epoch_us(ts) // 86400000000) % 7 AS y FROM events),
           |cells AS (SELECT x, y, CAST(count(*) AS BIGINT) AS cxy
           |          FROM e GROUP BY x, y),
           |rm AS (SELECT x, CAST(sum(cxy) AS BIGINT) AS cx FROM cells GROUP BY x),
           |cm AS (SELECT y, CAST(sum(cxy) AS BIGINT) AS cy FROM cells GROUP BY y),
           |tot AS (SELECT CAST(sum(cxy) AS BIGINT) AS n FROM cells),
           |mi AS (SELECT n, CAST(sum(cxy * ($lg)) // n AS BIGINT) AS mi_e6
           |       FROM cells JOIN rm USING (x) JOIN cm USING (y) CROSS JOIN tot
           |       GROUP BY n),
           |hx AS (SELECT n, CAST(sum(cx * ($hg)) // n AS BIGINT) AS hx_e6
           |       FROM rm CROSS JOIN tot GROUP BY n)
           |SELECT n, hx_e6, mi_e6,
           |       CAST(greatest(mi_e6, 0) * 1000000 // greatest(hx_e6, 1)
           |            AS BIGINT) AS u_e6
           |FROM mi JOIN hx USING (n)""".stripMargin
      }),

    // ── Decile lift/gains per order-priority segment: rank orders by
    //    total-price cents (descending, orderkey tie-break so ntile is
    //    a total order in both engines), positives = finalized status,
    //    then cumulative capture and lift per decile. All windows are
    //    segment-PARTITIONED — no global sort at scale.
    QueryDef("q_lift_gains",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          col("o_orderpriority").as("seg"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("pos"),
          col("o_orderkey").as("tie"))
        val dec = o.withColumn("decile",
          ntile(10).over(Window.partitionBy(col("seg"))
            .orderBy(col("cents").desc, col("tie"))).cast("long"))
        val g = dec.groupBy(col("seg"), col("decile"))
          .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("n_pos"))
        val wCum = Window.partitionBy(col("seg")).orderBy(col("decile"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy(col("seg"))
        g.withColumn("cum_pos", sum(col("n_pos")).over(wCum))
          .withColumn("cum_cnt", sum(col("cnt")).over(wCum))
          .withColumn("tot_pos", sum(col("n_pos")).over(wAll))
          .withColumn("tot_cnt", sum(col("cnt")).over(wAll))
          .selectExpr("seg", "decile", "cnt", "n_pos", "cum_pos",
            "CAST(cum_pos * 1000000 div greatest(tot_pos, 1) AS BIGINT) AS gain_e6",
            """CAST((cum_pos * tot_cnt * 1000000)
              |  div greatest(cum_cnt * tot_pos, 1) AS BIGINT) AS lift_e6""".stripMargin)
      },
      Some("""WITH o AS (SELECT o_orderpriority AS seg,
             |                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             |                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos,
             |                 o_orderkey AS tie
             |          FROM orders),
             |d AS (SELECT seg, pos, CAST(ntile(10) OVER
             |        (PARTITION BY seg ORDER BY cents DESC, tie) AS BIGINT) AS decile
             |      FROM o),
             |g AS (SELECT seg, decile, CAST(count(*) AS BIGINT) AS cnt,
             |             CAST(sum(pos) AS BIGINT) AS n_pos
             |      FROM d GROUP BY 1, 2),
             |c AS (SELECT seg, decile, cnt, n_pos,
             |             CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
             |             CAST(sum(cnt) OVER w AS BIGINT) AS cum_cnt,
             |             CAST(sum(n_pos) OVER (PARTITION BY seg) AS BIGINT) AS tot_pos,
             |             CAST(sum(cnt) OVER (PARTITION BY seg) AS BIGINT) AS tot_cnt
             |      FROM g WINDOW w AS (PARTITION BY seg ORDER BY decile
             |                          ROWS UNBOUNDED PRECEDING))
             |SELECT seg, decile, cnt, n_pos, cum_pos,
             |       CAST(cum_pos * 1000000 // greatest(tot_pos, 1) AS BIGINT) AS gain_e6,
             |       CAST((cum_pos * tot_cnt * 1000000)
             |         // greatest(cum_cnt * tot_pos, 1) AS BIGINT) AS lift_e6
             |FROM c""".stripMargin))
  )
}
