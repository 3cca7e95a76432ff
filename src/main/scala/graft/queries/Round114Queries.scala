package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-114 batch: three time-series diagnostics over the daily order
  * series — Ljung–Box portmanteau (is the autocorrelation q_acf shows
  * jointly significant?), the Hampel rolling-median outlier filter (the
  * robust despiking pass cleaning pipelines run before any smoother),
  * and the Lo–MacKinlay variance-ratio test (random-walk vs mean-
  * reversion — VR(q) ≈ 1 under iid increments). The day axis is
  * calendar-bounded (~2.4k rows at every SF), so every window/pair
  * structure here is volume-independent after the first rollup.
  */
object Round114Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Ljung–Box per lag k=1..10 on n-scaled demeaned daily counts
    //    (v = n·c − s, exact): r_k from gap-aware day+k pairs (the
    //    q_acf convention), r_e6 sign-factored truncated; the per-lag
    //    χ² contribution substitutes the observed pair count for the
    //    classical n−k (the natural gap generalization, documented) —
    //    q_k_e6 = n(n+2)·r_e6² div (pairs·1e6), with the running total
    //    lb_cum_e6 accumulated over the lag axis in exact longs.
    QueryDef("q_ljung_box",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
            "div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
        val cen = daily.crossJoin(broadcast(tot))
          .select(col("day"), col("n"), expr("n * c - s").as("v"))
          .localCheckpoint(false) // pair sides + the denominator rollup
        val den = cen.agg(sum(expr("v * v")).as("den"),
          max(col("n")).as("n"))
        val lags = cen.select(col("day"), col("v"),
          explode(sequence(lit(1), lit(10))).as("k"))
        val num = lags.join(
            cen.select(col("day").as("db"), col("v").as("vb")),
            col("db") === col("day") + col("k"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("pairs"), sum(expr("v * vb")).as("num"))
        num.crossJoin(broadcast(den))
          .withColumn("r_e6", expr(
            """CASE WHEN den = 0 THEN 0
              |WHEN num >= 0 THEN num * 1000000 div den
              |ELSE -((-num) * 1000000 div den) END""".stripMargin))
          .withColumn("q_k_e6", expr(
            "n * (n + 2) * r_e6 * r_e6 div (pairs * 1000000)"))
          .withColumn("lb_cum_e6", sum(col("q_k_e6")).over(
            Window.orderBy(col("k"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .selectExpr("CAST(k AS BIGINT) AS k",
            "CAST(pairs AS BIGINT) AS pairs", "r_e6", "q_k_e6",
            "lb_cum_e6")
      },
      Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
             |                        AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM orders GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(c) AS BIGINT) AS s FROM daily),
             |cen AS (SELECT day, n, n * c - s AS v
             |        FROM daily CROSS JOIN tot),
             |den AS (SELECT CAST(sum(v * v) AS BIGINT) AS den,
             |               CAST(max(n) AS BIGINT) AS n FROM cen),
             |num AS (SELECT k, CAST(count(*) AS BIGINT) AS pairs,
             |               CAST(sum(a.v * b.v) AS BIGINT) AS num
             |        FROM cen a
             |        CROSS JOIN (SELECT unnest(generate_series(1, 10))
             |                      AS k) l
             |        JOIN cen b ON b.day = a.day + l.k
             |        GROUP BY 1),
             |sc AS (SELECT k, pairs,
             |              CASE WHEN den = 0 THEN 0
             |                   WHEN num >= 0 THEN num * 1000000 // den
             |                   ELSE -((-num) * 1000000 // den)
             |              END AS r_e6,
             |              n FROM num CROSS JOIN den),
             |qq AS (SELECT k, pairs, r_e6,
             |              n * (n + 2) * r_e6 * r_e6
             |                // (pairs * 1000000) AS q_k_e6
             |       FROM sc)
             |SELECT CAST(k AS BIGINT) AS k, pairs, r_e6, q_k_e6,
             |       CAST(sum(q_k_e6) OVER (ORDER BY k
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lb_cum_e6
             |FROM qq""".stripMargin)),

    // ── Hampel filter: day d is an outlier when |c_d − med| exceeds
    //    3·1.4826·MAD of its ±3-day neighborhood (gap-aware: members
    //    come from an offset-explode equi-join on the day value, so a
    //    calendar hole shrinks the window instead of sliding foreign
    //    days in). Medians and MADs carried doubled/quadrupled (paired
    //    middle order statistics), so the decision inequality
    //    dev·20000 > 44478·mad4 is exact integer. Emits flagged days.
    QueryDef("q_hampel",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
            "div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // center + member sides of the window
        val mem = daily.select(col("day").as("ctr"), col("c").as("cc"),
            explode(sequence(lit(-3), lit(3))).as("off"))
          .join(daily.select(col("day").as("mday"), col("c").as("mc")),
            col("mday") === col("ctr") + col("off"))
        val med = mem
          .withColumn("rn", row_number().over(Window.partitionBy(col("ctr"))
            .orderBy(col("mc"), col("mday"))))
          .withColumn("nw", count(lit(1)).over(
            Window.partitionBy(col("ctr"))))
          .groupBy(col("ctr"), col("cc"))
          .agg(sum(when(col("rn") === expr("(nw + 1) div 2"), col("mc"))
            .otherwise(0L)).as("lo"),
            sum(when(col("rn") === expr("(nw + 2) div 2"), col("mc"))
              .otherwise(0L)).as("hi"))
          .select(col("ctr"), col("cc"), (col("lo") + col("hi")).as("m2"))
          .localCheckpoint(false) // re-joined for the MAD pass
        val mad = mem.join(med.select(col("ctr"), col("m2")), "ctr")
          .withColumn("d2", abs(col("mc") * 2 - col("m2")))
          .withColumn("rn", row_number().over(Window.partitionBy(col("ctr"))
            .orderBy(col("d2"), col("mday"))))
          .withColumn("nw", count(lit(1)).over(
            Window.partitionBy(col("ctr"))))
          .groupBy(col("ctr"))
          .agg(sum(when(col("rn") === expr("(nw + 1) div 2"), col("d2"))
            .otherwise(0L)).as("lo"),
            sum(when(col("rn") === expr("(nw + 2) div 2"), col("d2"))
              .otherwise(0L)).as("hi"))
          .select(col("ctr"), (col("lo") + col("hi")).as("mad4"))
        med.join(mad, "ctr")
          .withColumn("dev2", abs(col("cc") * 2 - col("m2")))
          .filter(col("dev2") * 20000 > col("mad4") * 44478)
          .selectExpr("ctr AS day", "cc AS c", "m2 AS med_x2",
            "mad4 AS mad_x4")
      },
      Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
             |                        AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM orders GROUP BY 1),
             |mem AS (SELECT a.day AS ctr, a.c AS cc, b.day AS mday,
             |               b.c AS mc
             |        FROM daily a
             |        CROSS JOIN (SELECT unnest(generate_series(-3, 3))
             |                      AS off) o
             |        JOIN daily b ON b.day = a.day + o.off),
             |rk AS (SELECT ctr, cc, mc, mday,
             |              row_number() OVER (PARTITION BY ctr
             |                ORDER BY mc, mday) AS rn,
             |              count(*) OVER (PARTITION BY ctr) AS nw
             |       FROM mem),
             |med AS (SELECT ctr, cc,
             |               CAST(sum(CASE WHEN rn = (nw + 1) // 2 THEN mc
             |                             ELSE 0 END)
             |                  + sum(CASE WHEN rn = (nw + 2) // 2 THEN mc
             |                             ELSE 0 END) AS BIGINT) AS m2
             |        FROM rk GROUP BY 1, 2),
             |dk AS (SELECT mem.ctr, abs(mc * 2 - m2) AS d2, mday
             |       FROM mem JOIN med ON mem.ctr = med.ctr),
             |drk AS (SELECT ctr, d2,
             |               row_number() OVER (PARTITION BY ctr
             |                 ORDER BY d2, mday) AS rn,
             |               count(*) OVER (PARTITION BY ctr) AS nw
             |        FROM dk),
             |mad AS (SELECT ctr,
             |               CAST(sum(CASE WHEN rn = (nw + 1) // 2 THEN d2
             |                             ELSE 0 END)
             |                  + sum(CASE WHEN rn = (nw + 2) // 2 THEN d2
             |                             ELSE 0 END) AS BIGINT) AS mad4
             |        FROM drk GROUP BY 1)
             |SELECT med.ctr AS day, cc AS c, m2 AS med_x2, mad4 AS mad_x4
             |FROM med JOIN mad ON med.ctr = mad.ctr
             |WHERE abs(cc * 2 - m2) * 20000 > mad4 * 44478"""
        .stripMargin)),

    // ── Lo–MacKinlay variance ratio on the rn-indexed daily series:
    //    VR(q) = Var(q-day sums)/(q·Var(1-day)) with every variance a
    //    fully-integer numerator (mᵩ·ΣY² − (ΣY)²) and the close a
    //    decimal(38,0) division; the asymptotic z folds the exact
    //    vr_e6 through a fixed scalar IEEE tree. Row windows partition
    //    by horizon — one exchange over a calendar-bounded frame.
    QueryDef("q_variance_ratio",
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.orders(s, d)
          .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
            "div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
          .localCheckpoint(false) // one frame, three horizon windows
        val qs = daily.select(col("c"), col("rn"),
          explode(expr("array(1, 2, 5, 10)")).as("q"))
        val win = Window.partitionBy(col("q")).orderBy(col("rn"))
        // q-length forward sums; full windows only (nf = q members)
        val per = qs
          .withColumn("y", when(col("q") === 1, col("c"))
            .when(col("q") === 2, sum(col("c")).over(win.rowsBetween(0, 1)))
            .when(col("q") === 5, sum(col("c")).over(win.rowsBetween(0, 4)))
            .otherwise(sum(col("c")).over(win.rowsBetween(0, 9))))
          .withColumn("nf", when(col("q") === 1, lit(1L))
            .when(col("q") === 2,
              count(lit(1)).over(win.rowsBetween(0, 1)))
            .when(col("q") === 5,
              count(lit(1)).over(win.rowsBetween(0, 4)))
            .otherwise(count(lit(1)).over(win.rowsBetween(0, 9))))
          .filter(col("nf") === col("q").cast("long"))
          .groupBy(col("q"))
          .agg(count(lit(1)).as("m"), sum(col("y")).as("sy"),
            sum(expr("y * y")).as("syy"))
          .withColumn("varnum", expr("m * syy - sy * sy"))
          .localCheckpoint(false) // tiny horizon axis; joined to its q=1 row
        val base = per.filter(col("q") === 1)
          .select(col("m").as("m1"), col("varnum").as("vn1"))
        per.filter(col("q") =!= 1).crossJoin(broadcast(base))
          .withColumn("vr_e6", expr(
            s"""CAST(CAST(varnum AS $dec) * CAST(m1 AS $dec)
               |  * CAST(m1 AS $dec) * CAST(1000000 AS $dec)
               |  div (CAST(q AS $dec) * CAST(m AS $dec)
               |       * CAST(m AS $dec) * CAST(vn1 AS $dec))
               |  AS BIGINT)""".stripMargin))
          .withColumn("z", expr(
            """round((CAST(vr_e6 AS DOUBLE) / CAST('1000000' AS DOUBLE)
              |        - CAST('1.0' AS DOUBLE))
              |      * sqrt(CAST('3.0' AS DOUBLE) * CAST(q AS DOUBLE)
              |             * CAST(m1 AS DOUBLE)
              |             / (CAST('2.0' AS DOUBLE)
              |                * (CAST(2 * q - 1 AS DOUBLE))
              |                * (CAST(q - 1 AS DOUBLE)))), 6)"""
              .stripMargin))
          .selectExpr("CAST(q AS BIGINT) AS q", "CAST(m AS BIGINT) AS m",
            "vr_e6", "z")
      },
      Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
             |                        AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM orders GROUP BY 1),
             |idx AS (SELECT c, row_number() OVER (ORDER BY day) AS rn
             |        FROM daily),
             |qs AS (SELECT q, c, rn FROM idx
             |       CROSS JOIN (SELECT unnest([1, 2, 5, 10]) AS q) qq),
             |w AS (SELECT q,
             |             CASE q WHEN 1 THEN c
             |               WHEN 2 THEN sum(c) OVER (PARTITION BY q
             |                 ORDER BY rn ROWS BETWEEN CURRENT ROW
             |                 AND 1 FOLLOWING)
             |               WHEN 5 THEN sum(c) OVER (PARTITION BY q
             |                 ORDER BY rn ROWS BETWEEN CURRENT ROW
             |                 AND 4 FOLLOWING)
             |               ELSE sum(c) OVER (PARTITION BY q
             |                 ORDER BY rn ROWS BETWEEN CURRENT ROW
             |                 AND 9 FOLLOWING) END AS y,
             |             CASE q WHEN 1 THEN 1
             |               WHEN 2 THEN count(*) OVER (PARTITION BY q
             |                 ORDER BY rn ROWS BETWEEN CURRENT ROW
             |                 AND 1 FOLLOWING)
             |               WHEN 5 THEN count(*) OVER (PARTITION BY q
             |                 ORDER BY rn ROWS BETWEEN CURRENT ROW
             |                 AND 4 FOLLOWING)
             |               ELSE count(*) OVER (PARTITION BY q
             |                 ORDER BY rn ROWS BETWEEN CURRENT ROW
             |                 AND 9 FOLLOWING) END AS nf
             |      FROM qs),
             |per AS (SELECT q, CAST(count(*) AS BIGINT) AS m,
             |               CAST(sum(y) AS BIGINT) AS sy,
             |               CAST(sum(y * y) AS BIGINT) AS syy
             |        FROM w WHERE nf = q GROUP BY 1),
             |vn AS (SELECT q, m, m * syy - sy * sy AS varnum FROM per),
             |base AS (SELECT m AS m1, varnum AS vn1 FROM vn WHERE q = 1)
             |SELECT CAST(q AS BIGINT) AS q, m,
             |       CAST(CAST(varnum AS HUGEINT) * m1 * m1 * 1000000
             |         // (CAST(q AS HUGEINT) * m * m * vn1) AS BIGINT)
             |         AS vr_e6,
             |       round((CAST(CAST(CAST(varnum AS HUGEINT) * m1 * m1
             |                * 1000000
             |                // (CAST(q AS HUGEINT) * m * m * vn1)
             |                AS BIGINT) AS DOUBLE)
             |              / CAST('1000000' AS DOUBLE)
             |              - CAST('1.0' AS DOUBLE))
             |            * sqrt(CAST('3.0' AS DOUBLE) * CAST(q AS DOUBLE)
             |                   * CAST(m1 AS DOUBLE)
             |                   / (CAST('2.0' AS DOUBLE)
             |                      * CAST(2 * q - 1 AS DOUBLE)
             |                      * CAST(q - 1 AS DOUBLE))), 6) AS z
             |FROM vn CROSS JOIN base WHERE q <> 1"""
        .stripMargin))
  )
}
