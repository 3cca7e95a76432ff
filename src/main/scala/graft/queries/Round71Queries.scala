package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-71 batch, closing the nonparametric-test family: Wilcoxon
  * signed-rank (the PAIRED complement of q_mann_whitney), the Friedman
  * test (k related samples over the hod×dow grid — blocked ranks where
  * q_kruskal_wallis assumes independence), and the Siegel repeated-
  * median slope (median-of-medians robustness one rung above
  * q_theil_sen's single median). Doubled midranks keep every rank sum
  * an exact integer.
  */
object Round71Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Wilcoxon signed-rank: customers paired (2k, 2k+1), zero diffs
    //    dropped; W± in doubled-rank units, normal z closes it.
    QueryDef("q_wilcoxon_signed",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey").as("ck"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"))
        val ev = c.where(col("ck") % 2 === 0)
          .select((col("ck") / 2).as("p"), col("v").as("va"))
        val od = c.where(col("ck") % 2 === 1)
          .select(((col("ck") - 1) / 2).as("p"), col("v").as("vb"))
        val diffs = ev.join(od, "p")
          .select((col("va") - col("vb")).as("dv"))
          .where(col("dv") =!= 0)
        // Tie-corrected doubled rank from the distinct-|d| axis: for a
        // tie group starting at global position p with c members,
        // r2 = 2p + c − 1 (≡ 2·rank + ties − 1 of the per-row form), so
        // one aggregate to (|d|, sign-count) cells replaces the
        // single-partition rank over all pairs — the window walks |d|
        // cells only.
        val cells = diffs.withColumn("ad", abs(col("dv")))
          .groupBy(col("ad"))
          .agg(count(lit(1)).as("cnt"),
            sum(when(col("dv") > 0, 1L).otherwise(0L)).as("pos"),
            sum(when(col("dv") < 0, 1L).otherwise(0L)).as("neg"))
        val r2 = cells
          .withColumn("cum", sum(col("cnt")).over(
            Window.orderBy(col("ad"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("r2",
            lit(2L) * (col("cum") - col("cnt") + 1L) + col("cnt") - 1L)
        r2.agg(sum(col("cnt")).as("n"),
            sum(col("pos") * col("r2")).as("w2_plus"),
            sum(col("neg") * col("r2")).as("w2_minus"))
          .selectExpr("n", "w2_plus", "w2_minus",
            """round((CAST(w2_plus AS DOUBLE) - CAST(w2_minus AS DOUBLE))
              |/ (CAST('2.0' AS DOUBLE)
              |   * sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE)
              |          / CAST('6.0' AS DOUBLE))), 6) AS z""".stripMargin)
      },
      Some("""WITH c AS (SELECT c_custkey AS ck,
             |                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             |                   AS v
             |          FROM customer),
             |ev AS (SELECT ck // 2 AS p, v AS va FROM c WHERE ck % 2 = 0),
             |od AS (SELECT (ck - 1) // 2 AS p, v AS vb FROM c
             |       WHERE ck % 2 = 1),
             |diffs AS (SELECT va - vb AS dv FROM ev JOIN od ON ev.p = od.p
             |          WHERE va - vb <> 0),
             |r2 AS (SELECT dv,
             |              2 * CAST(rank() OVER (ORDER BY abs(dv))
             |                AS BIGINT)
             |              + CAST(count(*) OVER (PARTITION BY abs(dv))
             |                AS BIGINT) - 1 AS r2
             |       FROM diffs),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(CASE WHEN dv > 0 THEN r2 ELSE 0 END)
             |                 AS BIGINT) AS w2_plus,
             |               CAST(sum(CASE WHEN dv < 0 THEN r2 ELSE 0 END)
             |                 AS BIGINT) AS w2_minus
             |        FROM r2)
             |SELECT n, w2_plus, w2_minus,
             |       round((CAST(w2_plus AS DOUBLE)
             |              - CAST(w2_minus AS DOUBLE))
             |         / (CAST('2.0' AS DOUBLE)
             |            * sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE)
             |                   / CAST('6.0' AS DOUBLE))), 6) AS z
             |FROM agg""".stripMargin)),

    // ── Friedman: blocks = hour-of-day, treatments = day-of-week;
    //    doubled within-block midranks, χ² closed in one double step.
    QueryDef("q_friedman_test",
      (s, d) => {
        val grid = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(expr("h % 24").as("hod"),
            expr("(h div 24 + 4) % 7").as("dow"))
          .agg(count(lit(1)).as("v"))
        val r2 = grid.withColumn("r2",
          lit(2L) * rank().over(Window.partitionBy(col("hod"))
            .orderBy(col("v"))).cast("long") +
            count(lit(1)).over(Window.partitionBy(col("hod"), col("v")))
            - 1L)
        val sums = r2.groupBy(col("dow")).agg(sum(col("r2")).as("r2_sum"))
          .localCheckpoint(false) // reused: per-dow rows + chi2 scalar
        val stats = sums.agg(count(lit(1)).as("k"),
          sum(expr("r2_sum * r2_sum")).as("sq"))
        val nb = grid.select(col("hod")).distinct()
          .agg(count(lit(1)).as("n_blocks"))
        sums.crossJoin(broadcast(stats)).crossJoin(broadcast(nb))
          .selectExpr("dow", "r2_sum", "n_blocks", "k",
            """round(CAST('3.0' AS DOUBLE) * CAST(sq AS DOUBLE)
              |/ (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
              |   * CAST(k + 1 AS DOUBLE))
              |- CAST('3.0' AS DOUBLE) * CAST(n_blocks AS DOUBLE)
              |  * CAST(k + 1 AS DOUBLE), 6) AS chi2""".stripMargin)
      },
      Some("""WITH grid AS (
             |  SELECT h % 24 AS hod, (h // 24 + 4) % 7 AS dow,
             |         CAST(count(*) AS BIGINT) AS v
             |  FROM (SELECT epoch_us(ts) // 3600000000 AS h FROM events)
             |  GROUP BY 1, 2),
             |r2 AS (SELECT hod, dow,
             |              2 * CAST(rank() OVER (PARTITION BY hod
             |                ORDER BY v) AS BIGINT)
             |              + CAST(count(*) OVER (PARTITION BY hod, v)
             |                AS BIGINT) - 1 AS r2
             |       FROM grid),
             |sums AS (SELECT dow, CAST(sum(r2) AS BIGINT) AS r2_sum
             |         FROM r2 GROUP BY 1),
             |stats AS (SELECT CAST(count(*) AS BIGINT) AS k,
             |                 CAST(sum(r2_sum * r2_sum) AS BIGINT) AS sq
             |          FROM sums),
             |nb AS (SELECT CAST(count(DISTINCT hod) AS BIGINT) AS n_blocks
             |       FROM grid)
             |SELECT dow, r2_sum, n_blocks, k,
             |       round(CAST('3.0' AS DOUBLE) * CAST(sq AS DOUBLE)
             |         / (CAST(n_blocks AS DOUBLE) * CAST(k AS DOUBLE)
             |            * CAST(k + 1 AS DOUBLE))
             |       - CAST('3.0' AS DOUBLE) * CAST(n_blocks AS DOUBLE)
             |         * CAST(k + 1 AS DOUBLE), 6) AS chi2
             |FROM sums CROSS JOIN stats CROSS JOIN nb""".stripMargin)),

    // ── Siegel slope: per-day counts, median over i of the median over
    //    j≠i of pairwise slopes — the day axis is calendar-bounded.
    QueryDef("q_siegel_slope",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // both pair sides
        val b = days.select(col("day").as("d2"), col("x").as("x2"))
        val slopes = days.crossJoin(b).where(col("day") =!= col("d2"))
          .selectExpr("day", "d2",
            """(CAST(x2 AS DOUBLE) - CAST(x AS DOUBLE))
              |/ (CAST(d2 AS DOUBLE) - CAST(day AS DOUBLE)) AS sl"""
              .stripMargin)
        val wIn = Window.partitionBy(col("day"))
        val medPer = slopes
          .withColumn("rn", row_number().over(
            wIn.orderBy(col("sl"), col("d2"))))
          .withColumn("cnt", count(lit(1)).over(wIn))
          .where(col("rn") === expr("(cnt + 1) div 2"))
          .select(col("day"), col("sl").as("m"))
        medPer
          .withColumn("rn", row_number().over(
            Window.orderBy(col("m"), col("day"))))
          .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
          .where(col("rn") === expr("(cnt + 1) div 2"))
          .selectExpr("cnt AS n_days", "round(m, 6) AS siegel_slope")
      },
      Some("""WITH days AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                    CAST(count(*) AS BIGINT) AS x
             |             FROM events GROUP BY 1),
             |slopes AS (
             |  SELECT a.day,
             |         (CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE))
             |         / (CAST(b.day AS DOUBLE) - CAST(a.day AS DOUBLE))
             |           AS sl,
             |         b.day AS d2
             |  FROM days a JOIN days b ON a.day <> b.day),
             |medper AS (SELECT day, sl AS m FROM (
             |  SELECT day, sl, row_number() OVER (PARTITION BY day
             |           ORDER BY sl, d2) AS rn,
             |         count(*) OVER (PARTITION BY day) AS cnt
             |  FROM slopes) WHERE rn = (cnt + 1) // 2)
             |SELECT cnt AS n_days, round(m, 6) AS siegel_slope FROM (
             |  SELECT m, row_number() OVER (ORDER BY m, day) AS rn,
             |         count(*) OVER () AS cnt
             |  FROM medper) WHERE rn = (cnt + 1) // 2""".stripMargin))
  )
}
