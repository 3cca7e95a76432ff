package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-111 batch: seasonal Mann–Kendall (the deseasonalized trend
  * test q_mann_kendall needs on periodic series), the Kolmogorov–
  * Zurbenko smoother (iterated moving average — sharper spectral
  * cutoff than q_ewma_smooth at the same support), and Burrows' delta
  * (the stylometric distance between corpus sources — the authorship/
  * provenance screen a curation pipeline runs on suspicious slices).
  */
object Round111Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Seasonal Mann–Kendall over monthly order volumes: Kendall S
    //    within each calendar month's across-year series (pairs y < y'
    //    on the bounded 12×7 year-month grid), summed; the variance
    //    stays exact as 18·Var = Σ n(n−1)(2n+5); continuity-corrected
    //    z at the close. Season-blind q_mann_kendall would conflate
    //    the seasonal cycle with trend — this is the fix.
    QueryDef("q_seasonal_mk",
      (s, d) => {
        val ym = Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"))
          .agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // both pair sides + the n_g rollup
        val pairs = ym.as("a").join(ym.as("b"),
            col("a.m") === col("b.m") && col("a.y") < col("b.y"))
          .select(col("a.m").as("m"),
            signum(col("b.x") - col("a.x")).cast("long").as("sg"))
        val sTot = pairs.agg(sum(col("sg")).as("s_total"))
        val varT = ym.groupBy(col("m")).agg(count(lit(1)).as("ng"))
          .agg(sum(expr("ng * (ng - 1) * (2 * ng + 5)")).as("var18"),
            count(lit(1)).as("n_seasons"))
        sTot.crossJoin(varT)
          .selectExpr("CAST(s_total AS BIGINT) AS s_total",
            "CAST(var18 AS BIGINT) AS var18",
            "CAST(n_seasons AS BIGINT) AS n_seasons",
            """CASE WHEN s_total = 0 OR var18 = 0
              |     THEN CAST('0.0' AS DOUBLE)
              |     ELSE round((CAST(s_total AS DOUBLE)
              |            - CAST(sign(s_total) AS DOUBLE))
              |          / sqrt(CAST(var18 AS DOUBLE)
              |                 / CAST('18.0' AS DOUBLE)), 6)
              |END AS z""".stripMargin)
      },
      Some("""WITH ym AS (SELECT year(o_orderdate) AS y,
             |                  month(o_orderdate) AS m,
             |                  CAST(count(*) AS BIGINT) AS x
             |           FROM orders GROUP BY 1, 2),
             |p AS (SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
             |                           WHEN b.x < a.x THEN -1
             |                           ELSE 0 END) AS BIGINT) AS s_total
             |      FROM ym a JOIN ym b ON a.m = b.m AND a.y < b.y),
             |v AS (SELECT CAST(sum(ng * (ng - 1) * (2 * ng + 5))
             |               AS BIGINT) AS var18,
             |             CAST(count(*) AS BIGINT) AS n_seasons
             |      FROM (SELECT m, CAST(count(*) AS BIGINT) AS ng
             |            FROM ym GROUP BY 1))
             |SELECT s_total, var18, n_seasons,
             |       CASE WHEN s_total = 0 OR var18 = 0
             |            THEN CAST('0.0' AS DOUBLE)
             |            ELSE round((CAST(s_total AS DOUBLE)
             |                   - CAST(sign(s_total) AS DOUBLE))
             |                 / sqrt(CAST(var18 AS DOUBLE)
             |                        / CAST('18.0' AS DOUBLE)), 6)
             |       END AS z
             |FROM p CROSS JOIN v""".stripMargin)),

    // ── Kolmogorov–Zurbenko KZ(5,2) smoother on daily order volume:
    //    two passes of a centered 5-day moving average, kept exact by
    //    carrying the ×25 scale (each pass sums 5 terms instead of
    //    dividing). RANGE frames keyed on the day value make both
    //    passes gap-safe (the order calendar has a few holes), and the
    //    full-window count filter drops edge/gap-shortened smooths
    //    instead of emitting biased ones.
    QueryDef("q_kz_filter",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            .as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
        val w2 = Window.orderBy(col("day")).rangeBetween(-2, 2)
        val p1 = daily
          .withColumn("s1", sum(col("c")).over(w2))
          .withColumn("n1", count(lit(1)).over(w2))
          .filter(col("n1") === 5L)
          .select(col("day"), col("s1"))
          .localCheckpoint(false) // second pass re-windows the first
        p1.withColumn("s2", sum(col("s1")).over(w2))
          .withColumn("n2", count(lit(1)).over(w2))
          .filter(col("n2") === 5L)
          .select(col("day"), col("s2").as("kz_x25"))
      },
      Some("""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000
             |                        AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM orders GROUP BY 1),
             |p1 AS (SELECT day,
             |              CAST(sum(c) OVER w AS BIGINT) AS s1,
             |              count(*) OVER w AS n1
             |       FROM daily
             |       WINDOW w AS (ORDER BY day RANGE BETWEEN 2 PRECEDING
             |                    AND 2 FOLLOWING)),
             |f1 AS (SELECT day, s1 FROM p1 WHERE n1 = 5),
             |p2 AS (SELECT day,
             |              CAST(sum(s1) OVER w AS BIGINT) AS s2,
             |              count(*) OVER w AS n2
             |       FROM f1
             |       WINDOW w AS (ORDER BY day RANGE BETWEEN 2 PRECEDING
             |                    AND 2 FOLLOWING))
             |SELECT day, s2 AS kz_x25 FROM p2 WHERE n2 = 5"""
        .stripMargin)),

    // ── Burrows' delta between corpus sources: per-source relative
    //    frequencies (e6) of the 30 globally-commonest words,
    //    z-scored across the 20 sources with exact long moments
    //    (z_e6 truncated toward zero — sign-factored, engine-
    //    identical), then delta(s,s') = mean |z − z'| over the word
    //    axis — an all-integer sum, so no cross-row double
    //    accumulation. Top-10 most-distant source pairs emitted.
    QueryDef("q_burrows_delta",
      (s, d) => {
        val words = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .localCheckpoint(false) // top-word pick + per-source counts
        val top = words.groupBy(col("w")).agg(count(lit(1)).as("cw"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cw").desc, col("w"))))
          .filter(col("rk") <= 30).select(col("w"))
          .localCheckpoint(false)
        val totals = words.groupBy(col("source"))
          .agg(count(lit(1)).as("tot"))
        val cnt = words.join(broadcast(top), "w")
          .groupBy(col("source"), col("w")).agg(count(lit(1)).as("csw"))
        // zero-filled source × word grid of e6 relative frequencies
        val grid = totals.crossJoin(broadcast(top))
          .join(cnt, Seq("source", "w"), "left")
          .select(col("source"), col("w"),
            expr("coalesce(csw, 0L) * 1000000 div tot").as("f"))
          .localCheckpoint(false)
        val mom = grid.groupBy(col("w"))
          .agg(count(lit(1)).as("j"), sum(col("f")).as("sf"),
            sum(expr("f * f")).as("sff"))
        val z = grid.join(broadcast(mom), "w")
          .withColumn("num", expr("(j * f - sf) * 1000000"))
          .withColumn("den", expr(
            """sqrt(CAST(j AS DOUBLE)
              |* (CAST(j AS DOUBLE) * CAST(sff AS DOUBLE)
              |   - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE)))"""
              .stripMargin))
          .withColumn("z_e6", expr(
            """CASE WHEN den = CAST('0.0' AS DOUBLE) THEN 0
              |WHEN num >= 0
              |  THEN CAST(floor(CAST(num AS DOUBLE) / den) AS BIGINT)
              |ELSE -CAST(floor(CAST(-num AS DOUBLE) / den) AS BIGINT)
              |END""".stripMargin))
          .select(col("source"), col("w"), col("z_e6"))
          .localCheckpoint(false) // both sides of the source-pair grid
        z.as("a").join(broadcast(z.as("b")),
            col("a.w") === col("b.w") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src1"), col("b.source").as("src2"))
          .agg(count(lit(1)).as("n_words"),
            sum(abs(col("a.z_e6") - col("b.z_e6"))).as("sd"))
          .withColumn("delta_e6", expr("sd div n_words"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("delta_e6").desc, col("src1"), col("src2"))))
          .filter(col("rk") <= 10)
          .selectExpr("src1", "src2", "CAST(n_words AS BIGINT) AS n_words",
            "delta_e6", "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH words AS (SELECT source,
             |                      unnest(string_split(text, ' ')) AS w
             |               FROM documents),
             |wf AS (SELECT source, w FROM words WHERE w <> ''),
             |top AS (SELECT w FROM (
             |          SELECT w, row_number() OVER (ORDER BY count(*) DESC,
             |                                       w) AS rk
             |          FROM wf GROUP BY w) WHERE rk <= 30),
             |totals AS (SELECT source, CAST(count(*) AS BIGINT) AS tot
             |           FROM wf GROUP BY 1),
             |cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS csw
             |        FROM wf JOIN top USING (w) GROUP BY 1, 2),
             |grid AS (SELECT t.source, p.w,
             |                coalesce(c.csw, 0) * 1000000 // t.tot AS f
             |         FROM totals t CROSS JOIN top p
             |         LEFT JOIN cnt c ON c.source = t.source AND c.w = p.w),
             |mom AS (SELECT w, CAST(count(*) AS BIGINT) AS j,
             |               CAST(sum(f) AS BIGINT) AS sf,
             |               CAST(sum(f * f) AS BIGINT) AS sff
             |        FROM grid GROUP BY 1),
             |z AS (SELECT g.source, g.w,
             |             CASE WHEN sqrt(CAST(j AS DOUBLE)
             |                    * (CAST(j AS DOUBLE) * CAST(sff AS DOUBLE)
             |                       - CAST(sf AS DOUBLE)
             |                         * CAST(sf AS DOUBLE)))
             |                    = CAST('0.0' AS DOUBLE) THEN 0
             |             WHEN (j * g.f - sf) * 1000000 >= 0
             |               THEN CAST(floor(CAST((j * g.f - sf) * 1000000
             |                      AS DOUBLE)
             |                    / sqrt(CAST(j AS DOUBLE)
             |                      * (CAST(j AS DOUBLE)
             |                         * CAST(sff AS DOUBLE)
             |                         - CAST(sf AS DOUBLE)
             |                           * CAST(sf AS DOUBLE))))
             |                    AS BIGINT)
             |             ELSE -CAST(floor(CAST(-((j * g.f - sf) * 1000000)
             |                      AS DOUBLE)
             |                    / sqrt(CAST(j AS DOUBLE)
             |                      * (CAST(j AS DOUBLE)
             |                         * CAST(sff AS DOUBLE)
             |                         - CAST(sf AS DOUBLE)
             |                           * CAST(sf AS DOUBLE))))
             |                    AS BIGINT)
             |             END AS z_e6
             |      FROM grid g JOIN mom USING (w)),
             |pairs AS (SELECT a.source AS src1, b.source AS src2,
             |                 CAST(count(*) AS BIGINT) AS n_words,
             |                 CAST(sum(abs(a.z_e6 - b.z_e6)) AS BIGINT)
             |                   AS sd
             |          FROM z a JOIN z b ON a.w = b.w
             |            AND a.source < b.source
             |          GROUP BY 1, 2),
             |r AS (SELECT src1, src2, n_words, sd // n_words AS delta_e6,
             |             CAST(row_number() OVER (ORDER BY sd // n_words
             |               DESC, src1, src2) AS BIGINT) AS rk
             |      FROM pairs)
             |SELECT src1, src2, n_words, delta_e6, rk
             |FROM r WHERE rk <= 10""".stripMargin))
  )
}
