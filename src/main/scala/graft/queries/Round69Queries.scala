package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-69 batch: Tukey median polish (robust two-way decomposition of
  * the dow×hour grid — the outlier-immune alternative to
  * q_seasonal_profile's means), Monroe–Colaresi–Quinn Dirichlet
  * log-odds (the discriminative-words readout q_kl_vocab's divergence
  * number cannot name), and partial autocorrelation at lags 1–3 via
  * Durbin–Levinson (the AR-order diagnostic q_acf leaves open).
  */
object Round69Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Median polish, 2 sweeps over the 7×24 grid; positional lower
    //    medians keep every step integer-exact.
    QueryDef("q_median_polish",
      (s, d) => {
        val grid = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
          .groupBy(expr("(h div 24 + 4) % 7").as("dow"),
            expr("h % 24").as("hod"))
          .agg(count(lit(1)).as("orig"))
          .withColumn("v", col("orig"))
          .localCheckpoint(false) // 168-row grid; each sweep re-reads it
        def sweep(df: org.apache.spark.sql.DataFrame, byCol: String,
                  ordTie: String) = {
          val w = Window.partitionBy(col(byCol))
          val med = df
            .withColumn("rn", row_number().over(
              w.orderBy(col("v"), col(ordTie))))
            .withColumn("cnt", count(lit(1)).over(w))
            .where(col("rn") === expr("(cnt + 1) div 2"))
            .select(col(byCol), col("v").as("med"))
          df.join(broadcast(med), byCol)
            .withColumn("v", col("v") - col("med")).drop("med")
            // truncate lineage: without this the 4-sweep chain re-derives
            // the grid per sweep (31 exchanges in the r8 gate probe)
            .localCheckpoint(false)
        }
        val once = sweep(sweep(grid, "dow", "hod"), "hod", "dow")
        val twice = sweep(sweep(once, "dow", "hod"), "hod", "dow")
        twice.select(col("dow"), col("hod"), col("orig"),
          col("v").as("resid"))
      },
      Some {
        def sweepSql(src: String, by: String, tie: String, out: String) =
          s"""m_$out AS (SELECT $by, v AS med FROM (
             |  SELECT $by, v, row_number() OVER (PARTITION BY $by
             |    ORDER BY v, $tie) AS rn,
             |    count(*) OVER (PARTITION BY $by) AS cnt
             |  FROM $src) WHERE rn = (cnt + 1) // 2),
             |$out AS (SELECT s.dow, s.hod, s.orig, s.v - m.med AS v
             |         FROM $src s JOIN m_$out m ON s.$by = m.$by)"""
            .stripMargin
        s"""WITH grid AS (
           |  SELECT (h // 24 + 4) % 7 AS dow, h % 24 AS hod,
           |         CAST(count(*) AS BIGINT) AS orig,
           |         CAST(count(*) AS BIGINT) AS v
           |  FROM (SELECT epoch_us(ts) // 3600000000 AS h FROM events)
           |  GROUP BY 1, 2),
           |${sweepSql("grid", "dow", "hod", "s1")},
           |${sweepSql("s1", "hod", "dow", "s2")},
           |${sweepSql("s2", "dow", "hod", "s3")},
           |${sweepSql("s3", "hod", "dow", "s4")}
           |SELECT dow, hod, orig, v AS resid FROM s4""".stripMargin
      }),

    // ── Monroe log-odds with a flat Dirichlet prior: en vs non-en
    //    word usage, top 15 by |z| each side.
    QueryDef("q_log_odds_words",
      (s, d) => {
        val w = Tables.documents(s, d)
          .select((col("lang") === "en").as("isA"),
            explode(split(col("text"), " ")).as("word"))
          .where(col("word") =!= "")
        val counts = w.groupBy(col("word"))
          .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("isA"), 1L).otherwise(0L)).as("cb"))
          .where(col("ca") + col("cb") >= 20)
          .localCheckpoint(false) // reused: totals + scoring
        val tot = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
          count(lit(1)).as("vocab"))
        counts.crossJoin(broadcast(tot))
          .withColumn("la", Bm25.log2E6(col("ca") + 1) -
            Bm25.log2E6(greatest(lit(1L),
              col("na") + col("vocab") - col("ca") - 1)))
          .withColumn("lb", Bm25.log2E6(col("cb") + 1) -
            Bm25.log2E6(greatest(lit(1L),
              col("nb") + col("vocab") - col("cb") - 1)))
          // Sign-factored: Spark `div` truncates, DuckDB `//` floors — the
          // two agree only on non-negative numerators, and la < lb for
          // every non-en-leaning word.
          .withColumn("dlt", expr("CAST(la AS BIGINT) - CAST(lb AS BIGINT)"))
          .withColumn("delta_e6", expr(
            """CASE WHEN dlt >= 0 THEN dlt * 693147 div 1000000
              |ELSE -((-dlt) * 693147 div 1000000) END""".stripMargin))
          .withColumn("z", expr(
            """round(CAST(delta_e6 AS DOUBLE) / CAST('1000000' AS DOUBLE)
              |/ sqrt(CAST('1.0' AS DOUBLE) / CAST(ca + 1 AS DOUBLE)
              |     + CAST('1.0' AS DOUBLE) / CAST(cb + 1 AS DOUBLE)), 6)"""
              .stripMargin))
          .withColumn("rk", row_number().over(
            Window.orderBy(abs(col("z")).desc, col("word"))))
          .where(col("rk") <= 15)
          .select(col("word"), col("ca"), col("cb"), col("delta_e6"),
            col("z"))
      },
      Some {
        s"""WITH w AS (SELECT lang = 'en' AS isA,
           |                 wd AS word
           |          FROM (SELECT lang,
           |                       unnest(string_split(text, ' ')) AS wd
           |                FROM documents) u
           |          WHERE wd <> ''),
           |counts AS (SELECT word,
           |                  CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END)
           |                    AS BIGINT) AS ca,
           |                  CAST(sum(CASE WHEN isA THEN 0 ELSE 1 END)
           |                    AS BIGINT) AS cb
           |           FROM w GROUP BY 1 HAVING ca + cb >= 20),
           |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
           |               CAST(sum(cb) AS BIGINT) AS nb,
           |               CAST(count(*) AS BIGINT) AS vocab
           |        FROM counts),
           |sc0 AS (SELECT word, ca, cb,
           |              CAST(${Bm25.log2E6Sql("(ca + 1)")} -
           |               ${Bm25.log2E6Sql("greatest(na + vocab - ca - 1, 1)")}
           |               - ${Bm25.log2E6Sql("(cb + 1)")} +
           |               ${Bm25.log2E6Sql("greatest(nb + vocab - cb - 1, 1)")}
           |               AS BIGINT) AS dlt
           |       FROM counts CROSS JOIN tot),
           |sc AS (SELECT word, ca, cb,
           |              CASE WHEN dlt >= 0 THEN dlt * 693147 // 1000000
           |                   ELSE -((-dlt) * 693147 // 1000000)
           |              END AS delta_e6
           |       FROM sc0),
           |z AS (SELECT word, ca, cb, delta_e6,
           |             round(CAST(delta_e6 AS DOUBLE)
           |               / CAST('1000000' AS DOUBLE)
           |               / sqrt(CAST('1.0' AS DOUBLE)
           |                      / CAST(ca + 1 AS DOUBLE)
           |                    + CAST('1.0' AS DOUBLE)
           |                      / CAST(cb + 1 AS DOUBLE)), 6) AS z
           |      FROM sc)
           |SELECT word, ca, cb, delta_e6, z FROM (
           |  SELECT *, row_number() OVER (ORDER BY abs(z) DESC, word)
           |    AS rk FROM z)
           |WHERE rk <= 15""".stripMargin
      }),

    // ── PACF lags 1–3 by Durbin–Levinson over exact n²-scaled daily
    //    count moments; one deterministic double sequence closes it.
    QueryDef("q_pacf",
      (s, d) => {
        val dec = "decimal(38,0)"
        val days = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("x"))
        val tot = days.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val w = Window.orderBy(col("day"))
        val led = days.crossJoin(broadcast(tot))
          .withColumn("c0", expr(s"CAST(n * x - sx AS $dec)"))
          .withColumn("x1", lead(col("x"), 1).over(w))
          .withColumn("x2", lead(col("x"), 2).over(w))
          .withColumn("x3", lead(col("x"), 3).over(w))
        val mom = led.agg(
          sum(expr("c0 * c0")).as("den"),
          sum(expr(s"CASE WHEN x1 IS NOT NULL THEN c0 * CAST(n * x1 - sx AS $dec) END")).as("n1"),
          sum(expr(s"CASE WHEN x2 IS NOT NULL THEN c0 * CAST(n * x2 - sx AS $dec) END")).as("n2"),
          sum(expr(s"CASE WHEN x3 IS NOT NULL THEN c0 * CAST(n * x3 - sx AS $dec) END")).as("n3"),
          max(expr("n")).as("n"))
        mom.selectExpr("CAST(n AS BIGINT) AS n",
            "CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1",
            "CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2",
            "CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3")
          .selectExpr("n", "r1", "r2", "r3",
            "(r2 - r1 * r1) / (1 - r1 * r1) AS p22")
          .selectExpr("n", "r1", "r2", "r3", "p22",
            "r1 * (1 - p22) AS p21")
          .selectExpr("n", "round(r1, 6) AS rho1", "round(r2, 6) AS rho2",
            "round(r3, 6) AS rho3", "round(r1, 6) AS pacf1",
            "round(p22, 6) AS pacf2",
            """round((r3 - p21 * r2 - p22 * r1)
              |/ (1 - p21 * r1 - p22 * r2), 6) AS pacf3""".stripMargin)
      },
      Some("""WITH days AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                    CAST(count(*) AS BIGINT) AS x
             |             FROM events GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx FROM days),
             |led AS (SELECT CAST(n * x - sx AS HUGEINT) AS c0,
             |               lead(x, 1) OVER (ORDER BY day) AS x1,
             |               lead(x, 2) OVER (ORDER BY day) AS x2,
             |               lead(x, 3) OVER (ORDER BY day) AS x3,
             |               n, sx
             |        FROM days CROSS JOIN tot),
             |mom AS (SELECT sum(c0 * c0) AS den,
             |               sum(CASE WHEN x1 IS NOT NULL THEN
             |                 c0 * CAST(n * x1 - sx AS HUGEINT) END) AS n1,
             |               sum(CASE WHEN x2 IS NOT NULL THEN
             |                 c0 * CAST(n * x2 - sx AS HUGEINT) END) AS n2,
             |               sum(CASE WHEN x3 IS NOT NULL THEN
             |                 c0 * CAST(n * x3 - sx AS HUGEINT) END) AS n3,
             |               max(n) AS n
             |        FROM led),
             |r AS (SELECT CAST(n AS BIGINT) AS n,
             |             CAST(n1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
             |             CAST(n2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
             |             CAST(n3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3
             |      FROM mom),
             |p2 AS (SELECT *, (r2 - r1 * r1) / (1 - r1 * r1) AS p22 FROM r),
             |p3 AS (SELECT *, r1 * (1 - p22) AS p21 FROM p2)
             |SELECT n, round(r1, 6) AS rho1, round(r2, 6) AS rho2,
             |       round(r3, 6) AS rho3, round(r1, 6) AS pacf1,
             |       round(p22, 6) AS pacf2,
             |       round((r3 - p21 * r2 - p22 * r1)
             |             / (1 - p21 * r1 - p22 * r2), 6) AS pacf3
             |FROM p3""".stripMargin))
  )
}
