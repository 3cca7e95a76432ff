package graft.queries

import graft.{QueryDef, Tables}
import graft.geo.{Hilbert, HexSql}
import graft.stream.Pipeline
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-100 batch: Hilbert-curve spatial layout (ZOrder's
  * better-locality sibling), Page–Hinkley sequential drift detection,
  * and the Grubbs max-normed-residual outlier test — two data-quality
  * monitors plus the last missing physical-layout primitive.
  */
object Round100Queries {

  private val res = 8
  private val posCell = HexSql.withCellId(Tables.positionsSql, "lat", "lon", res)

  def defs: Seq[QueryDef] = Seq(

    // ── Hilbert layout audit (mirror of q_zorder_layout): occupied
    //    cells linearized by Hilbert index, bucketed into d-ranges
    //    (≈ output files). Unlike Morton, consecutive d are ALWAYS
    //    grid-adjacent (HilbertSpec proves it exhaustively), so each
    //    bucket is one connected blob — fewer files per viewport scan.
    QueryDef("q_hilbert_layout",
      (s, d) => {
        val cells = Pipeline.snap(Pipeline.sanitize(Tables.positions(s, d)), res)
          .groupBy(col("cellId")).agg(count(lit(1)).as("cnt"))
          .withColumn("parts", split(col("cellId"), ":"))
          .select(col("cnt"),
            element_at(col("parts"), 2).cast("long").as("qi"),
            element_at(col("parts"), 3).cast("long").as("ri"))
        Hilbert.withHilbert(cells, col("qi"), col("ri"), "hd", bits = 10)
          .groupBy(expr("hd div 1024").as("d_bucket"))
          .agg(count(lit(1)).as("n_cells"), sum(col("cnt")).as("n_events"),
            min(col("hd")).as("d_min"), max(col("hd")).as("d_max"))
      },
      Some(s"""WITH cells AS (SELECT g_qi AS qi, g_ri AS ri,
              |                      CAST(count(*) AS BIGINT) AS cnt
              |               FROM $posCell t GROUP BY 1, 2),
              |${Hilbert.cteSql("cells", "qi", "ri", Seq("cnt"), bits = 10)}
              |SELECT d // 1024 AS d_bucket, count(*) AS n_cells,
              |       CAST(sum(cnt) AS BIGINT) AS n_events,
              |       min(d) AS d_min, max(d) AS d_max
              |FROM hf GROUP BY 1""".stripMargin)),

    // ── Page–Hinkley: sequential mean-shift detector over the daily
    //    value series. All-integer: daily mean e6 (non-negative
    //    numerators only, so div truncation is engine-identical),
    //    running mean via prefix-sum div t, PH statistic
    //    U_t − min_{i≤t} U_i with drift allowance δ=0.01. Windows ride
    //    the bounded post-aggregate day axis.
    QueryDef("q_page_hinkley",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
          .groupBy(col("day"))
          .agg(sum(col("cents")).as("sc"), count(lit(1)).as("cnt"))
          .withColumn("x_e6", expr("sc * 10000 div cnt"))
        val ord = Window.orderBy(col("day"))
        val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily
          .withColumn("t", row_number().over(ord).cast("long"))
          .withColumn("cx", sum(col("x_e6")).over(cum))
          .withColumn("mu_e6", expr("cx div t"))
          .withColumn("inc", expr("x_e6 - mu_e6 - 10000"))
          .withColumn("u_e6", sum(col("inc")).over(cum))
          .withColumn("ph_e6", col("u_e6") - min(col("u_e6")).over(cum))
          .withColumn("alarm",
            expr("CASE WHEN ph_e6 > 5000000 THEN 1 ELSE 0 END").cast("long"))
          .select(col("day"), col("x_e6"), col("u_e6"), col("ph_e6"),
            col("alarm"))
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                      CAST(sum(CAST(floor(value * 100 + 0.5)
             |                        AS BIGINT)) AS BIGINT) AS sc,
             |                      CAST(count(*) AS BIGINT) AS cnt
             |               FROM events GROUP BY 1),
             |x AS (SELECT day, sc * 10000 // cnt AS x_e6 FROM daily),
             |c AS (SELECT day, x_e6,
             |             CAST(row_number() OVER w AS BIGINT) AS t,
             |             CAST(sum(x_e6) OVER (ORDER BY day
             |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cx
             |      FROM x WINDOW w AS (ORDER BY day)),
             |i AS (SELECT day, x_e6, x_e6 - cx // t - 10000 AS inc FROM c),
             |u AS (SELECT day, x_e6,
             |             CAST(sum(inc) OVER (ORDER BY day
             |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u_e6
             |      FROM i)
             |SELECT day, x_e6, u_e6,
             |       u_e6 - CAST(min(u_e6) OVER (ORDER BY day
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ph_e6,
             |       CAST(CASE WHEN u_e6 - min(u_e6) OVER (ORDER BY day
             |         ROWS UNBOUNDED PRECEDING) > 5000000
             |         THEN 1 ELSE 0 END AS BIGINT) AS alarm
             |FROM u""".stripMargin)),

    // ── Grubbs test: max normed residual G = max|x−x̄|/s over daily
    //    mean cents. n-scaled deviations stay exact integers; the one
    //    sqrt is floor(sqrt(double)) — IEEE-identical cross-engine on
    //    an exactly-representable integer argument (< 2^53).
    QueryDef("q_grubbs",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"),
            expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("cents"))
          .groupBy(col("day"))
          .agg(sum(col("cents")).as("sc"), count(lit(1)).as("cnt"))
          .withColumn("x", expr("sc div cnt"))
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(expr("x * x")).as("sxx"))
        daily.crossJoin(broadcast(tot))
          .withColumn("dev", abs(expr("n * x - sx")))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("dev").desc, col("day"))))
          .where(col("rk") === 1)
          .selectExpr("CAST(n AS BIGINT) AS n_days", "day AS outlier_day",
            "x AS x_cents",
            // greatest(1,…): zero-variance degenerate input must not
            // divide by 0 (Spark nulls, DuckDB errors — divergent)
            """dev * 1000000 div greatest(1L, CAST(floor(sqrt(
              |  CAST(n * (n * sxx - sx * sx) AS DOUBLE)
              |    / CAST(n - 1 AS DOUBLE))) AS BIGINT)) AS g_e6""".stripMargin)
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                      CAST(sum(CAST(floor(value * 100 + 0.5)
             |                        AS BIGINT)) AS BIGINT) AS sc,
             |                      CAST(count(*) AS BIGINT) AS cnt
             |               FROM events GROUP BY 1),
             |x AS (SELECT day, sc // cnt AS x FROM daily),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(x) AS BIGINT) AS sx,
             |               CAST(sum(x * x) AS BIGINT) AS sxx FROM x),
             |dv AS (SELECT day, x, abs(n * x - sx) AS dev, n, sx, sxx
             |       FROM x CROSS JOIN tot)
             |SELECT n AS n_days, day AS outlier_day, x AS x_cents,
             |       dev * 1000000 // greatest(1, CAST(floor(sqrt(
             |         CAST(n * (n * sxx - sx * sx) AS DOUBLE)
             |           / CAST(n - 1 AS DOUBLE))) AS BIGINT)) AS g_e6
             |FROM (SELECT *, row_number() OVER (ORDER BY dev DESC, day)
             |        AS rk FROM dv)
             |WHERE rk = 1""".stripMargin))
  )
}
