package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-130 batch: spectral & second-moment time-series screens —
  * rolling 30-day revenue beta of the BUILDING segment against the
  * whole market (the exposure read beside q_trend_slope's drift),
  * spectral entropy of the hour-of-day profile per event type (how
  * peaked is the rhythm — flat traffic ≈ log2(8) bits over the 8
  * Goertzel bins, a single spike ≈ 0; reuses Round66's literal e6
  * cosine table), and the CUSUM-of-squares variance-changepoint
  * statistic (where does revenue VOLATILITY shift — q_changepoint only
  * finds mean shifts). Moments ride decimal(38,0)/HUGEINT; logs are
  * the fixed-point integer log₂ ([[graft.ops.Bm25.log2E6]]), so both
  * engines emit identical integers.
  */
object Round130Queries {

  /** cos(m·15°)·1e6, m = 0..23 (same literal table as Round66/83;
    * sin(m·15°) = cos((m+18)·15°)). */
  private val cosT = Seq(1000000L, 965926L, 866025L, 707107L, 500000L,
    258819L, 0L, -258819L, -500000L, -707107L, -866025L, -965926L,
    -1000000L, -965926L, -866025L, -707107L, -500000L, -258819L, 0L,
    258819L, 500000L, 707107L, 866025L, 965926L)

  private def caseFor(idx: String, shift: Int): String =
    "CASE " + cosT.indices.map { m =>
      s"WHEN ($idx + $shift) % 24 = $m THEN ${cosT(m)}"
    }.mkString(" ") + " ELSE 0 END"

  def defs: Seq[QueryDef] = Seq(

    // ── Rolling beta, evaluated at month ends: daily (x = market
    //    revenue, y = BUILDING-segment revenue) in whole dollars; over
    //    the trailing 30 days β = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²), sign-
    //    factored e6 with decimal cross products. The day axis is
    //    calendar-bounded, so the unpartitioned window is safe.
    QueryDef("q_rolling_beta",
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
            "div 86400000000").as("day"))
          .agg(sum(floor(col("l_extendedprice")).cast("long")).as("x"),
            sum(when(col("c_mktsegment") === "BUILDING",
              floor(col("l_extendedprice")).cast("long")).otherwise(0L))
              .as("y"))
        val w30 = Window.orderBy(col("day")).rowsBetween(-29, 0)
        val mw = Window.partitionBy(expr("day div 32"))
        val roll = daily
          .withColumn("n", count(lit(1)).over(w30))
          .withColumn("sx", sum(col("x")).over(w30))
          .withColumn("sy", sum(col("y")).over(w30))
          .withColumn("sxx", sum(expr(s"CAST(x AS $dec) * x")).over(w30))
          .withColumn("sxy", sum(expr(s"CAST(x AS $dec) * y")).over(w30))
          .filter(col("n") === 30)
        // month-end = the max day of each day-div-32 bucket present —
        // NOT a calendar month, but identical in both engines and
        // bounded like one.
        roll.withColumn("mx", max(col("day")).over(mw))
          .filter(col("day") === col("mx"))
          .selectExpr("day",
            s"""CAST(CASE
               |  WHEN CAST(n AS $dec) * sxy - CAST(sx AS $dec) * sy >= 0
               |  THEN (CAST(n AS $dec) * sxy - CAST(sx AS $dec) * sy)
               |       * 1000000
               |       div (CAST(n AS $dec) * sxx - CAST(sx AS $dec) * sx)
               |  ELSE -((CAST(sx AS $dec) * sy - CAST(n AS $dec) * sxy)
               |       * 1000000
               |       div (CAST(n AS $dec) * sxx - CAST(sx AS $dec) * sx))
               |END AS BIGINT) AS beta_e6""".stripMargin,
            "CAST(sy * 1000000 div sx AS BIGINT) AS share_e6")
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(CAST(l_shipdate AS TIMESTAMP))
             |           // 86400000000 AS day,
             |         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT))
             |           AS BIGINT) AS x,
             |         CAST(sum(CASE WHEN c.c_mktsegment = 'BUILDING'
             |             THEN CAST(floor(l_extendedprice) AS BIGINT)
             |             ELSE 0 END) AS BIGINT) AS y
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1),
             |roll AS (
             |  SELECT day,
             |         CAST(count(*) OVER w AS BIGINT) AS n,
             |         CAST(sum(x) OVER w AS BIGINT) AS sx,
             |         CAST(sum(y) OVER w AS BIGINT) AS sy,
             |         sum(CAST(x AS HUGEINT) * x) OVER w AS sxx,
             |         sum(CAST(x AS HUGEINT) * y) OVER w AS sxy
             |  FROM daily
             |  WINDOW w AS (ORDER BY day
             |               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)),
             |me AS (SELECT *, max(day) OVER (PARTITION BY day // 32)
             |                AS mx
             |       FROM roll WHERE n = 30)
             |SELECT day,
             |       CAST(CASE
             |         WHEN CAST(n AS HUGEINT) * sxy
             |              - CAST(sx AS HUGEINT) * sy >= 0
             |         THEN (CAST(n AS HUGEINT) * sxy
             |               - CAST(sx AS HUGEINT) * sy) * 1000000
             |              // (CAST(n AS HUGEINT) * sxx
             |                 - CAST(sx AS HUGEINT) * sx)
             |         ELSE -((CAST(sx AS HUGEINT) * sy
             |                 - CAST(n AS HUGEINT) * sxy) * 1000000
             |              // (CAST(n AS HUGEINT) * sxx
             |                 - CAST(sx AS HUGEINT) * sx))
             |       END AS BIGINT) AS beta_e6,
             |       CAST(sy * 1000000 // sx AS BIGINT) AS share_e6
             |FROM me WHERE day = mx""".stripMargin)),

    // ── Spectral entropy per event type over the 8 Goertzel bins
    //    (1..8 cycles/day on the 24-row hour-of-day profile): powers
    //    P_k close in decimal, shares and the entropy term are
    //    fixed-point integer log₂ — Σ p·log2(ΣP/P_k) in e6 bits.
    QueryDef("q_spectral_entropy",
      (s, d) => {
        val dec = "decimal(38,0)"
        val prof = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
          .agg(count(lit(1)).as("c"))
        val freqs = s.range(1, 9).select(col("id").as("freq"))
        val pw = prof.crossJoin(broadcast(freqs))
          .withColumn("idx", expr("(freq * hod) % 24"))
          .withColumn("cosv", expr(caseFor("idx", 0)))
          .withColumn("sinv", expr(caseFor("idx", 18)))
          .groupBy(col("event_type"), col("freq"))
          .agg(sum(expr("c * cosv")).cast(dec).as("sc"),
            sum(expr("c * sinv")).cast(dec).as("ss"))
          .select(col("event_type"), col("freq"),
            expr("CAST((sc * sc + ss * ss) div 1000000000000 AS BIGINT)")
              .as("p"))
          .localCheckpoint(false) // totals + the entropy fold
        val tot = pw.groupBy(col("event_type"))
          .agg(sum(col("p")).as("ptot"),
            max(expr("named_struct('p', p, 'freq', freq)")).as("pk"))
        pw.join(tot, "event_type")
          .filter(col("p") > 0 && col("ptot") > 0)
          .select(col("event_type"), col("ptot"),
            col("pk.freq").as("peak_freq"),
            (expr("p * 1000000 div ptot") *
              (Bm25.log2E6(col("ptot")) - Bm25.log2E6(col("p"))))
              .as("term"))
          .groupBy(col("event_type"))
          .agg(max(col("ptot")).as("total_power"),
            max(col("peak_freq")).as("peak_freq"),
            expr("CAST(sum(term) div 1000000 AS BIGINT)")
              .as("entropy_e6"))
          .selectExpr("event_type",
            "CAST(total_power AS BIGINT) AS total_power",
            "CAST(peak_freq AS BIGINT) AS peak_freq", "entropy_e6")
      },
      Some {
        s"""WITH prof AS (
           |  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
           |         CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |g AS (SELECT event_type, f.range AS freq, hod, c,
           |             (f.range * hod) % 24 AS idx
           |      FROM prof CROSS JOIN range(1, 9) f),
           |t AS (SELECT event_type, freq, c,
           |             ${caseFor("idx", 0)} AS cosv,
           |             ${caseFor("idx", 18)} AS sinv
           |      FROM g),
           |pwr AS (SELECT event_type, freq,
           |               CAST((CAST(sum(c * cosv) AS HUGEINT)
           |                     * CAST(sum(c * cosv) AS HUGEINT)
           |                   + CAST(sum(c * sinv) AS HUGEINT)
           |                     * CAST(sum(c * sinv) AS HUGEINT))
           |                 // 1000000000000 AS BIGINT) AS p
           |        FROM t GROUP BY 1, 2),
           |tot AS (SELECT event_type, CAST(sum(p) AS BIGINT) AS ptot,
           |               -- p·16+freq ≡ lexicographic (p, freq): freq≤8
           |               CAST(max_by(freq, p * 16 + freq) AS BIGINT)
           |                 AS peak_freq
           |        FROM pwr GROUP BY 1),
           |term AS (SELECT pwr.event_type, tot.ptot, tot.peak_freq,
           |                (pwr.p * 1000000 // tot.ptot)
           |                * (${Bm25.log2E6Sql("tot.ptot")}
           |                   - ${Bm25.log2E6Sql("pwr.p")}) AS term
           |         FROM pwr JOIN tot ON pwr.event_type = tot.event_type
           |         WHERE pwr.p > 0 AND tot.ptot > 0)
           |SELECT event_type,
           |       CAST(max(ptot) AS BIGINT) AS total_power,
           |       max(peak_freq) AS peak_freq,
           |       CAST(sum(term) // 1000000 AS BIGINT)
           |         AS entropy_e6
           |FROM term GROUP BY 1""".stripMargin
      }),

    // ── CUSUM of squares on daily revenue: D = max_k |Σ_{t≤k}x² ·n −
    //    k·Σx²| /(n·Σx²) — where the volatility regime breaks. Squared
    //    sums ride decimal; the cumulative window runs on the bounded
    //    day axis (calendar-sized, never data-sized).
    QueryDef("q_cusum_squares",
      (s, d) => {
        val dec = "decimal(38,0)"
        val daily = Tables.lineitem(s, d)
          .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
            "div 86400000000").as("day"))
          .agg(sum(floor(col("l_extendedprice")).cast("long")).as("x"))
        val cum = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        daily
          .withColumn("cxx", sum(expr(s"CAST(x AS $dec) * x")).over(cum))
          .withColumn("k", count(lit(1)).over(cum))
          .withColumn("txx", sum(expr(s"CAST(x AS $dec) * x")).over(all))
          .withColumn("n", count(lit(1)).over(all))
          .withColumn("dnum", expr(
            """CASE WHEN cxx * n >= txx * k THEN cxx * n - txx * k
              |ELSE txx * k - cxx * n END""".stripMargin))
          .withColumn("d_e6",
            expr(s"CAST(dnum * 1000000 div (txx * n) AS BIGINT)"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("d_e6").desc, col("day"))))
          .filter(col("rk") === 1)
          .selectExpr("day AS break_day", "CAST(k AS BIGINT) AS k",
            "CAST(n AS BIGINT) AS n_days", "d_e6")
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(CAST(l_shipdate AS TIMESTAMP))
             |           // 86400000000 AS day,
             |         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT))
             |           AS BIGINT) AS x
             |  FROM lineitem GROUP BY 1),
             |c AS (SELECT day,
             |             sum(CAST(x AS HUGEINT) * x) OVER cum AS cxx,
             |             CAST(count(*) OVER cum AS BIGINT) AS k,
             |             sum(CAST(x AS HUGEINT) * x) OVER () AS txx,
             |             CAST(count(*) OVER () AS BIGINT) AS n
             |      FROM daily
             |      WINDOW cum AS (ORDER BY day
             |                     ROWS UNBOUNDED PRECEDING)),
             |d AS (SELECT day, k, n,
             |             CAST((CASE WHEN cxx * n >= txx * k
             |                     THEN cxx * n - txx * k
             |                     ELSE txx * k - cxx * n END) * 1000000
             |               // (txx * n) AS BIGINT) AS d_e6
             |      FROM c)
             |SELECT day AS break_day, k, n AS n_days, d_e6
             |FROM (SELECT *, row_number() OVER (ORDER BY d_e6 DESC, day)
             |        AS rk
             |      FROM d)
             |WHERE rk = 1""".stripMargin))
  )
}
