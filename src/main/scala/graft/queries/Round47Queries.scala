package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-47 batch: Croston intermittent-demand forecasting (the sparse
  * companion of q_holt_linear / q_forecast_backtest — EWMA over the
  * nonzero-demand subsequence plus EWMA over the demand gaps), order-3
  * permutation entropy (series complexity, the ordinal-pattern
  * companion of q_entropy_rate), and an epoch-folding periodicity scan
  * (period DETECTION over candidate folds — q_seasonal_profile assumes
  * the period, this one finds it).
  */
object Round47Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Croston per part over ship-day demand: parts ship ~30 lines
    //    over ~2400 days, the canonical intermittent shape. Quantities
    //    are integral doubles → floor(+0.5) to BIGINT.
    QueryDef("q_croston",
      (s, d) => TimeSeries.croston(
        Tables.lineitem(s, d).select(
          col("l_partkey").as("k"),
          expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
            .as("day"),
          floor(col("l_quantity") + 0.5).cast("long").as("q")),
        "k", "day", "q")
        .filter(col("n_demands") >= 5L),
      Some("""WITH src AS (SELECT l_partkey AS key,
             |                   epoch_us(l_shipdate) // 86400000000 AS day,
             |                   CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
             |            FROM lineitem),
             |nz AS (SELECT key, day, CAST(sum(q) AS BIGINT) AS q
             |       FROM src WHERE q > 0 GROUP BY 1, 2),
             |lg AS (SELECT key, day, q,
             |              day - lag(day) OVER (PARTITION BY key ORDER BY day) AS gap
             |       FROM nz),
             |f AS (SELECT key, CAST(count(*) AS BIGINT) AS n_demands,
             |         list_reduce(list_prepend(CAST(0 AS BIGINT),
             |                                  list(q ORDER BY day)),
             |                     (a, b) -> (a + b) // 2) AS z,
             |         list_reduce(list_prepend(CAST(0 AS BIGINT),
             |                                  list(gap ORDER BY day)
             |                                    FILTER (WHERE gap IS NOT NULL)),
             |                     (a, b) -> (a + b) // 2) AS p
             |      FROM lg GROUP BY 1)
             |SELECT key, n_demands, CAST(z AS BIGINT) AS z_q,
             |       CAST(p AS BIGINT) AS p_days,
             |       CAST(z * 1000 // greatest(p, 1) AS BIGINT) AS forecast_e3
             |FROM f WHERE n_demands >= 5""".stripMargin)),

    // ── Permutation entropy of event-value cents per event type:
    //    ordinal patterns over (ts, event_id)-ordered triples.
    QueryDef("q_permutation_entropy",
      (s, d) => TimeSeries.permutationEntropy(
        Tables.events(s, d)
          .withColumn("t_us", unix_micros(col("ts")))
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "t_us", "event_id", "cents"),
      Some {
        val lg = Bm25.log2E6Sql("n") + " - " + Bm25.log2E6Sql("c")
        s"""WITH e AS (SELECT event_type AS key, epoch_us(ts) AS t, event_id AS tie,
           |                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events),
           |tri AS (SELECT key, v,
           |               lag(v, 2) OVER w AS a, lag(v, 1) OVER w AS b
           |        FROM e WINDOW w AS (PARTITION BY key ORDER BY t, tie)),
           |pat AS (SELECT key,
           |          CAST(a <= b AS BIGINT) + 2 * CAST(b <= v AS BIGINT)
           |            + 4 * CAST(a <= v AS BIGINT) AS pid
           |        FROM tri WHERE a IS NOT NULL),
           |cnt AS (SELECT key, pid, CAST(count(*) AS BIGINT) AS c
           |        FROM pat GROUP BY 1, 2),
           |tot AS (SELECT key, CAST(sum(c) AS BIGINT) AS n,
           |               CAST(count(*) AS BIGINT) AS n_patterns
           |        FROM cnt GROUP BY 1),
           |h AS (SELECT key, max(n) AS n_windows, max(n_patterns) AS n_patterns,
           |         CAST(sum(c * ($lg)) // max(n) AS BIGINT) AS h_e6
           |      FROM cnt JOIN tot USING (key) GROUP BY key)
           |SELECT key, n_windows, n_patterns, h_e6,
           |       CAST(h_e6 * 1000000 // ${Bm25.log2E6Int(6L)} AS BIGINT) AS norm_e6
           |FROM h""".stripMargin
      }),

    // ── Epoch folding of the event stream over candidate periods
    //    {24h, 25h, 168h}: the diurnal fold should dominate the 25-hour
    //    control if the stream has a daily rhythm.
    QueryDef("q_epoch_folding",
      (s, d) => TimeSeries.epochFolding(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "t_us", Seq(24, 25, 168)),
      Some("""WITH hrs AS (SELECT epoch_us(ts) // 3600000000 AS h,
             |                   CAST(count(*) AS BIGINT) AS o_h
             |            FROM events GROUP BY 1),
             |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hrs),
             |spine AS (SELECT unnest(generate_series(h0, h1)) AS h FROM b),
             |pd AS (SELECT unnest([24, 25, 168]) AS p),
             |sup AS (SELECT p, h % p AS ph, CAST(count(*) AS BIGINT) AS s_ph
             |        FROM spine CROSS JOIN pd GROUP BY 1, 2),
             |st AS (SELECT p, CAST(sum(s_ph) AS BIGINT) AS s_tot FROM sup GROUP BY 1),
             |obs AS (SELECT p, h % p AS ph, CAST(sum(o_h) AS BIGINT) AS o_ph
             |        FROM hrs CROSS JOIN pd GROUP BY 1, 2),
             |tot AS (SELECT CAST(sum(o_h) AS BIGINT) AS n_events FROM hrs),
             |terms AS (SELECT p, greatest((n_events * s_ph * 1000) // s_tot, 1) AS e_e3,
             |                 coalesce(o_ph, 0) AS o_ph
             |          FROM sup LEFT JOIN obs USING (p, ph)
             |               JOIN st USING (p) CROSS JOIN tot)
             |SELECT CAST(p AS BIGINT) AS p, CAST(count(*) AS BIGINT) AS n_phases,
             |       CAST(max(t.n_events) AS BIGINT) AS n_events,
             |       CAST(sum(((o_ph * 1000 - e_e3) * (o_ph * 1000 - e_e3)) // e_e3)
             |            AS BIGINT) AS chi2_e3
             |FROM terms CROSS JOIN tot t GROUP BY 1""".stripMargin))
  )
}
