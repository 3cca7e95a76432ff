package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-74 batch: 1-D earth mover's distance between length
  * distributions (the ORDERED-bin shift metric q_psi_drift's
  * bin-by-bin ratio misses — EMD sees "everything moved one bin
  * right"), month-over-month active-set churn (retained/added/churned
  * flows behind q_cohort_retention's survival rates), and the
  * dispersion index (variance-to-mean of daily volume per type — the
  * over/under-dispersion verdict next to q_burstiness).
  */
object Round74Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── EMD between en and non-en doc-length histograms: 20 fixed
    //    250-char bins, e6-normalized cumulative difference — all
    //    integer.
    QueryDef("q_emd_1d",
      (s, d) => {
        val b = Tables.documents(s, d)
          .select((col("lang") === "en").as("isA"),
            least(lit(19L), expr("n_chars div 250")).as("bin"))
        val cells = b.groupBy(col("bin"))
          .agg(sum(when(col("isA"), 1L).otherwise(0L)).as("ca"),
            sum(when(!col("isA"), 1L).otherwise(0L)).as("cb"))
        val tot = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val w = Window.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells.crossJoin(broadcast(tot))
          .withColumn("pa_e6", expr("ca * 1000000 div na"))
          .withColumn("pb_e6", expr("cb * 1000000 div nb"))
          .withColumn("cum_diff_e6",
            sum(col("pa_e6")).over(w) - sum(col("pb_e6")).over(w))
          .withColumn("emd_e6", sum(abs(col("cum_diff_e6"))).over(
            Window.partitionBy()))
          .select(col("bin"), col("ca"), col("cb"), col("pa_e6"),
            col("pb_e6"), col("cum_diff_e6"), col("emd_e6"))
      },
      Some("""WITH b AS (SELECT lang = 'en' AS isA,
             |                 least(19, n_chars // 250) AS bin
             |          FROM documents),
             |cells AS (SELECT bin,
             |                 CAST(sum(CASE WHEN isA THEN 1 ELSE 0 END)
             |                   AS BIGINT) AS ca,
             |                 CAST(sum(CASE WHEN isA THEN 0 ELSE 1 END)
             |                   AS BIGINT) AS cb
             |          FROM b GROUP BY 1),
             |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
             |               CAST(sum(cb) AS BIGINT) AS nb FROM cells),
             |cum AS (SELECT bin, ca, cb,
             |               ca * 1000000 // na AS pa_e6,
             |               cb * 1000000 // nb AS pb_e6,
             |               CAST(sum(ca * 1000000 // na) OVER (ORDER BY bin
             |                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |               - CAST(sum(cb * 1000000 // nb) OVER (ORDER BY
             |                 bin ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |                 AS cum_diff_e6
             |        FROM cells CROSS JOIN tot)
             |SELECT bin, ca, cb, pa_e6, pb_e6, cum_diff_e6,
             |       CAST(sum(abs(cum_diff_e6)) OVER () AS BIGINT) AS emd_e6
             |FROM cum""".stripMargin)),

    // ── Set churn: consecutive-month active customer flows.
    QueryDef("q_set_churn",
      (s, d) => {
        val act = Tables.orders(s, d)
          .select(col("o_custkey").as("ck"),
            expr("year(o_orderdate) * 12 + month(o_orderdate)").as("m"))
          .distinct()
          .localCheckpoint(false) // current/previous sides + counts
        val nm = act.groupBy(col("m")).agg(count(lit(1)).as("n_active"))
        val common = act.join(act.select(col("ck"),
            (col("m") + 1).as("m")), Seq("ck", "m"))
          .groupBy(col("m")).agg(count(lit(1)).as("retained"))
        nm.join(nm.select((col("m") + 1).as("m"),
            col("n_active").as("n_prev")), Seq("m"))
          .join(common, Seq("m"), "left")
          .selectExpr("m", "n_active", "n_prev",
            "coalesce(retained, CAST(0 AS BIGINT)) AS retained",
            "n_prev - coalesce(retained, CAST(0 AS BIGINT)) AS churned",
            "n_active - coalesce(retained, CAST(0 AS BIGINT)) AS added",
            """coalesce(retained, CAST(0 AS BIGINT)) * 1000000
              | div (n_active + n_prev - coalesce(retained,
              |      CAST(0 AS BIGINT))) AS jaccard_e6""".stripMargin)
      },
      Some("""WITH act AS (SELECT DISTINCT o_custkey AS ck,
             |                   year(o_orderdate) * 12
             |                     + month(o_orderdate) AS m
             |            FROM orders),
             |nm AS (SELECT m, CAST(count(*) AS BIGINT) AS n_active
             |       FROM act GROUP BY 1),
             |common AS (SELECT a.m, CAST(count(*) AS BIGINT) AS retained
             |           FROM act a JOIN act p
             |             ON a.ck = p.ck AND p.m + 1 = a.m
             |           GROUP BY 1)
             |SELECT nm.m, nm.n_active AS n_active, pv.n_active AS n_prev,
             |       coalesce(retained, 0) AS retained,
             |       pv.n_active - coalesce(retained, 0) AS churned,
             |       nm.n_active - coalesce(retained, 0) AS added,
             |       coalesce(retained, 0) * 1000000
             |         // (nm.n_active + pv.n_active - coalesce(retained, 0))
             |         AS jaccard_e6
             |FROM nm JOIN nm pv ON pv.m + 1 = nm.m
             |LEFT JOIN common ON common.m = nm.m""".stripMargin)),

    // ── Dispersion index: population VMR = (nΣx²−(Σx)²)/(n·Σx) per
    //    event type over daily counts, exact e6.
    QueryDef("q_dispersion_index",
      (s, d) => Tables.events(s, d)
        .select(col("event_type").as("et"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .groupBy(col("et"), col("day")).agg(count(lit(1)).as("x"))
        .groupBy(col("et"))
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("q"))
        .selectExpr("et", "n_days", "s * 1000000 div n_days AS mean_e6",
          "(n_days * q - s * s) * 1000000 div (n_days * s) AS vmr_e6"),
      Some("""WITH daily AS (SELECT event_type AS et,
             |                     epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS x
             |              FROM events GROUP BY 1, 2),
             |mom AS (SELECT et, CAST(count(*) AS BIGINT) AS n_days,
             |               CAST(sum(x) AS BIGINT) AS s,
             |               CAST(sum(x * x) AS BIGINT) AS q
             |        FROM daily GROUP BY 1)
             |SELECT et, n_days, s * 1000000 // n_days AS mean_e6,
             |       (n_days * q - s * s) * 1000000 // (n_days * s) AS vmr_e6
             |FROM mom""".stripMargin))
  )
}
