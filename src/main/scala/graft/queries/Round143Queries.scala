package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-143 batch: temporal heatmap analytics over the deterministic
  * ping grid — hotspot persistence (cells in their day's top decile on
  * k of the last 7 days; the stability read a heatmap UI colors),
  * emerging cells (last-3-day surge ≥3× the prior-30-day daily mean —
  * the new-hotspot alert), and OD reciprocity (what share of directed
  * cell-to-cell flow mass has a reverse flow — q_flow_imbalance's
  * companion summary). Cells are the 1°×1° grid of
  * q_predictability; day-scoped ranks are partitioned windows, and
  * every surge test is an integer cross-multiply.
  */
object Round143Queries {

  /** (day, cx, cy, c): per-cell daily ping counts. */
  private def cellDay(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.events(s, d)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"),
        expr("((user_id * 37) % 17000) div 100").as("cx"),
        expr("((event_id * 91) % 35000) div 100").as("cy"))
      .agg(count(lit(1)).as("c"))

  private val cellDaySql =
    """cd AS (SELECT epoch_us(ts) // 86400000000 AS day,
      |              ((user_id * 37) % 17000) // 100 AS cx,
      |              ((event_id * 91) % 35000) // 100 AS cy,
      |              CAST(count(*) AS BIGINT) AS c
      |       FROM events GROUP BY 1, 2, 3)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Hotspot persistence: within each of the last 7 days, a cell is
    //    "hot" if its rank ≤ ceil(n_cells/10) (day-partitioned rank);
    //    output the persistence histogram — how many cells were hot on
    //    exactly k days.
    QueryDef("q_hotspot_persistence",
      (s, d) => {
        val cd = cellDay(s, d)
          .withColumn("mxd", max(col("day")).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .filter(col("day") > col("mxd") - 7)
        val hot = cd
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("day"))
              .orderBy(col("c").desc, col("cx"), col("cy"))))
          .withColumn("nc", count(lit(1)).over(
            Window.partitionBy(col("day"))))
          .filter(col("rk") * 10 <= col("nc") + 9) // rk ≤ ceil(nc/10)
        hot.groupBy(col("cx"), col("cy"))
          .agg(count(lit(1)).as("k_days"))
          .groupBy(col("k_days"))
          .agg(count(lit(1)).as("n_cells"))
          .selectExpr("CAST(k_days AS BIGINT) AS k_days",
            "CAST(n_cells AS BIGINT) AS n_cells")
      },
      Some(s"""WITH $cellDaySql,
             |win AS (SELECT * FROM
             |          (SELECT cd.*, max(day) OVER () AS mxd FROM cd)
             |        WHERE day > mxd - 7),
             |hot AS (SELECT cx, cy FROM
             |          (SELECT cx, cy,
             |                  row_number() OVER (PARTITION BY day
             |                    ORDER BY c DESC, cx, cy) AS rk,
             |                  count(*) OVER (PARTITION BY day) AS nc
             |           FROM win)
             |        WHERE rk * 10 <= nc + 9),
             |per AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS k_days
             |        FROM hot GROUP BY 1, 2)
             |SELECT k_days, CAST(count(*) AS BIGINT) AS n_cells
             |FROM per GROUP BY 1""".stripMargin)),

    // ── Emerging cells: recent = last-3-day total, base = prior-30-day
    //    total; emerging ⟺ recent·30 ≥ 3·base·3 (≥3× the base daily
    //    rate, integer cross-multiply) with base present. Top 20 by
    //    the e6 surge ratio.
    QueryDef("q_emerging_cells",
      (s, d) => {
        val cd = cellDay(s, d)
          .withColumn("mxd", max(col("day")).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        val agg = cd
          .filter(col("day") > col("mxd") - 33)
          .groupBy(col("cx"), col("cy"))
          .agg(sum(when(col("day") > col("mxd") - 3, col("c"))
            .otherwise(0L)).as("recent"),
            sum(when(col("day") <= col("mxd") - 3, col("c"))
              .otherwise(0L)).as("base"))
          .filter(col("base") > 0L && col("recent") * 30L >= col("base") * 9L)
          .withColumn("surge_e6", expr("recent * 10 * 1000000 div base"))
        agg.orderBy(col("surge_e6").desc, col("cx"), col("cy")).limit(20)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("surge_e6").desc, col("cx"), col("cy"))))
          .selectExpr("cx", "cy", "CAST(recent AS BIGINT) AS recent",
            "CAST(base AS BIGINT) AS base", "surge_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some(s"""WITH $cellDaySql,
             |w AS (SELECT * FROM
             |        (SELECT cd.*, max(day) OVER () AS mxd FROM cd)
             |      WHERE day > mxd - 33),
             |agg AS (SELECT cx, cy,
             |               CAST(sum(CASE WHEN day > mxd - 3 THEN c
             |                 ELSE 0 END) AS BIGINT) AS recent,
             |               CAST(sum(CASE WHEN day <= mxd - 3 THEN c
             |                 ELSE 0 END) AS BIGINT) AS base
             |        FROM w GROUP BY 1, 2),
             |em AS (SELECT cx, cy, recent, base,
             |              recent * 10 * 1000000 // base AS surge_e6
             |       FROM agg
             |       WHERE base > 0 AND recent * 30 >= base * 9)
             |SELECT cx, cy, recent, base, surge_e6, rk
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY surge_e6
             |        DESC, cx, cy) AS BIGINT) AS rk
             |      FROM em)
             |WHERE rk <= 20""".stripMargin)),

    // ── OD reciprocity: directed flows = consecutive-ping cell
    //    transitions per user (ONE user-keyed lag); reciprocity =
    //    Σ min(f(a→b), f(b→a)) / Σ f over distinct ordered pairs —
    //    the full-join on the canonical pair key is flow-axis sized.
    QueryDef("q_od_reciprocity",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val flows = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("((user_id * 37) % 17000) div 100").as("cx"),
            expr("((event_id * 91) % 35000) div 100").as("cy"))
          .withColumn("pcx", lag(col("cx"), 1).over(w))
          .withColumn("pcy", lag(col("cy"), 1).over(w))
          .filter(col("pcx").isNotNull &&
            (col("pcx") =!= col("cx") || col("pcy") =!= col("cy")))
          .groupBy(col("pcx"), col("pcy"), col("cx"), col("cy"))
          .agg(count(lit(1)).as("f"))
        val fwd = flows.select(col("pcx").as("ax"), col("pcy").as("ay"),
          col("cx").as("bx"), col("cy").as("by"), col("f"))
        val rev = flows.select(col("cx").as("ax"), col("cy").as("ay"),
          col("pcx").as("bx"), col("pcy").as("by"), col("f").as("fr"))
        fwd.join(rev, Seq("ax", "ay", "bx", "by"), "left")
          .agg(count(lit(1)).as("n_flows"), sum(col("f")).as("mass"),
            sum(least(col("f"), coalesce(col("fr"), lit(0L))))
              .as("recip_mass"))
          .selectExpr("CAST(n_flows AS BIGINT) AS n_flows",
            "CAST(mass AS BIGINT) AS mass",
            "CAST(recip_mass AS BIGINT) AS recip_mass",
            "recip_mass * 1000000 div mass AS reciprocity_e6")
      },
      Some("""WITH pts AS (
             |  SELECT user_id, ts, event_id,
             |         ((user_id * 37) % 17000) // 100 AS cx,
             |         ((event_id * 91) % 35000) // 100 AS cy
             |  FROM events),
             |tr AS (SELECT user_id, cx, cy,
             |              lag(cx) OVER w AS pcx,
             |              lag(cy) OVER w AS pcy
             |       FROM pts
             |       WINDOW w AS (PARTITION BY user_id
             |                    ORDER BY ts, event_id)),
             |flows AS (SELECT pcx, pcy, cx, cy,
             |                 CAST(count(*) AS BIGINT) AS f
             |          FROM tr
             |          WHERE pcx IS NOT NULL
             |            AND (pcx <> cx OR pcy <> cy)
             |          GROUP BY 1, 2, 3, 4)
             |SELECT CAST(count(*) AS BIGINT) AS n_flows,
             |       CAST(sum(a.f) AS BIGINT) AS mass,
             |       CAST(sum(least(a.f, coalesce(b.f, 0))) AS BIGINT)
             |         AS recip_mass,
             |       CAST(sum(least(a.f, coalesce(b.f, 0))) AS BIGINT)
             |         * 1000000 // CAST(sum(a.f) AS BIGINT)
             |         AS reciprocity_e6
             |FROM flows a LEFT JOIN flows b
             |  ON a.pcx = b.cx AND a.pcy = b.cy
             |  AND a.cx = b.pcx AND a.cy = b.pcy""".stripMargin))
  )
}
