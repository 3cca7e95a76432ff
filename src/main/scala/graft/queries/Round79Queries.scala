package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-79 batch, operations-research + economics: the newsvendor
  * stocking level (critical-fractile quantile of daily demand plus its
  * exact expected under/overage cost — the decision q_weighted_quantile
  * only locates), Laspeyres/Paasche/Fisher price indices (the economy-
  * wide price-change aggregation behind q_price_elasticity's per-brand
  * slopes), and two-pass IPF raking (survey weights matched to both
  * the segment and nation margins — the weighting step before any
  * q_stratified_ate-style readout on a biased sample).
  */
object Round79Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Newsvendor: cu=3, co=1 → critical fractile 3/4; per brand the
    //    positional q* of daily demand and the exact integer cost at q*.
    QueryDef("q_newsvendor",
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("g"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
              " div 86400000000").as("day"),
            floor(col("l_quantity") + 0.5).cast("long").as("q"))
          .groupBy(col("g"), col("day")).agg(sum(col("q")).as("demand"))
          .localCheckpoint(false) // reused: quantile pick + cost eval
        val qstar = daily
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("g"))
              .orderBy(col("demand"), col("day"))))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("g"))))
          .where(col("rn") === expr("(3 * n + 3) div 4"))
          .select(col("g"), col("n").as("n_days"),
            col("demand").as("q_star"))
        daily.join(broadcast(qstar), "g")
          .groupBy(col("g"), col("n_days"), col("q_star"))
          .agg(sum(greatest(col("demand") - col("q_star"), lit(0L)) * 3L)
            .as("underage_cost"),
            sum(greatest(col("q_star") - col("demand"), lit(0L)) * 1L)
              .as("overage_cost"))
          .withColumn("total_cost",
            col("underage_cost") + col("overage_cost"))
      },
      Some("""WITH daily AS (
             |  SELECT p_brand AS g,
             |         epoch_us(l_shipdate) // 86400000000 AS day,
             |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
             |           AS BIGINT) AS demand
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |qstar AS (SELECT g, n AS n_days, demand AS q_star FROM (
             |            SELECT *, row_number() OVER (PARTITION BY g
             |              ORDER BY demand, day) AS rn,
             |              CAST(count(*) OVER (PARTITION BY g) AS BIGINT)
             |                AS n
             |            FROM daily)
             |          WHERE rn = (3 * n + 3) // 4)
             |SELECT daily.g, n_days, q_star,
             |       CAST(sum(greatest(demand - q_star, 0) * 3) AS BIGINT)
             |         AS underage_cost,
             |       CAST(sum(greatest(q_star - demand, 0) * 1) AS BIGINT)
             |         AS overage_cost,
             |       CAST(sum(greatest(demand - q_star, 0) * 3)
             |            + sum(greatest(q_star - demand, 0) * 1) AS BIGINT)
             |         AS total_cost
             |FROM daily JOIN qstar ON daily.g = qstar.g
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ── Price indices 1996→1997 over parts traded in both years:
    //    p = avg unit price (cents, truncating), q = yearly quantity.
    QueryDef("q_price_index",
      (s, d) => {
        val dec = "decimal(38,0)"
        val py = Tables.lineitem(s, d)
          .select(col("l_partkey").as("pk"),
            expr("year(l_shipdate)").as("yr"),
            floor(col("l_quantity") + 0.5).cast("long").as("q"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
          .where(col("yr").isin(1996, 1997))
          .groupBy(col("pk"), col("yr"))
          .agg(sum(col("q")).as("qty"), sum(col("v")).as("val"))
          .withColumn("p", expr("val div greatest(qty, 1)"))
        val a = py.where(col("yr") === 1996)
          .select(col("pk"), col("p").as("p0"), col("qty").as("q0"))
        val b = py.where(col("yr") === 1997)
          .select(col("pk"), col("p").as("p1"), col("qty").as("q1"))
        a.join(b, "pk")
          .agg(count(lit(1)).as("n_parts"),
            sum(expr(s"CAST(p1 AS $dec) * CAST(q0 AS $dec)")).as("p1q0"),
            sum(expr(s"CAST(p0 AS $dec) * CAST(q0 AS $dec)")).as("p0q0"),
            sum(expr(s"CAST(p1 AS $dec) * CAST(q1 AS $dec)")).as("p1q1"),
            sum(expr(s"CAST(p0 AS $dec) * CAST(q1 AS $dec)")).as("p0q1"))
          .selectExpr("n_parts",
            "CAST(p1q0 * 1000000 div p0q0 AS BIGINT) AS laspeyres_e6",
            "CAST(p1q1 * 1000000 div p0q1 AS BIGINT) AS paasche_e6",
            """round(sqrt(CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE)
              |* (CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE))), 6)
              |AS fisher""".stripMargin)
      },
      Some("""WITH py AS (
             |  SELECT l_partkey AS pk, year(l_shipdate) AS yr,
             |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
             |           AS BIGINT) AS qty,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS val
             |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
             |  GROUP BY 1, 2),
             |pp AS (SELECT pk, yr, qty, val // greatest(qty, 1) AS p
             |       FROM py),
             |j AS (SELECT a.pk, a.p AS p0, a.qty AS q0, b.p AS p1,
             |             b.qty AS q1
             |      FROM (SELECT * FROM pp WHERE yr = 1996) a
             |      JOIN (SELECT * FROM pp WHERE yr = 1997) b
             |        ON a.pk = b.pk),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
             |             sum(CAST(p1 AS HUGEINT) * CAST(q0 AS HUGEINT))
             |               AS p1q0,
             |             sum(CAST(p0 AS HUGEINT) * CAST(q0 AS HUGEINT))
             |               AS p0q0,
             |             sum(CAST(p1 AS HUGEINT) * CAST(q1 AS HUGEINT))
             |               AS p1q1,
             |             sum(CAST(p0 AS HUGEINT) * CAST(q1 AS HUGEINT))
             |               AS p0q1
             |      FROM j)
             |SELECT n_parts,
             |       CAST(p1q0 * 1000000 // p0q0 AS BIGINT) AS laspeyres_e6,
             |       CAST(p1q1 * 1000000 // p0q1 AS BIGINT) AS paasche_e6,
             |       round(sqrt(CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE)
             |         * (CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE))), 6)
             |         AS fisher
             |FROM m""".stripMargin)),

    // ── IPF raking, one row sweep + one column sweep in e6 fixed
    //    point: even-custkey sample reweighted to the full population's
    //    segment and nation margins.
    QueryDef("q_raking",
      (s, d) => {
        val u = Tables.customer(s, d)
          .select(col("c_mktsegment").as("seg"),
            col("c_nationkey").cast("long").as("nk"),
            col("c_custkey").as("ck"))
          .localCheckpoint(false) // population + sample margins
        val cells = u.where(col("ck") % 2 === 0)
          .groupBy(col("seg"), col("nk")).agg(count(lit(1)).as("n_cell"))
        val targetRow = u.groupBy(col("seg")).agg(count(lit(1)).as("t_row"))
        val targetCol = u.groupBy(col("nk")).agg(count(lit(1)).as("t_col"))
        // pass 1: match segment margins.  w1_e6 = t_row·1e6 / cur_row
        val w1 = cells.join(broadcast(targetRow), "seg")
          .withColumn("cur_row", sum(col("n_cell")).over(
            Window.partitionBy(col("seg"))))
          .withColumn("w1_e6", expr("t_row * 1000000 div cur_row"))
        // pass 2: match nation margins on the reweighted cells
        val w2 = w1.join(broadcast(targetCol), "nk")
          .withColumn("cur_col", sum(expr("n_cell * w1_e6")).over(
            Window.partitionBy(col("nk"))))
          .withColumn("w2_e6", expr(
            "w1_e6 * (t_col * 1000000 div (cur_col div 1000000)) " +
              "div 1000000"))
        w2.withColumn("wsum", sum(expr("n_cell * w2_e6")).over(
            Window.partitionBy(col("seg"))))
          .selectExpr("seg", "nk", "n_cell", "w2_e6", "t_row", "t_col",
            "abs(wsum div 1000000 - t_row) AS row_err")
      },
      Some("""WITH u AS (SELECT c_mktsegment AS seg,
             |                 CAST(c_nationkey AS BIGINT) AS nk,
             |                 c_custkey AS ck
             |          FROM customer),
             |cells AS (SELECT seg, nk, CAST(count(*) AS BIGINT) AS n_cell
             |          FROM u WHERE ck % 2 = 0 GROUP BY 1, 2),
             |tr AS (SELECT seg, CAST(count(*) AS BIGINT) AS t_row
             |       FROM u GROUP BY 1),
             |tc AS (SELECT nk, CAST(count(*) AS BIGINT) AS t_col
             |       FROM u GROUP BY 1),
             |w1 AS (SELECT cells.seg, nk, n_cell, t_row,
             |              CAST(sum(n_cell) OVER (PARTITION BY cells.seg)
             |                AS BIGINT) AS cur_row
             |       FROM cells JOIN tr ON cells.seg = tr.seg),
             |w1b AS (SELECT *, t_row * 1000000 // cur_row AS w1_e6 FROM w1),
             |w2 AS (SELECT w1b.seg, w1b.nk, n_cell, t_row, w1_e6, t_col,
             |              CAST(sum(n_cell * w1_e6) OVER (PARTITION BY
             |                w1b.nk) AS BIGINT) AS cur_col
             |       FROM w1b JOIN tc ON w1b.nk = tc.nk),
             |w2b AS (SELECT *, w1_e6 * (t_col * 1000000
             |               // (cur_col // 1000000)) // 1000000 AS w2_e6
             |        FROM w2)
             |SELECT seg, nk, n_cell, CAST(w2_e6 AS BIGINT) AS w2_e6,
             |       t_row, t_col,
             |       abs(CAST(sum(n_cell * w2_e6) OVER (PARTITION BY seg)
             |         AS BIGINT) // 1000000 - t_row) AS row_err
             |FROM w2b""".stripMargin))
  )
}
