package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-91 batch: the time-series discord (the week whose daily-shape
  * vector sits farthest from every other week — matrix-profile-lite,
  * the anomaly q_seasonal_anomaly's per-hour gate can't see as a
  * SHAPE), the maximum-sum burst window (Kadane via prefix sums and a
  * running minimum — exact, window-only), and Tversky asymmetric
  * basket similarity (containment-weighted overlap where q_jaccard
  * treats both sides equally).
  */
object Round91Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Discord: weeks as 7-day count vectors (dense via dow pivot),
    //    brute pairwise d², the week with the LARGEST nearest-neighbor
    //    distance is the discord.
    QueryDef("q_ts_discord",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
          .withColumn("w", expr("day div 7"))
          .withColumn("dw", expr("day % 7"))
        val weeks = daily.groupBy(col("w"))
          .pivot("dw", 0 to 6).agg(first(col("c")))
          .na.fill(0L)
          .withColumn("n_days", expr((0 to 6).map(i => s"CAST(`$i` IS NOT NULL AS INT)").mkString(" + ")))
          .localCheckpoint(false) // both pair sides
        val b = weeks.columns.filter(_ != "w").foldLeft(
          weeks.withColumnRenamed("w", "w2")) { (df, c) =>
          df.withColumnRenamed(c, c + "_b")
        }
        val d2expr = (0 to 6).map(i =>
          s"(coalesce(`$i`, 0) - coalesce(`${i}_b`, 0)) * " +
            s"(coalesce(`$i`, 0) - coalesce(`${i}_b`, 0))").mkString(" + ")
        weeks.join(b, col("w") =!= col("w2"))
          .withColumn("d2", expr(d2expr))
          .groupBy(col("w")).agg(min(col("d2")).as("nn_d2"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("nn_d2").desc, col("w"))))
          .where(col("rk") <= 3)
          .select(col("w").as("week"), col("nn_d2"), col("rk"))
      },
      Some {
        val d2 = (0 to 6).map(i =>
          s"(coalesce(a.d$i, 0) - coalesce(b.d$i, 0)) * " +
            s"(coalesce(a.d$i, 0) - coalesce(b.d$i, 0))").mkString(" + ")
        val piv = (0 to 6).map(i =>
          s"max(CASE WHEN day % 7 = $i THEN c END) AS d$i").mkString(", ")
        s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
           |                     CAST(count(*) AS BIGINT) AS c
           |              FROM events GROUP BY 1),
           |weeks AS (SELECT day // 7 AS w, $piv
           |          FROM daily GROUP BY 1),
           |pairs AS (SELECT a.w, min($d2) AS nn_d2
           |          FROM weeks a JOIN weeks b ON a.w <> b.w
           |          GROUP BY 1)
           |SELECT w AS week, CAST(nn_d2 AS BIGINT) AS nn_d2, rk FROM (
           |  SELECT *, CAST(row_number() OVER (ORDER BY nn_d2 DESC, w)
           |    AS BIGINT) AS rk FROM pairs)
           |WHERE rk <= 3""".stripMargin
      }),

    // ── Max subarray: demeaned daily counts (n-scaled to stay exact),
    //    best burst = max over t of prefix_t − min(prefix before t).
    QueryDef("q_max_subarray",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("c"))
        val tot = daily.agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
        val ord = Window.orderBy(col("day"))
        val p = daily.crossJoin(broadcast(tot))
          // n-scaled demeaned value: n·c − s (integer, no division)
          .withColumn("v", expr("n * c - s"))
          .withColumn("pre", sum(col("v")).over(
            ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          // least(0, …): the empty prefix (sum 0) is always a valid start,
          // so subarrays beginning at day 1 count even when every strictly
          // preceding prefix is positive (Kadane's empty-prefix case).
          .withColumn("minpre", least(lit(0L), coalesce(min(col("pre")).over(
            ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))))
          .withColumn("burst_n", col("pre") - col("minpre"))
        p.withColumn("rk", row_number().over(
            Window.orderBy(col("burst_n").desc, col("day"))))
          .where(col("rk") === 1)
          .selectExpr("day AS burst_end_day", "burst_n AS burst_sum_nscaled",
            "CAST(n AS BIGINT) AS n_days")
      },
      Some("""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
             |                     CAST(count(*) AS BIGINT) AS c
             |              FROM events GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |               CAST(sum(c) AS BIGINT) AS s FROM daily),
             |p AS (SELECT day, n,
             |             CAST(sum(n * c - s) OVER (ORDER BY day
             |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre
             |      FROM daily CROSS JOIN tot),
             |q AS (SELECT day, n, pre,
             |             least(0, coalesce(min(pre) OVER (ORDER BY day
             |               ROWS BETWEEN UNBOUNDED PRECEDING
             |               AND 1 PRECEDING), 0)) AS minpre
             |      FROM p)
             |SELECT day AS burst_end_day,
             |       pre - minpre AS burst_sum_nscaled,
             |       n AS n_days
             |FROM (SELECT *, row_number() OVER (ORDER BY pre - minpre
             |        DESC, day) AS rk FROM q)
             |WHERE rk = 1""".stripMargin)),

    // ── Tversky (directed containments + Dice) over customer-cohort
    //    part baskets, candidates ONLY through the shared-part inverted
    //    index; top-100 by Dice keeps the output ranked and bounded.
    QueryDef("q_tversky",
      (s, d) => {
        val b = Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), (col("o_custkey") % 200).as("cg")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("cg"), col("l_partkey").as("pk")).distinct()
          .localCheckpoint(false) // index + both sizes
        val sizes = b.groupBy(col("cg")).agg(count(lit(1)).as("sz"))
        val p2 = b.select(col("pk"), col("cg").as("cg2"))
        val inter = b.join(p2, "pk").where(col("cg") < col("cg2"))
          .groupBy(col("cg"), col("cg2")).agg(count(lit(1)).as("inter"))
          .where(col("inter") >= 5)
        inter
          .join(sizes, "cg")
          .join(sizes.select(col("cg").as("cg2"), col("sz").as("sz2")),
            "cg2")
          .selectExpr("cg AS basket_a", "cg2 AS basket_b", "inter",
            "sz AS n_a", "sz2 AS n_b",
            "inter * 1000000 div sz AS containment_ab_e6",
            "inter * 1000000 div sz2 AS containment_ba_e6",
            "2 * inter * 1000000 div (sz + sz2) AS dice_e6")
          .withColumn("rk", row_number().over(
            Window.orderBy(col("dice_e6").desc, col("basket_a"),
              col("basket_b"))))
          .where(col("rk") <= 100)
      },
      Some("""WITH b AS (
             |  SELECT DISTINCT o_custkey % 200 AS cg, l_partkey AS pk
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |sizes AS (SELECT cg, CAST(count(*) AS BIGINT) AS sz
             |          FROM b GROUP BY 1),
             |inter AS (SELECT a.cg, b2.cg AS cg2,
             |                 CAST(count(*) AS BIGINT) AS inter
             |          FROM b a JOIN b b2
             |            ON a.pk = b2.pk AND a.cg < b2.cg
             |          GROUP BY 1, 2 HAVING count(*) >= 5),
             |sc AS (SELECT i.cg AS basket_a, i.cg2 AS basket_b, inter,
             |              sa.sz AS n_a, sb.sz AS n_b,
             |              inter * 1000000 // sa.sz AS containment_ab_e6,
             |              inter * 1000000 // sb.sz AS containment_ba_e6,
             |              2 * inter * 1000000 // (sa.sz + sb.sz) AS dice_e6
             |       FROM inter i JOIN sizes sa ON i.cg = sa.cg
             |            JOIN sizes sb ON i.cg2 = sb.cg)
             |SELECT * FROM (
             |  SELECT *, CAST(row_number() OVER (ORDER BY dice_e6 DESC,
             |    basket_a, basket_b) AS BIGINT) AS rk FROM sc)
             |WHERE rk <= 100""".stripMargin))
  )
}
