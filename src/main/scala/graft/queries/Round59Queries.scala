package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-59 batch: Haar wavelet energy decomposition (which time scale
  * carries the event-volume variance — the dyadic complement of
  * q_acf/q_seasonal_strength), grid-cell trajectory Hausdorff distance
  * (the set-geometry mobility similarity q_path_drift's edit distance
  * cannot see), and rank-biased overlap (top-weighted ranking agreement
  * — the prefix-sensitive complement of q_kendall_tau/q_rank_fusion).
  */
object Round59Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Haar energy: dense 512-hour grid of event counts (missing
    //    hours are 0), detail energy per dyadic level 1..5. The hour
    //    axis is calendar-bounded — scale-invariant window input.
    QueryDef("q_haar_energy",
      (s, d) => {
        val h = Tables.events(s, d)
          .select(expr("unix_micros(ts) div 3600000000").as("h"))
        val h0 = h.agg(min(col("h")).as("h0"))
        val counts = h.crossJoin(broadcast(h0))
          .select((col("h") - col("h0")).as("idx"))
          .where(col("idx") < 512)
          .groupBy(col("idx")).agg(count(lit(1)).as("c"))
        val dense = s.range(512).select(col("id").as("idx"))
          .join(counts, Seq("idx"), "left")
          .select(col("idx"), coalesce(col("c"), lit(0L)).as("c"))
        Seq(1, 2, 3, 4, 5).map { lvl =>
          val half = 1 << (lvl - 1)
          dense
            .withColumn("blk", expr(s"idx div ${2 * half}"))
            .withColumn("side",
              when(expr(s"(idx div $half) % 2") === 0, 1L).otherwise(-1L))
            .groupBy(col("blk"))
            .agg(sum(col("side") * col("c")).as("detail"))
            .agg(count(lit(1)).as("n_blocks"),
              sum(col("detail") * col("detail")).as("energy"))
            .select(lit(lvl.toLong).as("level"), col("n_blocks"),
              col("energy"))
        }.reduce(_ unionByName _)
      },
      Some {
        def lvl(l: Int) = {
          val half = 1 << (l - 1)
          s"""SELECT CAST($l AS BIGINT) AS level,
             |       CAST(count(*) AS BIGINT) AS n_blocks,
             |       CAST(sum(detail * detail) AS BIGINT) AS energy
             |FROM (SELECT idx // ${2 * half} AS blk,
             |             CAST(sum(CASE WHEN (idx // $half) % 2 = 0
             |                           THEN c ELSE -c END) AS BIGINT) AS detail
             |      FROM dense GROUP BY 1)""".stripMargin
        }
        s"""WITH h AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
           |h0 AS (SELECT min(h) AS h0 FROM h),
           |counts AS (SELECT h - h0 AS idx, CAST(count(*) AS BIGINT) AS c
           |           FROM h CROSS JOIN h0 WHERE h - h0 < 512 GROUP BY 1),
           |dense AS (SELECT r.range AS idx, coalesce(c.c, 0) AS c
           |          FROM range(512) r LEFT JOIN counts c ON c.idx = r.range)
           |${(1 to 5).map(lvl).mkString("\nUNION ALL\n")}""".stripMargin
      }),

    // ── Hausdorff between sampled users' visited-cell sets, blocked by
    //    the (per-user constant) latitude band. Cells are pure-integer
    //    0.5° buckets of the positions derivation (Tables.positions).
    QueryDef("q_hausdorff_traj",
      (s, d) => {
        val cells = Tables.events(s, d)
          .where(col("user_id") % 20 < 2)
          .select(col("user_id").as("u"),
            expr("(user_id * 37 % 17000) div 50").as("cx"),
            expr("(event_id * 91 % 35000) div 50").as("cy"))
          .distinct()
          .localCheckpoint(false) // both pair sides read it
        val b = cells.select(col("u").as("ub"), col("cx").as("bx"),
          col("cy").as("by"))
        val dmin = cells.join(b, col("cx") === col("bx") &&
            col("u") < col("ub"))
          .select(col("u"), col("ub"), col("cy"), col("by"))
          .groupBy(col("u"), col("ub"), col("cy"))
          .agg(min((col("cy") - col("by")) * (col("cy") - col("by")))
            .as("dmin_ab"))
        val dminRev = cells.join(b, col("cx") === col("bx") &&
            col("u") < col("ub"))
          .select(col("u"), col("ub"), col("cy"), col("by"))
          .groupBy(col("u"), col("ub"), col("by"))
          .agg(min((col("cy") - col("by")) * (col("cy") - col("by")))
            .as("dmin_ba"))
        val hab = dmin.groupBy(col("u"), col("ub"))
          .agg(max(col("dmin_ab")).as("h_ab"))
        val hba = dminRev.groupBy(col("u"), col("ub"))
          .agg(max(col("dmin_ba")).as("h_ba"))
        hab.join(hba, Seq("u", "ub"))
          .selectExpr("u AS user_a", "ub AS user_b", "h_ab", "h_ba",
            "greatest(h_ab, h_ba) AS hausdorff_d2")
      },
      Some("""WITH cells AS (
             |  SELECT DISTINCT user_id AS u,
             |         (user_id * 37 % 17000) // 50 AS cx,
             |         (event_id * 91 % 35000) // 50 AS cy
             |  FROM events WHERE user_id % 20 < 2),
             |p AS (SELECT a.u, b.u AS ub, a.cy, b.cy AS by2
             |      FROM cells a JOIN cells b
             |        ON a.cx = b.cx AND a.u < b.u),
             |hab AS (SELECT u, ub, CAST(max(dmin) AS BIGINT) AS h_ab
             |        FROM (SELECT u, ub, cy,
             |                     min((cy - by2) * (cy - by2)) AS dmin
             |              FROM p GROUP BY 1, 2, 3)
             |        GROUP BY 1, 2),
             |hba AS (SELECT u, ub, CAST(max(dmin) AS BIGINT) AS h_ba
             |        FROM (SELECT u, ub, by2,
             |                     min((cy - by2) * (cy - by2)) AS dmin
             |              FROM p GROUP BY 1, 2, 3)
             |        GROUP BY 1, 2)
             |SELECT hab.u AS user_a, hab.ub AS user_b, h_ab, h_ba,
             |       greatest(h_ab, h_ba) AS hausdorff_d2
             |FROM hab JOIN hba ON hab.u = hba.u AND hab.ub = hba.ub"""
        .stripMargin)),

    // ── Rank-biased overlap (p = 1/2, exact dyadic weights) between the
    //    revenue and quantity rankings of the top-20 parts.
    QueryDef("q_rbo",
      (s, d) => {
        val per = Tables.lineitem(s, d).groupBy(col("l_partkey"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev"),
            sum(floor(col("l_quantity") + 0.5).cast("long")).as("qty"))
        val ranked = per
          .withColumn("ra", row_number().over(
            Window.orderBy(col("rev").desc, col("l_partkey"))).cast("long"))
          .withColumn("rb", row_number().over(
            Window.orderBy(col("qty").desc, col("l_partkey"))).cast("long"))
          .where(col("ra") <= 20 || col("rb") <= 20)
          .localCheckpoint(false) // reused by all 20 depths
        val depths = s.range(1, 21).select(col("id").as("dpt"))
        ranked.crossJoin(broadcast(depths))
          .where(col("ra") <= col("dpt") && col("rb") <= col("dpt"))
          .groupBy(col("dpt")).agg(count(lit(1)).as("overlap"))
          .selectExpr("dpt AS depth", "overlap",
            // term_d = 2^-d · overlap/d in e6 (truncating, both engines)
            "overlap * 1000000 div (dpt * CAST(pow(2, dpt) AS BIGINT)) " +
              "AS term_e6")
          .withColumn("rbo_e6", sum(col("term_e6")).over(
            Window.orderBy(col("depth"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      },
      Some("""WITH per AS (
             |  SELECT l_partkey,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS rev,
             |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
             |           AS BIGINT) AS qty
             |  FROM lineitem GROUP BY 1),
             |ranked AS (
             |  SELECT l_partkey,
             |         CAST(row_number() OVER (ORDER BY rev DESC, l_partkey)
             |           AS BIGINT) AS ra,
             |         CAST(row_number() OVER (ORDER BY qty DESC, l_partkey)
             |           AS BIGINT) AS rb
             |  FROM per),
             |d AS (SELECT CAST(range AS BIGINT) AS dpt FROM range(1, 21)),
             |ov AS (SELECT dpt, CAST(count(*) AS BIGINT) AS overlap
             |       FROM ranked CROSS JOIN d
             |       WHERE ra <= dpt AND rb <= dpt GROUP BY 1),
             |terms AS (SELECT dpt AS depth, overlap,
             |                 overlap * 1000000 //
             |                   (dpt * CAST(pow(2, dpt) AS BIGINT)) AS term_e6
             |          FROM ov)
             |SELECT depth, overlap, term_e6,
             |       CAST(sum(term_e6) OVER (ORDER BY depth
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rbo_e6
             |FROM terms""".stripMargin))
  )
}
