package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-89 batch: the BCG growth–share matrix (year-over-year brand
  * growth × relative market share → star/cow/question/dog — the
  * portfolio read over q_rate_volume_decomp's bridge), Kendall's W
  * (concordance of the revenue/quantity/order-count brand rankings —
  * the m-rater rank agreement beside q_fleiss_kappa's categories), and
  * the standardized conversion ratio (indirect standardization:
  * observed vs segment-mix-expected conversions per nation — the
  * case-mix adjustment q_raking does by reweighting).
  */
object Round89Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Growth–share: growth = 1997 vs 1996 revenue, share vs the
    //    largest OTHER brand (1997); quadrants at growth 0 / share 1.
    QueryDef("q_growth_share",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("g"), expr("year(l_shipdate)").as("yr"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
          .where(col("yr").isin(1996, 1997))
          .groupBy(col("g"), col("yr")).agg(sum(col("v")).as("rev"))
        val a = rev.where(col("yr") === 1996)
          .select(col("g"), col("rev").as("rev_a"))
        val b = rev.where(col("yr") === 1997)
          .select(col("g"), col("rev").as("rev_b"))
        val j0 = a.join(b, "g").localCheckpoint(false) // brand axis, tiny
        val mx = j0.select(col("g").as("g2"), col("rev_b").as("rb2"))
        val j = j0.join(mx, col("g") =!= col("g2"))
          .groupBy(col("g"), col("rev_a"), col("rev_b"))
          .agg(max(col("rb2")).as("mx_other"))
        // Sign-factored: Spark `div` truncates, DuckDB `//` floors — they
        // agree only on non-negative numerators (SURVEY §convention).
        j.selectExpr("g", "rev_a", "rev_b",
            """CASE WHEN rev_b >= rev_a
              |       THEN (rev_b - rev_a) * 1000000 div rev_a
              |     ELSE -((rev_a - rev_b) * 1000000 div rev_a)
              |END AS growth_e6""".stripMargin,
            "rev_b * 1000000 div mx_other AS rel_share_e6")
          .selectExpr("g", "rev_a", "rev_b", "growth_e6", "rel_share_e6",
            """CASE WHEN growth_e6 > 0 AND rel_share_e6 >= 1000000
              |       THEN 'star'
              |     WHEN growth_e6 > 0 THEN 'question'
              |     WHEN rel_share_e6 >= 1000000 THEN 'cow'
              |     ELSE 'dog' END AS quadrant""".stripMargin)
      },
      Some("""WITH rev AS (
             |  SELECT p_brand AS g, year(l_shipdate) AS yr,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS rev
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE year(l_shipdate) IN (1996, 1997) GROUP BY 1, 2),
             |j AS (SELECT a.g, a.rev AS rev_a, b.rev AS rev_b
             |      FROM (SELECT * FROM rev WHERE yr = 1996) a
             |      JOIN (SELECT * FROM rev WHERE yr = 1997) b
             |        ON a.g = b.g),
             |mx AS (SELECT j1.g, CAST(max(j2.rev_b) AS BIGINT) AS mx_other
             |       FROM j j1 JOIN j j2 ON j1.g <> j2.g GROUP BY 1),
             |sc AS (SELECT j.g, rev_a, rev_b,
             |              CASE WHEN rev_b >= rev_a
             |                     THEN (rev_b - rev_a) * 1000000 // rev_a
             |                   ELSE -((rev_a - rev_b) * 1000000 // rev_a)
             |              END AS growth_e6,
             |              rev_b * 1000000 // mx_other AS rel_share_e6
             |       FROM j JOIN mx ON j.g = mx.g)
             |SELECT g, rev_a, rev_b, growth_e6, rel_share_e6,
             |       CASE WHEN growth_e6 > 0 AND rel_share_e6 >= 1000000
             |              THEN 'star'
             |            WHEN growth_e6 > 0 THEN 'question'
             |            WHEN rel_share_e6 >= 1000000 THEN 'cow'
             |            ELSE 'dog' END AS quadrant
             |FROM sc""".stripMargin)),

    // ── Kendall's W over three brand rankings (doubled midranks keep
    //    the deviation sum exact): W = 12·S₂/(m²·n(n²−1)·4) in e6.
    QueryDef("q_kendall_w",
      (s, d) => {
        val per = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("g"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("m1"),
            sum(floor(col("l_quantity") + 0.5).cast("long")).as("m2"),
            countDistinct(col("l_orderkey")).as("m3"))
        def r2(c: String) =
          (lit(2L) * rank().over(Window.orderBy(col(c))).cast("long") +
            count(lit(1)).over(Window.partitionBy(col(c))) - 1L).as(s"r$c")
        val ranked = per.select(col("g"), r2("m1"), r2("m2"), r2("m3"))
          .withColumn("rsum2", expr("rm1 + rm2 + rm3"))
        val dec = "decimal(38,0)"
        ranked.agg(count(lit(1)).cast(dec).as("n"),
            sum(col("rsum2").cast(dec)).as("s"),
            sum(col("rsum2").cast(dec) * col("rsum2").cast(dec)).as("q"))
          .selectExpr("CAST(n AS BIGINT) AS n_items",
            "CAST(3 AS BIGINT) AS m_raters",
            // S₂ = Σ(R₂ − mean)² in doubled units → n·q − s² over n;
            // W = 12·(n·q − s²)/(n · 9 · n(n²−1) · 4) e6
            s"""CAST((n * q - s * s) * 12 * 1000000 div
               |(n * 9 * n * (n * n - 1) * 4) AS BIGINT) AS w_e6"""
              .stripMargin)
      },
      Some("""WITH per AS (
             |  SELECT p_brand AS g,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS m1,
             |         CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
             |           AS BIGINT) AS m2,
             |         CAST(count(DISTINCT l_orderkey) AS BIGINT) AS m3
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1),
             |ranked AS (
             |  SELECT g,
             |         2 * CAST(rank() OVER (ORDER BY m1) AS BIGINT)
             |           + CAST(count(*) OVER (PARTITION BY m1) AS BIGINT)
             |           - 1
             |         + 2 * CAST(rank() OVER (ORDER BY m2) AS BIGINT)
             |           + CAST(count(*) OVER (PARTITION BY m2) AS BIGINT)
             |           - 1
             |         + 2 * CAST(rank() OVER (ORDER BY m3) AS BIGINT)
             |           + CAST(count(*) OVER (PARTITION BY m3) AS BIGINT)
             |           - 1 AS rsum2
             |  FROM per),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |             CAST(sum(rsum2) AS HUGEINT) AS s,
             |             sum(CAST(rsum2 AS HUGEINT)
             |                 * CAST(rsum2 AS HUGEINT)) AS q
             |      FROM ranked)
             |SELECT CAST(n AS BIGINT) AS n_items,
             |       CAST(3 AS BIGINT) AS m_raters,
             |       CAST((n * q - s * s) * 12 * 1000000 //
             |         (n * 9 * n * (n * n - 1) * 4) AS BIGINT) AS w_e6
             |FROM m""".stripMargin)),

    // ── SMR: expected conversions per nation from global segment
    //    rates; SMR = observed·1e6/expected (expected in e6 units).
    QueryDef("q_smr",
      (s, d) => {
        val conv = Tables.orders(s, d).select(col("o_custkey")).distinct()
        val u = Tables.customer(s, d)
          .join(conv, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_nationkey").cast("long").as("nk"),
            col("c_mktsegment").as("seg"),
            when(col("o_custkey").isNotNull, 1L).otherwise(0L).as("cv"))
          .localCheckpoint(false) // rates + cells off one frame
        val rates = u.groupBy(col("seg"))
          .agg(expr("sum(cv) * 1000000 div count(1)").as("rate_e6"))
        val cells = u.groupBy(col("nk"), col("seg"))
          .agg(count(lit(1)).as("n_cell"), sum(col("cv")).as("o_cell"))
        cells.join(broadcast(rates), "seg")
          .groupBy(col("nk"))
          .agg(sum(col("n_cell")).as("n"), sum(col("o_cell")).as("observed"),
            sum(expr("n_cell * rate_e6")).as("expected_e6"))
          .selectExpr("nk", "n", "observed", "expected_e6",
            "observed * 1000000000000 div expected_e6 AS smr_e6")
      },
      Some("""WITH conv AS (SELECT DISTINCT o_custkey FROM orders),
             |u AS (SELECT CAST(c_nationkey AS BIGINT) AS nk,
             |             c_mktsegment AS seg,
             |             CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END
             |               AS cv
             |      FROM customer LEFT JOIN conv ON c_custkey = o_custkey),
             |rates AS (SELECT seg,
             |                 CAST(sum(cv) AS BIGINT) * 1000000 // count(*)
             |                   AS rate_e6
             |          FROM u GROUP BY 1),
             |cells AS (SELECT nk, seg, CAST(count(*) AS BIGINT) AS n_cell,
             |                 CAST(sum(cv) AS BIGINT) AS o_cell
             |          FROM u GROUP BY 1, 2)
             |SELECT nk, CAST(sum(n_cell) AS BIGINT) AS n,
             |       CAST(sum(o_cell) AS BIGINT) AS observed,
             |       CAST(sum(n_cell * rate_e6) AS BIGINT) AS expected_e6,
             |       CAST(sum(o_cell) AS BIGINT) * 1000000000000
             |         // CAST(sum(n_cell * rate_e6) AS BIGINT) AS smr_e6
             |FROM cells JOIN rates ON cells.seg = rates.seg
             |GROUP BY 1""".stripMargin))
  )
}
