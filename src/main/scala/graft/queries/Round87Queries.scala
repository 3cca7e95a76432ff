package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-87 batch: an order-statistic confidence interval for the
  * median (distribution-free binomial ranks — the uncertainty
  * q_grouped_median reports as a point), the ABC–XYZ inventory matrix
  * (value concentration × demand variability — the planning grid
  * built from q_abc_pareto and q_dispersion_index's ingredients), and
  * Fleiss' kappa (multi-rater agreement across three deterministic
  * labeling rules — the k-rater generalization of q_cohens_kappa).
  */
object Round87Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Median CI per segment: ranks n/2 ∓ z√n/2 (z = 1.96 literal,
    //    floor/ceil to integers identically in both engines).
    QueryDef("q_median_ci",
      (s, d) => {
        val u = Tables.customer(s, d)
          .select(col("c_mktsegment").as("seg"), col("c_custkey").as("ck"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("v"))
        val ranked = u
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("seg")).orderBy(col("v"), col("ck"))))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("seg"))))
          .withColumn("lo_rn", expr(
            "greatest(CAST(floor((CAST(n AS DOUBLE) - CAST('1.96' AS " +
              "DOUBLE) * sqrt(CAST(n AS DOUBLE))) / CAST('2.0' AS DOUBLE))" +
              " AS BIGINT), 1)"))
          .withColumn("hi_rn", expr(
            "least(CAST(floor((CAST(n AS DOUBLE) + CAST('1.96' AS DOUBLE)" +
              " * sqrt(CAST(n AS DOUBLE))) / CAST('2.0' AS DOUBLE))" +
              " AS BIGINT) + 1, n)"))
          .localCheckpoint(false) // three positional picks
        def pick(cond: String, nm: String) = ranked
          .where(expr(cond)).select(col("seg"), col("n"), col("v").as(nm))
        pick("rn = (n + 1) div 2", "median_cents")
          .join(pick("rn = lo_rn", "ci_lo_cents"), Seq("seg", "n"))
          .join(pick("rn = hi_rn", "ci_hi_cents"), Seq("seg", "n"))
      },
      Some {
        def pick(cond: String, nm: String) =
          s"""SELECT seg, n, v AS $nm FROM ranked WHERE $cond"""
        s"""WITH u AS (SELECT c_mktsegment AS seg, c_custkey AS ck,
           |                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
           |                   AS v
           |          FROM customer),
           |ranked AS (
           |  SELECT seg, v,
           |         row_number() OVER (PARTITION BY seg ORDER BY v, ck)
           |           AS rn,
           |         CAST(count(*) OVER (PARTITION BY seg) AS BIGINT) AS n,
           |         greatest(CAST(floor((CAST(count(*) OVER (PARTITION BY
           |             seg) AS DOUBLE) - CAST('1.96' AS DOUBLE)
           |             * sqrt(CAST(count(*) OVER (PARTITION BY seg)
           |               AS DOUBLE))) / CAST('2.0' AS DOUBLE)) AS BIGINT),
           |           1) AS lo_rn,
           |         least(CAST(floor((CAST(count(*) OVER (PARTITION BY
           |             seg) AS DOUBLE) + CAST('1.96' AS DOUBLE)
           |             * sqrt(CAST(count(*) OVER (PARTITION BY seg)
           |               AS DOUBLE))) / CAST('2.0' AS DOUBLE)) AS BIGINT)
           |             + 1,
           |           CAST(count(*) OVER (PARTITION BY seg) AS BIGINT))
           |           AS hi_rn
           |  FROM u),
           |med AS (${pick("rn = (n + 1) // 2", "median_cents")}),
           |lo AS (${pick("rn = lo_rn", "ci_lo_cents")}),
           |hi AS (${pick("rn = hi_rn", "ci_hi_cents")})
           |SELECT med.seg, med.n, median_cents, ci_lo_cents, ci_hi_cents
           |FROM med JOIN lo ON med.seg = lo.seg
           |     JOIN hi ON med.seg = hi.seg""".stripMargin
      }),

    // ── ABC–XYZ: brands classified by cumulative revenue share
    //    (A<70%≤B<90%≤C) × daily-demand VMR (X<1≤Y<5≤Z), exact e6.
    QueryDef("q_abc_xyz",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("g"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
              " div 86400000000").as("day"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"),
            floor(col("l_quantity") + 0.5).cast("long").as("q"))
          .localCheckpoint(false) // revenue rollup + daily variability
        val rev = li.groupBy(col("g")).agg(sum(col("v")).as("rev"))
          .withColumn("cum", sum(col("rev")).over(
            Window.orderBy(col("rev").desc, col("g"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tot", sum(col("rev")).over(Window.partitionBy()))
          .withColumn("abc", expr(
            """CASE WHEN (cum - rev) * 10 < tot * 7 THEN 'A'
              |     WHEN (cum - rev) * 10 < tot * 9 THEN 'B'
              |     ELSE 'C' END""".stripMargin))
        val xyz = li.groupBy(col("g"), col("day"))
          .agg(sum(col("q")).as("x"))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("nd"), sum(col("x")).as("s"),
            sum(col("x") * col("x")).as("qq"))
          .withColumn("vmr_e6", expr(
            "(nd * qq - s * s) * 1000000 div (nd * s)"))
          .withColumn("xyz", expr(
            """CASE WHEN vmr_e6 < 1000000 THEN 'X'
              |     WHEN vmr_e6 < 5000000 THEN 'Y'
              |     ELSE 'Z' END""".stripMargin))
        rev.join(xyz, "g")
          .groupBy(col("abc"), col("xyz"))
          .agg(count(lit(1)).as("n_brands"), sum(col("rev")).as("rev_cents"))
      },
      Some("""WITH li AS (
             |  SELECT p_brand AS g,
             |         epoch_us(l_shipdate) // 86400000000 AS day,
             |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |           AS v,
             |         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |rev AS (SELECT g, CAST(sum(v) AS BIGINT) AS rev
             |        FROM li GROUP BY 1),
             |r2 AS (SELECT g, rev,
             |              CAST(sum(rev) OVER (ORDER BY rev DESC, g
             |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             |              CAST(sum(rev) OVER () AS BIGINT) AS tot
             |       FROM rev),
             |r3 AS (SELECT g, rev,
             |              CASE WHEN (cum - rev) * 10 < tot * 7 THEN 'A'
             |                   WHEN (cum - rev) * 10 < tot * 9 THEN 'B'
             |                   ELSE 'C' END AS abc
             |       FROM r2),
             |dd AS (SELECT g, day, CAST(sum(q) AS BIGINT) AS x
             |       FROM li GROUP BY 1, 2),
             |mo AS (SELECT g, CAST(count(*) AS BIGINT) AS nd,
             |              CAST(sum(x) AS BIGINT) AS s,
             |              CAST(sum(x * x) AS BIGINT) AS qq
             |       FROM dd GROUP BY 1),
             |x3 AS (SELECT g,
             |              CASE WHEN (nd * qq - s * s) * 1000000
             |                        // (nd * s) < 1000000 THEN 'X'
             |                   WHEN (nd * qq - s * s) * 1000000
             |                        // (nd * s) < 5000000 THEN 'Y'
             |                   ELSE 'Z' END AS xyz
             |       FROM mo)
             |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_brands,
             |       CAST(sum(rev) AS BIGINT) AS rev_cents
             |FROM r3 JOIN x3 ON r3.g = x3.g
             |GROUP BY 1, 2""".stripMargin)),

    // ── Fleiss' kappa: three deterministic raters tag each document
    //    long/short by different rules; exact n²-scaled agreement.
    QueryDef("q_fleiss_kappa",
      (s, d) => {
        val dec = "decimal(38,0)"
        val r = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            (col("n_chars") >= 500).as("r1"),
            (expr("length(text)") >= 480).as("r2"),
            (Dedup.hash48(col("doc_id").cast("string"), lit("rate"))
              % 1000000L < 500000L || col("n_chars") >= 600).as("r3"))
          .withColumn("kj", expr(
            "CAST(r1 AS INT) + CAST(r2 AS INT) + CAST(r3 AS INT)"))
        // P_i = (Σ_j n_ij² − k)/(k(k−1)); with k=3: n_long=kj, n_short=3−kj
        r.agg(count(lit(1)).cast(dec).as("n"),
            sum(expr("kj * kj + (3 - kj) * (3 - kj) - 3")).cast(dec)
              .as("agree_num"),
            sum(col("kj")).cast(dec).as("tot_long"))
          .selectExpr("CAST(n AS BIGINT) AS n_docs",
            // P̄ = agree_num/(n·6);  P̄e = p_long² + p_short²
            """round(CAST(agree_num AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('6.0' AS DOUBLE)), 6)
              |AS p_bar""".stripMargin,
            """round((CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |* (CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |+ (CAST('1.0' AS DOUBLE) - CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |* (CAST('1.0' AS DOUBLE) - CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE))), 6)
              |AS p_e""".stripMargin,
            """round((CAST(agree_num AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('6.0' AS DOUBLE))
              |- ((CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |* (CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |+ (CAST('1.0' AS DOUBLE) - CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |* (CAST('1.0' AS DOUBLE) - CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))))
              |/ (CAST('1.0' AS DOUBLE)
              |- ((CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |* (CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |+ (CAST('1.0' AS DOUBLE) - CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))
              |* (CAST('1.0' AS DOUBLE) - CAST(tot_long AS DOUBLE)
              |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE))))), 6)
              |AS kappa""".stripMargin)
      },
      Some {
        val h = PortableSql.hash48("CAST(doc_id AS VARCHAR)", "'rate'")
        val pl = """(CAST(tot_long AS DOUBLE)
                   |/ (CAST(n AS DOUBLE) * CAST('3.0' AS DOUBLE)))"""
          .stripMargin
        val pe = s"""($pl * $pl
                    |+ (CAST('1.0' AS DOUBLE) - $pl)
                    |* (CAST('1.0' AS DOUBLE) - $pl))""".stripMargin
        val pbar = """(CAST(agree_num AS DOUBLE)
                     |/ (CAST(n AS DOUBLE) * CAST('6.0' AS DOUBLE)))"""
          .stripMargin
        s"""WITH r AS (
           |  SELECT doc_id,
           |         (CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END)
           |         + (CASE WHEN length(text) >= 480 THEN 1 ELSE 0 END)
           |         + (CASE WHEN $h % 1000000 < 500000
           |                   OR n_chars >= 600 THEN 1 ELSE 0 END) AS kj
           |  FROM documents),
           |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |             CAST(sum(kj * kj + (3 - kj) * (3 - kj) - 3)
           |               AS HUGEINT) AS agree_num,
           |             CAST(sum(kj) AS HUGEINT) AS tot_long
           |      FROM r)
           |SELECT CAST(n AS BIGINT) AS n_docs,
           |       round($pbar, 6) AS p_bar,
           |       round($pe, 6) AS p_e,
           |       round(($pbar - $pe)
           |         / (CAST('1.0' AS DOUBLE) - $pe), 6) AS kappa
           |FROM m""".stripMargin
      })
  )
}
