package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-160 batch — three optimization-loop primitives the registry
  * lacked, each an UNROLLED bounded iteration of aggregates (the
  * q_boost_stump induction pattern — no collect, no driver loop):
  *
  *  - Logistic-regression GD (`q_logit_step`): two batch gradient steps
  *    on a base-2 logit model — σ₂(z) = 1/(1+2^(−z)) via the repo's
  *    e6 pow2 machinery, so probabilities are INTEGERS both engines
  *    agree on exactly. Complements q_perceptron (hinge) with the
  *    smooth-loss workhorse.
  *  - Huber M-estimator (`q_huber_mean`): two IRLS rounds for the
  *    robust location of order totalprice — weights min(1, k/|x−m|) in
  *    e6, the estimator q_winsorized_mean approximates without
  *    iteration. Dollar units keep Σw·x inside BIGINT at any skew.
  *  - RANSAC line (`q_ransac_line`): 8 deterministic hash-seeded point
  *    pairs propose (slope, intercept) for totalprice ~ n_lines; one
  *    broadcast of the candidate frame scores ALL proposals in a
  *    single scan (inlier counts), argmax picks the consensus model.
  *    The "random" sample is the md5-rank top-16 — replayable, no RNG.
  */
object Round160Queries {

  /** p_e6 = σ₂(z_e6)·1e6 for a column named `z` (e6 base-2 logits),
    * branching on sign so [[Sketches.pow2NegE6Expr]]'s non-negative
    * domain always holds. */
  private def sigmoidE6(df: DataFrame): DataFrame =
    df.withColumn("zp", greatest(col("z"), lit(0L)))
      .withColumn("zn", greatest(-col("z"), lit(0L)))
      .withColumn("pwp", Sketches.pow2NegE6Expr("zp"))
      .withColumn("pwn", Sketches.pow2NegE6Expr("zn"))
      // integer `div` only — Column./ would be DOUBLE division, whose
      // nearest-rounding can differ from DuckDB's exact // by one ulp
      .withColumn("p_e6", expr(
        """CASE WHEN z >= 0
          |  THEN 1000000000000L div (1000000L + pwp)
          |  ELSE 1000000L - (1000000000000L div (1000000L + pwn))
          |END""".stripMargin))
      .drop("zp", "zn", "pwp", "pwn")

  /** SQL twin of [[sigmoidE6]] for a z expression. */
  private def sigmoidE6Sql(z: String): String = {
    val pp = Sketches.pow2NegE6Sql(s"greatest(($z), 0)")
    val pn = Sketches.pow2NegE6Sql(s"greatest(-($z), 0)")
    s"""(CASE WHEN ($z) >= 0
       |  THEN 1000000000000 // (1000000 + $pp)
       |  ELSE 1000000 - (1000000000000 // (1000000 + $pn)) END)""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Two logistic GD steps: y = purchase, x1 = hour≤11, x2 = dow≤3,
    //    w ← w + Σ(y·1e6 − p_e6)·x div n from w₀ = 0 (so step 1's
    //    gradient is analytic: p = ½ everywhere). Output per step:
    //    weights + mean predicted probability.
    QueryDef("q_logit_step",
      (s, d) => {
        val base = Tables.events(s, d).selectExpr(
            "CASE WHEN event_type = 'purchase' THEN 1L ELSE 0L END AS y",
            "CASE WHEN (unix_micros(ts) div 3600000000) % 24 <= 11 " +
              "THEN 1L ELSE 0L END AS x1",
            "CASE WHEN (unix_micros(ts) div 86400000000) % 7 <= 3 " +
              "THEN 1L ELSE 0L END AS x2")
          .localCheckpoint(false) // both steps ride one scan
        def step(w: DataFrame, k: Int): DataFrame =
          sigmoidE6(base.crossJoin(broadcast(w))
            .withColumn("z", expr("w0 + w1 * x1 + w2 * x2")))
            .groupBy(col("w0"), col("w1"), col("w2"))
            .agg(count(lit(1)).as("n"),
              sum(expr("y * 1000000 - p_e6")).as("g0"),
              sum(expr("(y * 1000000 - p_e6) * x1")).as("g1"),
              sum(expr("(y * 1000000 - p_e6) * x2")).as("g2"),
              sum(col("p_e6")).as("sp"))
            .selectExpr(s"CAST($k AS BIGINT) AS step",
              "w0 + g0 div n AS w0", "w1 + g1 div n AS w1",
              "w2 + g2 div n AS w2", "sp div n AS mean_p_e6")
            .localCheckpoint(false) // one-row model
        val w0 = s.range(1).selectExpr("0L AS w0", "0L AS w1", "0L AS w2")
        val s1 = step(w0, 1)
        val s2 = step(s1.selectExpr("w0", "w1", "w2"), 2)
        s1.unionByName(s2)
      },
      Some {
        def stepSql(wSrc: String, k: Int): String = {
          val p = sigmoidE6Sql("w0 + w1 * x1 + w2 * x2")
          s"""SELECT CAST($k AS BIGINT) AS step,
             |       w0 + CAST(sum(y * 1000000 - p_e6) AS BIGINT)
             |         // count(*) AS w0,
             |       w1 + CAST(sum((y * 1000000 - p_e6) * x1) AS BIGINT)
             |         // count(*) AS w1,
             |       w2 + CAST(sum((y * 1000000 - p_e6) * x2) AS BIGINT)
             |         // count(*) AS w2,
             |       CAST(sum(p_e6) AS BIGINT) // count(*) AS mean_p_e6
             |FROM (SELECT b.*, w.w0, w.w1, w.w2, $p AS p_e6
             |      FROM base b CROSS JOIN ($wSrc) w)
             |GROUP BY w0, w1, w2""".stripMargin
        }
        s"""WITH base AS (
           |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
           |           AS y,
           |         CASE WHEN (epoch_us(ts) // 3600000000) % 24 <= 11
           |           THEN 1 ELSE 0 END AS x1,
           |         CASE WHEN (epoch_us(ts) // 86400000000) % 7 <= 3
           |           THEN 1 ELSE 0 END AS x2
           |  FROM events),
           |s1 AS (${stepSql("SELECT 0 AS w0, 0 AS w1, 0 AS w2", 1)}),
           |s2 AS (${stepSql("SELECT w0, w1, w2 FROM s1", 2)})
           |SELECT step, w0, w1, w2, mean_p_e6 FROM s1
           |UNION ALL SELECT step, w0, w1, w2, mean_p_e6 FROM s2"""
          .stripMargin
      }),

    // ── Two Huber IRLS rounds on order totalprice DOLLARS: m₀ = mean,
    //    then m ← Σ min(1, k/|x−m|)·x / Σ w with k = 20000 $ — outliers
    //    above k from the center get down-weighted proportionally.
    QueryDef("q_huber_mean",
      (s, d) => {
        val k = 20000L
        val x = Tables.orders(s, d)
          .selectExpr("CAST(floor(o_totalprice) AS BIGINT) AS x")
          .localCheckpoint(false) // all rounds ride one scan
        val m0 = x.agg(expr("sum(x) div count(1)").as("m"),
          count(lit(1)).as("n"))
          .selectExpr("0L AS step", "m", "n", "CAST(NULL AS BIGINT) AS sw_e6")
          .localCheckpoint(false)
        def irls(prev: DataFrame, kk: Int): DataFrame =
          x.crossJoin(broadcast(prev.selectExpr("m AS mp")))
            .withColumn("w_e6",
              least(lit(1000000L),
                expr(s"${k}L * 1000000L div greatest(1L, abs(x - mp))")))
            .agg(count(lit(1)).as("n"), sum(col("w_e6")).as("sw"),
              sum(expr("w_e6 * x")).as("swx"))
            .selectExpr(s"CAST($kk AS BIGINT) AS step",
              "swx div greatest(1L, sw) AS m", "n", "sw AS sw_e6")
            .localCheckpoint(false)
        val m1 = irls(m0, 1)
        val m2 = irls(m1, 2)
        m0.unionByName(m1).unionByName(m2)
      },
      Some {
        def irlsSql(prev: String, kk: Int): String =
          s"""SELECT CAST($kk AS BIGINT) AS step,
             |       CAST(sum(w_e6 * x) AS BIGINT)
             |         // greatest(1, CAST(sum(w_e6) AS BIGINT)) AS m,
             |       CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(w_e6) AS BIGINT) AS sw_e6
             |FROM (SELECT x.x,
             |        least(1000000, CAST(20000000000 AS BIGINT)
             |          // greatest(1, abs(x.x - p.m))) AS w_e6
             |      FROM x CROSS JOIN ($prev) p)""".stripMargin
        s"""WITH x AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS x
           |           FROM orders),
           |m0 AS (SELECT CAST(0 AS BIGINT) AS step,
           |              CAST(sum(x) AS BIGINT) // count(*) AS m,
           |              CAST(count(*) AS BIGINT) AS n,
           |              CAST(NULL AS BIGINT) AS sw_e6
           |       FROM x),
           |m1 AS (${irlsSql("SELECT m FROM m0", 1)}),
           |m2 AS (${irlsSql("SELECT m FROM m1", 2)})
           |SELECT * FROM m0 UNION ALL SELECT * FROM m1
           |UNION ALL SELECT * FROM m2""".stripMargin
      }),

    // ── RANSAC line for totalprice ~ n_lines: md5-rank top-16 orders
    //    pair up into 8 proposals; each proposal's inliers (|resid| ≤
    //    20000 $) counted in ONE broadcast-join scan; consensus =
    //    max inliers (tie → pair id). Degenerate pairs (equal x) drop.
    QueryDef("q_ransac_line",
      (s, d) => {
        val pts = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("x"))
          .join(Tables.orders(s, d).select(
            col("o_orderkey").as("l_orderkey"),
            expr("CAST(floor(o_totalprice) AS BIGINT)").as("y")),
            "l_orderkey")
          .localCheckpoint(false) // sample AND scoring share one build
        // TakeOrdered(16) bounds the sample — the rank window then runs
        // on a Limit-bounded 16-row frame (no global sort of the facts)
        val seeds = pts
          .withColumn("h", graft.ops.Dedup.hash48(
            col("l_orderkey").cast("string"), lit("ransac")))
          .orderBy(col("h"), col("l_orderkey")).limit(16)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("h"), col("l_orderkey"))))
        val cands = seeds.filter(col("rk") <= 8).selectExpr(
            "rk AS cid", "x AS x1", "y AS y1")
          .join(seeds.filter(col("rk") > 8)
            .selectExpr("rk - 8 AS cid", "x AS x2", "y AS y2"), "cid")
          .filter(col("x1") =!= col("x2"))
          .selectExpr("cid",
            "(y2 - y1) * 1000 div (x2 - x1) AS b_e3",
            "y1 * 1000 - ((y2 - y1) * 1000 div (x2 - x1)) * x1 AS a_e3")
        val scored = pts.crossJoin(broadcast(cands))
          .withColumn("inl",
            (abs(col("y") * 1000 - (col("a_e3") + col("b_e3") * col("x")))
              <= 20000L * 1000L).cast("long"))
          .groupBy(col("cid"), col("a_e3"), col("b_e3"))
          .agg(sum(col("inl")).as("n_inliers"), count(lit(1)).as("n_pts"))
        scored.withColumn("win", row_number().over(
            Window.orderBy(col("n_inliers").desc, col("cid"))))
          .filter(col("win") === 1)
          .selectExpr("CAST(cid AS BIGINT) AS cid", "a_e3", "b_e3",
            "n_inliers", "CAST(n_pts AS BIGINT) AS n_pts",
            "n_inliers * 1000000 div n_pts AS inlier_rate_e6")
      },
      Some {
        val h = PortableSql.hash48("CAST(l_orderkey AS VARCHAR)", "'ransac'")
        s"""WITH pts AS (
           |  SELECT li.l_orderkey, CAST(li.x AS BIGINT) AS x,
           |         CAST(floor(o.o_totalprice) AS BIGINT) AS y
           |  FROM (SELECT l_orderkey, count(*) AS x FROM lineitem
           |        GROUP BY 1) li
           |  JOIN orders o ON o.o_orderkey = li.l_orderkey),
           |seeds AS (SELECT *, row_number() OVER (ORDER BY $h, l_orderkey)
           |            AS rk
           |          FROM pts QUALIFY rk <= 16),
           |cands AS (SELECT a.rk AS cid,
           |                 (b.y - a.y) * 1000 // (b.x - a.x) AS b_e3,
           |                 a.y * 1000 - ((b.y - a.y) * 1000 // (b.x - a.x))
           |                   * a.x AS a_e3
           |          FROM seeds a JOIN seeds b ON b.rk = a.rk + 8
           |          WHERE a.rk <= 8 AND a.x <> b.x),
           |scored AS (SELECT c.cid, c.a_e3, c.b_e3,
           |                  CAST(sum(CASE WHEN abs(p.y * 1000 -
           |                    (c.a_e3 + c.b_e3 * p.x)) <= 20000000
           |                    THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers,
           |                  CAST(count(*) AS BIGINT) AS n_pts
           |           FROM pts p CROSS JOIN cands c
           |           GROUP BY 1, 2, 3)
           |SELECT CAST(cid AS BIGINT) AS cid, a_e3, b_e3, n_inliers,
           |       n_pts, n_inliers * 1000000 // n_pts AS inlier_rate_e6
           |FROM scored
           |QUALIFY row_number() OVER (ORDER BY n_inliers DESC, cid) = 1"""
          .stripMargin
      })
  )
}
