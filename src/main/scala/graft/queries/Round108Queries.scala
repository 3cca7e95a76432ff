package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-108 batch: Cramér's V (the normalized strength companion to
  * q_chi_square's existence test), the EOQ/reorder-point inventory
  * policy (the operations-research staple the newsvendor query left
  * open), and Page's L trend test for ordered alternatives (the
  * directional sharpening of q_friedman_test).
  */
object Round108Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Cramér's V between nation and market segment: per-cell
    //    χ² terms in the all-integer form (O·N − r·c)²·1e6 / (N·r·c)
    //    (non-negative → truncation engine-identical), summed over the
    //    25×5 contingency grid, then V = √(χ²/(N·min(r−1,c−1))).
    //    One customer rollup; margins join on the 125-cell axis.
    QueryDef("q_cramers_v",
      (s, d) => {
        val cells = Tables.customer(s, d)
          .groupBy(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"))
          .agg(count(lit(1)).as("o"))
          .localCheckpoint(false) // margins + the cell walk
        val rows = cells.groupBy(col("nk")).agg(sum(col("o")).as("r"))
        val cols = cells.groupBy(col("seg")).agg(sum(col("o")).as("c"))
        val tot = cells.agg(sum(col("o")).as("n"),
          (countDistinct(col("nk")) - 1).as("rm1"),
          (countDistinct(col("seg")) - 1).as("cm1"))
        cells
          .join(broadcast(rows), "nk")
          .join(broadcast(cols), "seg")
          .crossJoin(broadcast(tot))
          .withColumn("term_e6", expr(
            "(o * n - r * c) * (o * n - r * c) * 1000000 div (n * r * c)"))
          .agg(max(col("n")).as("n"), max(expr("least(rm1, cm1)")).as("k"),
            sum(col("term_e6")).as("chi2_e6"))
          .selectExpr("CAST(n AS BIGINT) AS n",
            "CAST(chi2_e6 AS BIGINT) AS chi2_e6",
            """round(sqrt(CAST(chi2_e6 AS DOUBLE)
              |  / CAST('1000000.0' AS DOUBLE)
              |  / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE))), 6)
              |  AS cramers_v""".stripMargin)
      },
      Some("""WITH cells AS (SELECT c_nationkey AS nk, c_mktsegment AS seg,
             |                      CAST(count(*) AS BIGINT) AS o
             |               FROM customer GROUP BY 1, 2),
             |r AS (SELECT nk, CAST(sum(o) AS BIGINT) AS r
             |      FROM cells GROUP BY 1),
             |c AS (SELECT seg, CAST(sum(o) AS BIGINT) AS c
             |      FROM cells GROUP BY 1),
             |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
             |               CAST(count(DISTINCT nk) - 1 AS BIGINT) AS rm1,
             |               CAST(count(DISTINCT seg) - 1 AS BIGINT) AS cm1
             |        FROM cells),
             |t AS (SELECT (o * n - r.r * c.c) * (o * n - r.r * c.c)
             |               * 1000000 // (n * r.r * c.c) AS term_e6,
             |             n, least(rm1, cm1) AS k
             |      FROM cells JOIN r USING (nk) JOIN c USING (seg)
             |      CROSS JOIN tot),
             |m AS (SELECT max(n) AS n, max(k) AS k,
             |             CAST(sum(term_e6) AS BIGINT) AS chi2_e6 FROM t)
             |SELECT CAST(n AS BIGINT) AS n, chi2_e6,
             |       round(sqrt(CAST(chi2_e6 AS DOUBLE)
             |         / CAST('1000000.0' AS DOUBLE)
             |         / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE))), 6)
             |         AS cramers_v
             |FROM m""".stripMargin)),

    // ── Economic order quantity per part brand: with annual demand D
    //    (summed line quantities), fixed order cost K = 100 and unit
    //    holding cost h = 4, EOQ = √(2DK/h) = √(50·D) — one
    //    correctly-rounded IEEE sqrt of an exact long, floored to whole
    //    units in both engines. Reorder point assumes a 7-day lead on
    //    the 365-day year. One lineitem⋈part rollup, 25-brand axis.
    QueryDef("q_eoq",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("long")).as("demand"))
        .selectExpr("p_brand", "CAST(demand AS BIGINT) AS demand",
          """CAST(floor(sqrt(CAST(50 * demand AS DOUBLE))) AS BIGINT)
            |  AS eoq""".stripMargin,
          """demand div greatest(CAST(floor(sqrt(CAST(50 * demand
            |  AS DOUBLE))) AS BIGINT), 1) AS n_orders""".stripMargin,
          "demand * 7 div 365 AS reorder_point"),
      Some("""WITH b AS (SELECT p_brand,
             |                  CAST(sum(CAST(l_quantity AS BIGINT))
             |                    AS BIGINT) AS demand
             |           FROM lineitem
             |           JOIN part ON l_partkey = p_partkey
             |           GROUP BY 1)
             |SELECT p_brand, demand,
             |       CAST(floor(sqrt(CAST(50 * demand AS DOUBLE)))
             |         AS BIGINT) AS eoq,
             |       demand // greatest(CAST(floor(sqrt(CAST(50 * demand
             |         AS DOUBLE))) AS BIGINT), 1) AS n_orders,
             |       demand * 7 // 365 AS reorder_point
             |FROM b""".stripMargin)),

    // ── Page's L test for the ordered alternative view ≤ click ≤
    //    purchase in per-user engagement: within-user ranks of the
    //    three counts (ties broken deterministically by the condition
    //    order — documented variant, identical in both engines), then
    //    L = Σᵢ Σⱼ j·rᵢⱼ. Under H0, E[L] = 12n and Var[L] = 2n for
    //    k = 3, so z = (L − 12n)/√(2n). All integer until the z close.
    QueryDef("q_page_trend",
      (s, d) => Tables.events(s, d)
        .filter(col("event_type").isin("view", "click", "purchase"))
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("v"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("c"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("p"))
        // beats(i, j): x_i < x_j, or equal and i earlier in (v, c, p).
        .withColumn("rv", expr(
          """1 + CASE WHEN c < v THEN 1 ELSE 0 END
            |  + CASE WHEN p < v THEN 1 ELSE 0 END""".stripMargin))
        .withColumn("rc", expr(
          """1 + CASE WHEN v <= c THEN 1 ELSE 0 END
            |  + CASE WHEN p < c THEN 1 ELSE 0 END""".stripMargin))
        .withColumn("rp", expr(
          """1 + CASE WHEN v <= p THEN 1 ELSE 0 END
            |  + CASE WHEN c <= p THEN 1 ELSE 0 END""".stripMargin))
        .agg(count(lit(1)).as("n"),
          sum(expr("rv + 2 * rc + 3 * rp")).as("l_stat"))
        .selectExpr("CAST(n AS BIGINT) AS n_users",
          "CAST(l_stat AS BIGINT) AS l_stat",
          "CAST(12 * n AS BIGINT) AS e_l",
          """round(CAST(l_stat - 12 * n AS DOUBLE)
            |  / sqrt(CAST(2 * n AS DOUBLE)), 6) AS z""".stripMargin),
      Some("""WITH u AS (SELECT user_id,
             |             CAST(sum(CASE WHEN event_type = 'view'
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS v,
             |             CAST(sum(CASE WHEN event_type = 'click'
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |             CAST(sum(CASE WHEN event_type = 'purchase'
             |                 THEN 1 ELSE 0 END) AS BIGINT) AS p
             |           FROM events
             |           WHERE event_type IN ('view', 'click', 'purchase')
             |           GROUP BY 1),
             |rk AS (SELECT
             |         1 + CASE WHEN c < v THEN 1 ELSE 0 END
             |           + CASE WHEN p < v THEN 1 ELSE 0 END AS rv,
             |         1 + CASE WHEN v <= c THEN 1 ELSE 0 END
             |           + CASE WHEN p < c THEN 1 ELSE 0 END AS rc,
             |         1 + CASE WHEN v <= p THEN 1 ELSE 0 END
             |           + CASE WHEN c <= p THEN 1 ELSE 0 END AS rp
             |       FROM u),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(rv + 2 * rc + 3 * rp) AS BIGINT)
             |               AS l_stat
             |      FROM rk)
             |SELECT n AS n_users, l_stat,
             |       CAST(12 * n AS BIGINT) AS e_l,
             |       round(CAST(l_stat - 12 * n AS DOUBLE)
             |         / sqrt(CAST(2 * n AS DOUBLE)), 6) AS z
             |FROM m""".stripMargin))
  )
}
