package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-185 batch — effect sizes and 2×2 / threshold classifier
  * metrics, the experiment-readout family the registry reported
  * significance for (q_t_test, q_mann_whitney) but not MAGNITUDE:
  *
  *  - Cohen's d / Hedges' g / Glass's Δ (`q_cohens_d`): standardized
  *    urgent-vs-other order-value differences. Moments stay exact
  *    BIGINTs in hecto-dollar units (the q_meta_fixed discipline);
  *    only the final d = Δm/s_p closes through IEEE double (-, /, *,
  *    sqrt, floor — the recipe's portable set), textually identical in
  *    both engines.
  *  - Odds / risk ratio (`q_odds_ratio`): the 2×2 epidemiology pair on
  *    urgent exposure × high-value outcome, exact integer e6 ratios.
  *  - φ coefficient + Yule's Q (`q_phi_yule`): the same table's
  *    correlation-flavored association readouts; Q is an exact
  *    sign-split integer ratio, φ closes through one double sqrt chain.
  *  - Youden's J sweep (`q_youden_j`): TPR−FPR across all 11 discount
  *    bands as classification thresholds for returnflag R — the ROC
  *    operating-point picker; cumulative confusion counts ride ONE
  *    window over the 11-row post-aggregate band axis.
  *  - F-beta + balanced accuracy (`q_fbeta`): F1/F0.5/F2 at the fixed
  *    band-5 threshold as exact integer ratios — (1+β²)·tp·10⁶ div
  *    ((1+β²)·tp + β²·fn + fp) with β² ∈ {1/4, 1, 4} cleared to
  *    integers by ×4.
  *
  * Scale shapes: every query is one fact-scan aggregate onto a bounded
  * axis (one 6-moment row, a 2×2, an 11-band table) — no joins beyond
  * broadcast scalars, nothing data-volume-bound past the first
  * exchange.
  */
object Round185Queries {

  /** Exact hecto-dollar order value and the urgent-exposure flag. */
  private def ordersHecto(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d).select(
      expr("CAST(floor(o_totalprice / 100 + 0.5) AS BIGINT)").as("x"),
      (col("o_orderpriority") === "1-URGENT").as("exp"),
      (col("o_totalprice") >= 150000.0).as("hi"))

  private val twoByTwoSql =
    """WITH o AS (SELECT o_orderpriority = '1-URGENT' AS expo,
      |                  o_totalprice >= 150000.0 AS hi
      |           FROM orders),
      |t AS (SELECT CAST(sum(CASE WHEN expo AND hi THEN 1 ELSE 0 END)
      |               AS BIGINT) AS a,
      |             CAST(sum(CASE WHEN expo AND NOT hi THEN 1 ELSE 0 END)
      |               AS BIGINT) AS b,
      |             CAST(sum(CASE WHEN NOT expo AND hi THEN 1 ELSE 0 END)
      |               AS BIGINT) AS c,
      |             CAST(sum(CASE WHEN NOT expo AND NOT hi THEN 1 ELSE 0 END)
      |               AS BIGINT) AS dd
      |      FROM o)""".stripMargin

  private def twoByTwo(s: org.apache.spark.sql.SparkSession, d: String) =
    ordersHecto(s, d).agg(
      sum(when(col("exp") && col("hi"), 1L).otherwise(0L)).as("a"),
      sum(when(col("exp") && !col("hi"), 1L).otherwise(0L)).as("b"),
      sum(when(!col("exp") && col("hi"), 1L).otherwise(0L)).as("c"),
      sum(when(!col("exp") && !col("hi"), 1L).otherwise(0L)).as("dd"))

  /** Band (0..10) and the positive flag for the threshold metrics. */
  private val bandCellsSql =
    """WITH cells AS (
      |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS band,
      |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |           AS BIGINT) AS pos,
      |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
      |           AS BIGINT) AS neg
      |  FROM lineitem GROUP BY 1)""".stripMargin

  private def bandCells(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)").as("band"),
        (col("l_returnflag") === "R").as("r"))
      .groupBy(col("band"))
      .agg(sum(when(col("r"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("r"), 0L).otherwise(1L)).as("neg"))

  def defs: Seq[QueryDef] = Seq(

    // ── Cohen's d, Hedges' g, Glass's Δ: urgent vs other order value.
    QueryDef("q_cohens_d",
      (s, d) => ordersHecto(s, d).agg(
          sum(when(col("exp"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("exp"), col("x")).otherwise(0L)).as("s1"),
          sum(when(col("exp"), col("x") * col("x")).otherwise(0L)).as("ss1"),
          sum(when(!col("exp"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("exp"), col("x")).otherwise(0L)).as("s2"),
          sum(when(!col("exp"), col("x") * col("x")).otherwise(0L)).as("ss2"))
        .selectExpr("n1", "n2",
          """CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
            |  * 1000000 / sqrt(((CAST(ss1 AS DOUBLE)
            |      - CAST(s1 AS DOUBLE) * s1 / n1)
            |    + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
            |    / (n1 + n2 - 2))) AS BIGINT) AS d_e6""".stripMargin,
          """CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
            |  * (CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE)
            |      / (4 * (n1 + n2 - 2) - 1))
            |  * 1000000 / sqrt(((CAST(ss1 AS DOUBLE)
            |      - CAST(s1 AS DOUBLE) * s1 / n1)
            |    + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
            |    / (n1 + n2 - 2))) AS BIGINT) AS g_e6""".stripMargin,
          """CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
            |  * 1000000 / sqrt((CAST(ss2 AS DOUBLE)
            |    - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1)))
            |  AS BIGINT) AS glass_e6""".stripMargin),
      Some("""WITH o AS (SELECT CAST(floor(o_totalprice / 100 + 0.5)
             |                    AS BIGINT) AS x,
             |                  o_orderpriority = '1-URGENT' AS expo
             |           FROM orders),
             |m AS (SELECT
             |  CAST(sum(CASE WHEN expo THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |  CAST(sum(CASE WHEN expo THEN x ELSE 0 END) AS BIGINT) AS s1,
             |  CAST(sum(CASE WHEN expo THEN x * x ELSE 0 END)
             |    AS BIGINT) AS ss1,
             |  CAST(sum(CASE WHEN expo THEN 0 ELSE 1 END) AS BIGINT) AS n2,
             |  CAST(sum(CASE WHEN expo THEN 0 ELSE x END) AS BIGINT) AS s2,
             |  CAST(sum(CASE WHEN expo THEN 0 ELSE x * x END)
             |    AS BIGINT) AS ss2
             |FROM o)
             |SELECT n1, n2,
             |  CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             |    * 1000000 / sqrt(((CAST(ss1 AS DOUBLE)
             |        - CAST(s1 AS DOUBLE) * s1 / n1)
             |      + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
             |      / (n1 + n2 - 2))) AS BIGINT) AS d_e6,
             |  CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             |    * (CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE)
             |        / (4 * (n1 + n2 - 2) - 1))
             |    * 1000000 / sqrt(((CAST(ss1 AS DOUBLE)
             |        - CAST(s1 AS DOUBLE) * s1 / n1)
             |      + (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2))
             |      / (n1 + n2 - 2))) AS BIGINT) AS g_e6,
             |  CAST(floor((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             |    * 1000000 / sqrt((CAST(ss2 AS DOUBLE)
             |      - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1)))
             |    AS BIGINT) AS glass_e6
             |FROM m""".stripMargin)),

    // ── Odds ratio + risk ratio on the urgent × high-value 2×2.
    QueryDef("q_odds_ratio",
      (s, d) => twoByTwo(s, d).selectExpr("a", "b", "c", "dd",
        """CASE WHEN b * c = 0 THEN NULL
          |ELSE a * dd * 1000000 div (b * c) END AS or_e6""".stripMargin,
        """CASE WHEN (a + b) * c = 0 THEN NULL
          |ELSE a * (c + dd) * 1000000 div ((a + b) * c)
          |END AS rr_e6""".stripMargin),
      Some(twoByTwoSql +
        """
          |SELECT a, b, c, dd,
          |       CASE WHEN b * c = 0 THEN NULL
          |       ELSE a * dd * 1000000 // (b * c) END AS or_e6,
          |       CASE WHEN (a + b) * c = 0 THEN NULL
          |       ELSE a * (c + dd) * 1000000 // ((a + b) * c)
          |       END AS rr_e6
          |FROM t""".stripMargin)),

    // ── φ coefficient (double sqrt chain) + Yule's Q (exact integer).
    QueryDef("q_phi_yule",
      (s, d) => twoByTwo(s, d).selectExpr("a", "b", "c", "dd",
        """CASE WHEN (a + b) = 0 OR (c + dd) = 0 OR (a + c) = 0
          |  OR (b + dd) = 0 THEN NULL
          |ELSE CAST(floor((CAST(a AS DOUBLE) * dd - CAST(b AS DOUBLE) * c)
          |  * 1000000 / (sqrt(CAST(a + b AS DOUBLE))
          |    * sqrt(CAST(c + dd AS DOUBLE)) * sqrt(CAST(a + c AS DOUBLE))
          |    * sqrt(CAST(b + dd AS DOUBLE)))) AS BIGINT)
          |END AS phi_e6""".stripMargin,
        """CASE WHEN a * dd + b * c = 0 THEN NULL
          |WHEN a * dd >= b * c
          |  THEN (a * dd - b * c) * 1000000 div (a * dd + b * c)
          |  ELSE -((b * c - a * dd) * 1000000 div (a * dd + b * c))
          |END AS yule_q_e6""".stripMargin),
      Some(twoByTwoSql +
        """
          |SELECT a, b, c, dd,
          |       CASE WHEN (a + b) = 0 OR (c + dd) = 0 OR (a + c) = 0
          |         OR (b + dd) = 0 THEN NULL
          |       ELSE CAST(floor((CAST(a AS DOUBLE) * dd
          |         - CAST(b AS DOUBLE) * c)
          |         * 1000000 / (sqrt(CAST(a + b AS DOUBLE))
          |           * sqrt(CAST(c + dd AS DOUBLE))
          |           * sqrt(CAST(a + c AS DOUBLE))
          |           * sqrt(CAST(b + dd AS DOUBLE)))) AS BIGINT)
          |       END AS phi_e6,
          |       CASE WHEN a * dd + b * c = 0 THEN NULL
          |       WHEN a * dd >= b * c
          |         THEN (a * dd - b * c) * 1000000 // (a * dd + b * c)
          |         ELSE -((b * c - a * dd) * 1000000 // (a * dd + b * c))
          |       END AS yule_q_e6
          |FROM t""".stripMargin)),

    // ── Youden's J across all 11 discount-band thresholds.
    QueryDef("q_youden_j",
      (s, d) => {
        val cells = bandCells(s, d)
        val tot = cells.agg(sum(col("pos")).as("p"), sum(col("neg")).as("nn"))
        cells
          .withColumn("tp", sum(col("pos")).over(
            Window.orderBy(col("band").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("fp", sum(col("neg")).over(
            Window.orderBy(col("band").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(tot))
          .selectExpr("band AS t", "tp", "fp",
            "tp * 1000000 div p AS tpr_e6",
            "fp * 1000000 div nn AS fpr_e6",
            "tp * 1000000 div p - fp * 1000000 div nn AS j_e6")
          .withColumn("rk", row_number().over(
            Window.orderBy(col("j_e6").desc, col("t"))))
      },
      Some(bandCellsSql +
        """,
          |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
          |               CAST(sum(neg) AS BIGINT) AS nn FROM cells),
          |cum AS (SELECT band AS t,
          |          CAST(sum(pos) OVER (ORDER BY band DESC
          |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
          |          CAST(sum(neg) OVER (ORDER BY band DESC
          |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
          |        FROM cells)
          |SELECT t, tp, fp,
          |       tp * 1000000 // p AS tpr_e6,
          |       fp * 1000000 // nn AS fpr_e6,
          |       tp * 1000000 // p - fp * 1000000 // nn AS j_e6,
          |       CAST(row_number() OVER (ORDER BY
          |         tp * 1000000 // p - fp * 1000000 // nn DESC, t)
          |         AS BIGINT) AS rk
          |FROM cum CROSS JOIN tot""".stripMargin)),

    // ── F1 / F0.5 / F2 + balanced accuracy at the band-5 threshold.
    QueryDef("q_fbeta",
      (s, d) => bandCells(s, d).agg(
          sum(when(col("band") >= 5, col("pos")).otherwise(0L)).as("tp"),
          sum(when(col("band") >= 5, col("neg")).otherwise(0L)).as("fp"),
          sum(when(col("band") < 5, col("pos")).otherwise(0L)).as("fn"),
          sum(when(col("band") < 5, col("neg")).otherwise(0L)).as("tn"))
        .selectExpr("tp", "fp", "fn", "tn",
          "2 * tp * 1000000 div (2 * tp + fp + fn) AS f1_e6",
          "5 * tp * 1000000 div (5 * tp + fn + 4 * fp) AS f05_e6",
          "5 * tp * 1000000 div (5 * tp + 4 * fn + fp) AS f2_e6",
          """(tp * 1000000 div (tp + fn) + tn * 1000000 div (tn + fp))
            |div 2 AS bal_acc_e6""".stripMargin),
      Some(bandCellsSql +
        """,
          |t AS (SELECT
          |  CAST(sum(CASE WHEN band >= 5 THEN pos ELSE 0 END)
          |    AS BIGINT) AS tp,
          |  CAST(sum(CASE WHEN band >= 5 THEN neg ELSE 0 END)
          |    AS BIGINT) AS fp,
          |  CAST(sum(CASE WHEN band < 5 THEN pos ELSE 0 END)
          |    AS BIGINT) AS fn,
          |  CAST(sum(CASE WHEN band < 5 THEN neg ELSE 0 END)
          |    AS BIGINT) AS tn
          |FROM cells)
          |SELECT tp, fp, fn, tn,
          |       2 * tp * 1000000 // (2 * tp + fp + fn) AS f1_e6,
          |       5 * tp * 1000000 // (5 * tp + fn + 4 * fp) AS f05_e6,
          |       5 * tp * 1000000 // (5 * tp + 4 * fn + fp) AS f2_e6,
          |       (tp * 1000000 // (tp + fn) + tn * 1000000 // (tn + fp))
          |         // 2 AS bal_acc_e6
          |FROM t""".stripMargin))
  )
}

