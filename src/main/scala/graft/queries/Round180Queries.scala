package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-180 batch — three model-adequacy reads:
  *
  *  - Tarone's Z (`q_tarone_z`): score test for beta-binomial
  *    overdispersion of per-part return rates against the pooled
  *    binomial — the "is one p enough" gate before any binomial GLM.
  *    S = Σ(Ny_j − n_jR)²/(R(N−R)) is kept as an exact integer
  *    numerator over a closed denominator (the N² cancellation), so
  *    Z = (S − N)/√(2Σn(n−1)) closes in one double chain.
  *  - PRESS / LOOCV (`q_press_loocv`): leave-one-out prediction error
  *    of the acctbal~spend regression via the closed form
  *    e_i/(1−h_i) with hat values h_i = 1/n + (x_i−x̄)²/Sxx — the
  *    n-fold cross-validation that costs ONE pass. Each deleted
  *    residual is a per-row scalar double chain rounded to integer
  *    cents BEFORE the square-sum (the portability rule), giving
  *    PRESS, SSE, and predictive R² vs the in-sample R².
  *  - Mincer–Zarnowitz (`q_mincer_zarnowitz`): forecast-rationality
  *    regression of monthly revenue on its naive lag-1 forecast —
  *    α=0, β=1 is the rational benchmark; the t-stat on β−1 reads
  *    whether the naive forecast is systematically improvable. The
  *    missing piece of the forecast-eval family next to q_mase /
  *    q_smape_eval / q_pinball_loss.
  */
object Round180Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Tarone's Z over per-part return counts.
    QueryDef("q_tarone_z",
      (s, d) => {
        val per = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CASE WHEN l_returnflag = 'R' THEN 1L ELSE 0L END"))
              .as("y"))
        val tot = per.agg(sum(col("n")).as("nn"), sum(col("y")).as("rr"))
        per.crossJoin(broadcast(tot))
          .agg(count(lit(1)).as("groups"), max(col("nn")).as("nn"),
            max(col("rr")).as("rr"),
            sum(expr(s"CAST(nn * y - n * rr AS $dec)" +
              s" * (nn * y - n * rr)")).as("ss"),
            sum(expr("n * (n - 1)")).as("pairs2"))
          .selectExpr("groups", "nn AS n_total", "rr AS r_total",
            """CASE WHEN rr = 0 OR rr = nn OR pairs2 = 0 THEN NULL
              |ELSE round((CAST(ss AS DOUBLE)
              |    / (CAST(rr AS DOUBLE) * CAST(nn - rr AS DOUBLE))
              |    - CAST(nn AS DOUBLE))
              |  / sqrt(CAST('2.0' AS DOUBLE)
              |    * CAST(pairs2 AS DOUBLE)), 6)
              |END AS tarone_z""".stripMargin)
      },
      Some("""WITH per AS (
             |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1
             |                       ELSE 0 END) AS BIGINT) AS y
             |  FROM lineitem GROUP BY 1),
             |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             |               CAST(sum(y) AS BIGINT) AS rr FROM per),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS groups,
             |          max(nn) AS nn, max(rr) AS rr,
             |          sum(CAST(nn * y - n * rr AS HUGEINT)
             |            * (nn * y - n * rr)) AS ss,
             |          CAST(sum(n * (n - 1)) AS BIGINT) AS pairs2
             |        FROM per CROSS JOIN tot)
             |SELECT groups, nn AS n_total, rr AS r_total,
             |       CASE WHEN rr = 0 OR rr = nn OR pairs2 = 0 THEN NULL
             |       ELSE round((CAST(ss AS DOUBLE)
             |           / (CAST(rr AS DOUBLE) * CAST(nn - rr AS DOUBLE))
             |           - CAST(nn AS DOUBLE))
             |         / sqrt(CAST('2.0' AS DOUBLE)
             |           * CAST(pairs2 AS DOUBLE)), 6)
             |       END AS tarone_z
             |FROM agg""".stripMargin)),

    // ── PRESS: one-pass leave-one-out via hat values.
    QueryDef("q_press_loocv",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("x"))
        val base = Tables.customer(s, d)
          .select(col("c_custkey"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("y"))
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("x"), col("y"))
          .localCheckpoint(false) // moments + per-row deleted residuals
        val mom = base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(expr(s"CAST(x AS $dec) * x")).as("qx"),
            sum(expr(s"CAST(x AS $dec) * y")).as("qxy"),
            sum(expr(s"CAST(y AS $dec) * y")).as("qy"))
          .selectExpr("CAST(n AS BIGINT) AS n", "sx", "sy", "qy",
            s"CAST(n AS $dec) * qx - CAST(sx AS $dec) * sx AS cxx",
            s"CAST(n AS $dec) * qxy - CAST(sx AS $dec) * sy AS cxy")
          .selectExpr("n", "sx", "sy", "cxx", "qy",
            """CASE WHEN cxx = 0 THEN CAST(0.0 AS DOUBLE)
              |ELSE round(CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE), 6)
              |END AS b1""".stripMargin)
          .selectExpr("n", "sx", "sy", "cxx", "qy", "b1",
            """round((CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE))
              | / CAST(n AS DOUBLE), 6) AS b0""".stripMargin)
        base.crossJoin(broadcast(mom))
          .selectExpr("n", "sy", "qy",
            """CAST(round(CAST(y AS DOUBLE) - b0
              | - b1 * CAST(x AS DOUBLE)) AS BIGINT) AS e"""
              .stripMargin,
            // h_i = 1/n + n(x−x̄)²/(n·Sxx) with the n²-scale cxx:
            //   (x−x̄)² = (n·x − sx)²/n² → h = 1/n + (n·x−sx)²/(n·cxx)
            """(CAST('1.0' AS DOUBLE) / CAST(n AS DOUBLE)
              | + CAST(CAST(n AS decimal(38,0)) * x - sx AS DOUBLE)
              |   * CAST(CAST(n AS decimal(38,0)) * x - sx AS DOUBLE)
              |   / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE))) AS h"""
              .stripMargin)
          .selectExpr("n", "sy", "qy", "e",
            """CAST(round(CAST(e AS DOUBLE)
              | / (CAST('1.0' AS DOUBLE) - h)) AS BIGINT) AS pe"""
              .stripMargin)
          .agg(max(col("n")).as("n"), max(col("sy")).as("sy"),
            max(col("qy")).as("qy"),
            sum(expr(s"CAST(e AS $dec) * e")).as("sse"),
            sum(expr(s"CAST(pe AS $dec) * pe")).as("press"))
          .selectExpr("n", "CAST(sse AS BIGINT) AS sse",
            "CAST(press AS BIGINT) AS press",
            s"""CASE WHEN CAST(n AS $dec) * qy
               | - CAST(sy AS $dec) * sy = 0 THEN NULL
               |ELSE round(CAST('1.0' AS DOUBLE)
               |  - CAST(press AS DOUBLE) * CAST(n AS DOUBLE)
               |    / CAST(CAST(n AS $dec) * qy
               |      - CAST(sy AS $dec) * sy AS DOUBLE), 6)
               |END AS r2_pred""".stripMargin,
            s"""CASE WHEN CAST(n AS $dec) * qy
               | - CAST(sy AS $dec) * sy = 0 THEN NULL
               |ELSE round(CAST('1.0' AS DOUBLE)
               |  - CAST(sse AS DOUBLE) * CAST(n AS DOUBLE)
               |    / CAST(CAST(n AS $dec) * qy
               |      - CAST(sy AS $dec) * sy AS DOUBLE), 6)
               |END AS r2_fit""".stripMargin)
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |base AS (SELECT x,
             |           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             |             AS y
             |         FROM customer
             |         JOIN spend ON o_custkey = c_custkey),
             |m0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(x) AS HUGEINT) AS sx,
             |              CAST(sum(y) AS HUGEINT) AS sy,
             |              sum(CAST(x AS HUGEINT) * x) AS qx,
             |              sum(CAST(x AS HUGEINT) * y) AS qxy,
             |              sum(CAST(y AS HUGEINT) * y) AS qy
             |       FROM base),
             |m1 AS (SELECT n, sx, sy, qy,
             |         CAST(n AS HUGEINT) * qx - sx * sx AS cxx,
             |         CAST(n AS HUGEINT) * qxy - sx * sy AS cxy
             |       FROM m0),
             |m2 AS (SELECT n, sx, sy, cxx, qy,
             |         CASE WHEN cxx = 0 THEN CAST(0.0 AS DOUBLE)
             |         ELSE round(CAST(cxy AS DOUBLE)
             |           / CAST(cxx AS DOUBLE), 6) END AS b1
             |       FROM m1),
             |mom AS (SELECT n, sx, sy, cxx, qy, b1,
             |          round((CAST(sy AS DOUBLE) - b1
             |            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
             |            AS b0
             |        FROM m2),
             |rows_ AS (SELECT n, sy, qy,
             |            CAST(round(CAST(y AS DOUBLE) - b0
             |              - b1 * CAST(x AS DOUBLE)) AS BIGINT) AS e,
             |            (CAST('1.0' AS DOUBLE) / CAST(n AS DOUBLE)
             |             + CAST(CAST(n AS HUGEINT) * x - sx AS DOUBLE)
             |               * CAST(CAST(n AS HUGEINT) * x - sx
             |                 AS DOUBLE)
             |               / (CAST(n AS DOUBLE) * CAST(cxx AS DOUBLE)))
             |              AS h
             |          FROM base CROSS JOIN mom),
             |pr AS (SELECT n, sy, qy, e,
             |         CAST(round(CAST(e AS DOUBLE)
             |           / (CAST('1.0' AS DOUBLE) - h)) AS BIGINT) AS pe
             |       FROM rows_),
             |agg AS (SELECT max(n) AS n, max(sy) AS sy, max(qy) AS qy,
             |          sum(CAST(e AS HUGEINT) * e) AS sse,
             |          sum(CAST(pe AS HUGEINT) * pe) AS press
             |        FROM pr)
             |SELECT n, CAST(sse AS BIGINT) AS sse,
             |       CAST(press AS BIGINT) AS press,
             |       CASE WHEN CAST(n AS HUGEINT) * qy - sy * sy = 0
             |         THEN NULL
             |       ELSE round(CAST('1.0' AS DOUBLE)
             |         - CAST(press AS DOUBLE) * CAST(n AS DOUBLE)
             |           / CAST(CAST(n AS HUGEINT) * qy - sy * sy
             |             AS DOUBLE), 6) END AS r2_pred,
             |       CASE WHEN CAST(n AS HUGEINT) * qy - sy * sy = 0
             |         THEN NULL
             |       ELSE round(CAST('1.0' AS DOUBLE)
             |         - CAST(sse AS DOUBLE) * CAST(n AS DOUBLE)
             |           / CAST(CAST(n AS HUGEINT) * qy - sy * sy
             |             AS DOUBLE), 6) END AS r2_fit
             |FROM agg""".stripMargin)),

    // ── Mincer–Zarnowitz: actual on naive lag-1 forecast.
    QueryDef("q_mincer_zarnowitz",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val monthly = Tables.lineitem(s, d)
          .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " div 2592000000000").as("mo"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)
            .cast("long")).as("a"))
        val p = monthly
          .withColumn("f", lag(col("a"), 1).over(Window.orderBy("mo")))
          .where(col("f").isNotNull)
          .selectExpr(s"CAST(f AS $dec) AS x", s"CAST(a AS $dec) AS y")
        p.agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("y") * col("y")).as("syy"))
          .selectExpr("CAST(n AS BIGINT) AS n_months",
            """CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              |ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
              |  / CAST(n * sxx - sx * sx AS DOUBLE), 6)
              |END AS beta""".stripMargin,
            """CASE WHEN n * sxx - sx * sx = 0 THEN NULL
              |ELSE round((CAST(sy AS DOUBLE)
              |    - (CAST(n * sxy - sx * sy AS DOUBLE)
              |       / CAST(n * sxx - sx * sx AS DOUBLE))
              |      * CAST(sx AS DOUBLE))
              |  / CAST(n AS DOUBLE) / CAST('100.0' AS DOUBLE), 6)
              |END AS alpha_usd""".stripMargin,
            // t on β−1: (β−1)/se(β), se² = (SSE/(n−2))·n/(n·Sxx−Sx²)
            """CASE WHEN n * sxx - sx * sx = 0 OR n <= 2 THEN NULL
              |ELSE round((CAST(n * sxy - sx * sy AS DOUBLE)
              |    / CAST(n * sxx - sx * sx AS DOUBLE)
              |    - CAST('1.0' AS DOUBLE))
              |  / sqrt(((CAST(n * syy - sy * sy AS DOUBLE)
              |          - CAST(n * sxy - sx * sy AS DOUBLE)
              |            * CAST(n * sxy - sx * sy AS DOUBLE)
              |            / CAST(n * sxx - sx * sx AS DOUBLE))
              |         / CAST(n - 2 AS DOUBLE))
              |        / CAST(n * sxx - sx * sx AS DOUBLE)
              |        * CAST(n AS DOUBLE)), 6)
              |END AS t_beta_minus_1""".stripMargin)
      },
      Some("""WITH monthly AS (
             |  SELECT epoch_us(l_shipdate) // 2592000000000 AS mo,
             |         CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS a
             |  FROM lineitem GROUP BY 1),
             |p AS (SELECT CAST(f AS HUGEINT) AS x,
             |             CAST(a AS HUGEINT) AS y
             |      FROM (SELECT a, lag(a) OVER (ORDER BY mo) AS f
             |            FROM monthly)
             |      WHERE f IS NOT NULL),
             |m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |             sum(x) AS sx, sum(y) AS sy,
             |             sum(x * x) AS sxx, sum(x * y) AS sxy,
             |             sum(y * y) AS syy
             |      FROM p)
             |SELECT CAST(n AS BIGINT) AS n_months,
             |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
             |         / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             |       END AS beta,
             |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
             |       ELSE round((CAST(sy AS DOUBLE)
             |           - (CAST(n * sxy - sx * sy AS DOUBLE)
             |              / CAST(n * sxx - sx * sx AS DOUBLE))
             |             * CAST(sx AS DOUBLE))
             |         / CAST(n AS DOUBLE) / CAST('100.0' AS DOUBLE), 6)
             |       END AS alpha_usd,
             |       CASE WHEN n * sxx - sx * sx = 0 OR n <= 2 THEN NULL
             |       ELSE round((CAST(n * sxy - sx * sy AS DOUBLE)
             |           / CAST(n * sxx - sx * sx AS DOUBLE)
             |           - CAST('1.0' AS DOUBLE))
             |         / sqrt(((CAST(n * syy - sy * sy AS DOUBLE)
             |                 - CAST(n * sxy - sx * sy AS DOUBLE)
             |                   * CAST(n * sxy - sx * sy AS DOUBLE)
             |                   / CAST(n * sxx - sx * sx AS DOUBLE))
             |                / CAST(n - 2 AS DOUBLE))
             |               / CAST(n * sxx - sx * sx AS DOUBLE)
             |               * CAST(n AS DOUBLE)), 6)
             |       END AS t_beta_minus_1
             |FROM m""".stripMargin))
  )
}
