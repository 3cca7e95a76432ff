package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-173 batch — two modern dependence measures and a lifetime
  * model:
  *
  *  - Chatterjee's ξ (`q_xi_correlation`): the rank-based coefficient
  *    that detects ARBITRARY functional dependence (ξ→1 iff y is a
  *    measurable function of x), where Pearson/Spearman read 0 on a
  *    parabola. ξ = 1 − 3Σ|r_{i+1}−r_i|/(n²−1) with y-ranks walked in
  *    x-order — two windows sharing ONE segment-keyed shuffle, full
  *    tie-break order so the rank walk is engine-exact.
  *  - Distance correlation (`q_distance_corr`): Székely's dCor between
  *    the two region revenue series on the bounded month axis. The
  *    double-centered products are fully integerized by multiplying
  *    through by m² (A′ = m²d − m·rᵢ − m·rⱼ + T — exact BIGINT→decimal
  *    algebra), so ΣA′B′ / √(ΣA′²·ΣB′²) is one portable double chain —
  *    the r10 lesson that cross-row double sums are never portable,
  *    applied to an O(m²) statistic the bounded axis makes affordable.
  *    Pearson r rides along for the linear-vs-nonlinear contrast.
  *  - Geometric retention (`q_geometric_retention`): per signup cohort,
  *    the right-censored geometric MLE r̂ = Σ(L−1+c)/ΣL over user
  *    lifetimes (months from first to last activity, censored at the
  *    horizon), with the implied expected lifetime 1/(1−r̂). The
  *    parametric companion to q_cohort_retention's empirical curve.
  */
object Round173Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Chatterjee's ξ per segment over (acctbal, spend).
    QueryDef("q_xi_correlation",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("y"))
        val per = Tables.customer(s, d)
          .select(col("c_custkey").as("ck"),
            col("c_mktsegment").as("seg"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("x"))
          .join(spend, col("ck") === col("o_custkey"))
          .select(col("seg"), col("ck"), col("x"), col("y"))
        val wy = Window.partitionBy(col("seg"))
          .orderBy(col("y"), col("ck"))
        val wx = Window.partitionBy(col("seg"))
          .orderBy(col("x"), col("ck"))
        per
          .withColumn("r", row_number().over(wy).cast("long"))
          .withColumn("rn", lead(col("r"), 1).over(wx))
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CASE WHEN rn IS NULL THEN 0L" +
              " ELSE abs(rn - r) END")).as("s"))
          .selectExpr("seg", "n", "s",
            """round(CAST('1.0' AS DOUBLE)
              | - CAST('3.0' AS DOUBLE) * CAST(s AS DOUBLE)
              |   / CAST(n * n - 1 AS DOUBLE), 6) AS xi"""
              .stripMargin)
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS y
             |  FROM orders GROUP BY 1),
             |per AS (SELECT c_mktsegment AS seg, c_custkey AS ck,
             |          CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x,
             |          y
             |        FROM customer JOIN spend ON o_custkey = c_custkey),
             |rk AS (SELECT seg, ck, x, y,
             |         CAST(row_number() OVER (PARTITION BY seg
             |           ORDER BY y, ck) AS BIGINT) AS r
             |       FROM per),
             |wk AS (SELECT seg, r,
             |         lead(r) OVER (PARTITION BY seg ORDER BY x, ck)
             |           AS rn
             |       FROM rk)
             |SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(CASE WHEN rn IS NULL THEN 0
             |                     ELSE abs(rn - r) END) AS BIGINT) AS s,
             |       round(CAST('1.0' AS DOUBLE)
             |         - CAST('3.0' AS DOUBLE)
             |           * CAST(sum(CASE WHEN rn IS NULL THEN 0
             |                          ELSE abs(rn - r) END) AS DOUBLE)
             |           / CAST(count(*) * count(*) - 1 AS DOUBLE), 6)
             |         AS xi
             |FROM wk GROUP BY 1""".stripMargin)),

    // ── Distance correlation between region revenue series.
    QueryDef("q_distance_corr",
      (s, d) => {
        val monthly = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .where(col("n_regionkey").isin(0, 1))
          .groupBy(expr("CAST(unix_micros(CAST(o_orderdate AS" +
            " TIMESTAMP)) div 2592000000000 AS BIGINT)").as("mo"))
          .agg(sum(when(col("n_regionkey") === 0,
            floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .otherwise(0L)).as("a"),
            sum(when(col("n_regionkey") === 1,
              floor(col("o_totalprice") * 100 + 0.5).cast("long"))
              .otherwise(0L)).as("b"))
          .localCheckpoint(false) // pair join ×2 sides + moments
        val pairs = monthly.select(col("mo").as("i"), col("a").as("ai"),
            col("b").as("bi"))
          .crossJoin(monthly.select(col("mo").as("j"), col("a").as("aj"),
            col("b").as("bj")))
          .selectExpr("i", "j", "abs(ai - aj) AS da", "abs(bi - bj) AS db")
          .localCheckpoint(false) // row sums + centered products
        val rows = pairs.groupBy(col("i"))
          .agg(sum(col("da")).as("ra"), sum(col("db")).as("rb"))
        val tot = rows.agg(sum(col("ra")).as("ta"), sum(col("rb")).as("tb"),
          count(lit(1)).as("m"))
        val cent = pairs
          .join(broadcast(rows.select(col("i"), col("ra").as("rai"),
            col("rb").as("rbi"))), "i")
          .join(broadcast(rows.select(col("i").as("j"),
            col("ra").as("raj"), col("rb").as("rbj"))), "j")
          .crossJoin(broadcast(tot))
          .selectExpr(
            s"CAST(m AS $dec) * m * da - CAST(m AS $dec) * rai" +
              s" - CAST(m AS $dec) * raj + ta AS ca",
            s"CAST(m AS $dec) * m * db - CAST(m AS $dec) * rbi" +
              s" - CAST(m AS $dec) * rbj + tb AS cb")
          .agg(sum(expr("ca * cb")).as("sab"),
            sum(expr("ca * ca")).as("saa"),
            sum(expr("cb * cb")).as("sbb"))
        val pear = monthly.agg(count(lit(1)).as("n"), sum(col("a")).as("sa"),
          sum(col("b")).as("sb"),
          sum(expr(s"CAST(a AS $dec) * a")).as("qa"),
          sum(expr(s"CAST(b AS $dec) * b")).as("qb"),
          sum(expr(s"CAST(a AS $dec) * b")).as("qab"))
        cent.crossJoin(broadcast(pear))
          .selectExpr("CAST(n AS BIGINT) AS n_months",
            """CASE WHEN saa = 0 OR sbb = 0 THEN NULL
              |ELSE round(sqrt(CAST(sab AS DOUBLE)
              |  / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))), 6)
              |END AS dcor""".stripMargin,
            s"""round(CAST(CAST(n AS $dec) * qab
               | - CAST(sa AS $dec) * sb AS DOUBLE)
               | / sqrt(CAST(CAST(n AS $dec) * qa
               |     - CAST(sa AS $dec) * sa AS DOUBLE)
               |   * CAST(CAST(n AS $dec) * qb
               |     - CAST(sb AS $dec) * sb AS DOUBLE)), 6)
               | AS pearson_r""".stripMargin)
      },
      Some("""WITH monthly AS (
             |  SELECT epoch_us(o_orderdate) // 2592000000000 AS mo,
             |         CAST(sum(CASE WHEN n_regionkey = 0 THEN
             |           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           ELSE 0 END) AS BIGINT) AS a,
             |         CAST(sum(CASE WHEN n_regionkey = 1 THEN
             |           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |           ELSE 0 END) AS BIGINT) AS b
             |  FROM orders
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation ON n_nationkey = c_nationkey
             |  WHERE n_regionkey IN (0, 1)
             |  GROUP BY 1),
             |pairs AS (SELECT x.mo AS i, y.mo AS j,
             |            abs(x.a - y.a) AS da, abs(x.b - y.b) AS db
             |          FROM monthly x CROSS JOIN monthly y),
             |rows_ AS (SELECT i, CAST(sum(da) AS HUGEINT) AS ra,
             |                 CAST(sum(db) AS HUGEINT) AS rb
             |          FROM pairs GROUP BY 1),
             |tot AS (SELECT CAST(sum(ra) AS HUGEINT) AS ta,
             |               CAST(sum(rb) AS HUGEINT) AS tb,
             |               CAST(count(*) AS HUGEINT) AS m FROM rows_),
             |cent AS (SELECT
             |           m * m * da - m * ri.ra - m * rj.ra + ta AS ca,
             |           m * m * db - m * ri.rb - m * rj.rb + tb AS cb
             |         FROM pairs p
             |         JOIN rows_ ri ON ri.i = p.i
             |         JOIN rows_ rj ON rj.i = p.j
             |         CROSS JOIN tot),
             |cm AS (SELECT sum(ca * cb) AS sab, sum(ca * ca) AS saa,
             |              sum(cb * cb) AS sbb FROM cent),
             |pm AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(a) AS HUGEINT) AS sa,
             |              CAST(sum(b) AS HUGEINT) AS sb,
             |              sum(CAST(a AS HUGEINT) * a) AS qa,
             |              sum(CAST(b AS HUGEINT) * b) AS qb,
             |              sum(CAST(a AS HUGEINT) * b) AS qab
             |       FROM monthly)
             |SELECT n AS n_months,
             |       CASE WHEN saa = 0 OR sbb = 0 THEN NULL
             |       ELSE round(sqrt(CAST(sab AS DOUBLE)
             |         / sqrt(CAST(saa AS DOUBLE) * CAST(sbb AS DOUBLE))),
             |         6) END AS dcor,
             |       round(CAST(CAST(n AS HUGEINT) * qab - sa * sb
             |           AS DOUBLE)
             |         / sqrt(CAST(CAST(n AS HUGEINT) * qa - sa * sa
             |             AS DOUBLE)
             |           * CAST(CAST(n AS HUGEINT) * qb - sb * sb
             |             AS DOUBLE)), 6) AS pearson_r
             |FROM cm CROSS JOIN pm""".stripMargin)),

    // ── Right-censored geometric retention MLE per signup cohort.
    QueryDef("q_geometric_retention",
      (s, d) => {
        val act = Tables.events(s, d)
          .select(col("user_id").as("u"),
            expr("unix_micros(ts) div 2592000000000").as("m"))
          .distinct()
        val horizon = act.agg(max(col("m")).as("hz"))
        act.groupBy(col("u"))
          .agg(min(col("m")).as("fm"), max(col("m")).as("lm"))
          .crossJoin(broadcast(horizon))
          .selectExpr("fm AS cohort", "lm - fm + 1 AS life",
            "CASE WHEN lm = hz THEN 1L ELSE 0L END AS censored")
          .groupBy(col("cohort"))
          .agg(count(lit(1)).as("n_users"),
            sum(lit(1L) - col("censored")).as("churned"),
            sum(col("life")).as("sl"),
            sum(expr("life - 1 + censored")).as("surv"))
          .selectExpr("cohort", "n_users", "churned",
            "surv * 1000000 div sl AS r_e6",
            """CASE WHEN sl = surv THEN NULL
              |ELSE sl * 1000000 div (sl - surv) END
              | AS expected_life_months_e6""".stripMargin)
      },
      Some("""WITH act AS (
             |  SELECT DISTINCT user_id AS u,
             |         epoch_us(ts) // 2592000000000 AS m
             |  FROM events),
             |hz AS (SELECT max(m) AS hz FROM act),
             |lt AS (SELECT u, min(m) AS fm, max(m) AS lm
             |       FROM act GROUP BY 1),
             |lab AS (SELECT fm AS cohort, lm - fm + 1 AS life,
             |          CASE WHEN lm = hz THEN 1 ELSE 0 END AS censored
             |        FROM lt CROSS JOIN hz)
             |SELECT cohort, CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(1 - censored) AS BIGINT) AS churned,
             |       CAST(sum(life - 1 + censored) AS BIGINT) * 1000000
             |         // CAST(sum(life) AS BIGINT) AS r_e6,
             |       CASE WHEN sum(life) = sum(life - 1 + censored)
             |         THEN NULL
             |       ELSE CAST(sum(life) AS BIGINT) * 1000000
             |         // (CAST(sum(life) AS BIGINT)
             |            - CAST(sum(life - 1 + censored) AS BIGINT))
             |       END AS expected_life_months_e6
             |FROM lab GROUP BY 1""".stripMargin))
  )
}
