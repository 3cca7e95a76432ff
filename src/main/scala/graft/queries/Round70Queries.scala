package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-70 batch over the shared per-order metric frame (quantity,
  * revenue, line count): diagonal-Mahalanobis multivariate outliers
  * (the joint-anomaly ranking q_anomaly_zscore's single channel can't
  * see), Cronbach's α (internal-consistency reliability of the three
  * channels), and variance inflation factors (the multicollinearity
  * diagnostic that says whether q_linreg2-style fits are trustworthy).
  */
object Round70Queries {

  private val dec = "decimal(38,0)"

  /** (l_orderkey, x=qty cents-free units, y=price cents, z=line count). */
  private def perOrder(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d).groupBy(col("l_orderkey").as("ok"))
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("x"),
        sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("y"),
        count(lit(1)).as("z"))

  private val perOrderSql =
    """per AS (SELECT l_orderkey AS ok,
      |               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
      |                 AS BIGINT) AS x,
      |               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
      |                 AS BIGINT)) AS BIGINT) AS y,
      |               CAST(count(*) AS BIGINT) AS z
      |        FROM lineitem GROUP BY 1)""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── Top-20 joint outliers by Σᵢ zᵢ² with n²-scaled exact numerators.
    QueryDef("q_mahalanobis_diag",
      (s, d) => {
        val per = perOrder(s, d)
        val mom = per.agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum(col("z").cast(dec)).as("sz"),
          sum(col("x").cast(dec) * col("x").cast(dec)).as("qx"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("qy"),
          sum(col("z").cast(dec) * col("z").cast(dec)).as("qz"))
        def z2(c: String) =
          s"""(CAST(n * $c - s$c AS DOUBLE) * CAST(n * $c - s$c AS DOUBLE)
             | / CAST(n * q$c - s$c * s$c AS DOUBLE))""".stripMargin
        per.crossJoin(broadcast(mom))
          .selectExpr("ok", "x", "y", "z",
            s"round(${z2("x")} + ${z2("y")} + ${z2("z")}, 6) AS score")
          .withColumn("rk", row_number().over(
            Window.orderBy(col("score").desc, col("ok"))))
          .where(col("rk") <= 20).drop("rk")
      },
      Some {
        def z2(c: String) =
          s"""(CAST(n * $c - s$c AS DOUBLE) * CAST(n * $c - s$c AS DOUBLE)
             | / CAST(n * q$c - s$c * s$c AS DOUBLE))""".stripMargin
        s"""WITH $perOrderSql,
           |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |               CAST(sum(x) AS HUGEINT) AS sx,
           |               CAST(sum(y) AS HUGEINT) AS sy,
           |               CAST(sum(z) AS HUGEINT) AS sz,
           |               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS qx,
           |               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS qy,
           |               sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS qz
           |        FROM per),
           |sc AS (SELECT ok, x, y, z,
           |              round(${z2("x")} + ${z2("y")} + ${z2("z")}, 6)
           |                AS score
           |       FROM per CROSS JOIN mom)
           |SELECT ok, x, y, z, score FROM (
           |  SELECT *, row_number() OVER (ORDER BY score DESC, ok) AS rk
           |  FROM sc)
           |WHERE rk <= 20""".stripMargin
      }),

    // ── Cronbach's α = k/(k−1)·(1 − Σ item-var / total-var); the n²
    //    scaling cancels, so both variance sides stay exact integers.
    QueryDef("q_cronbach_alpha",
      (s, d) => perOrder(s, d)
        .withColumn("t", col("x") + col("y") + col("z"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum(col("z").cast(dec)).as("sz"), sum(col("t").cast(dec)).as("st"),
          sum(col("x").cast(dec) * col("x").cast(dec)).as("qx"),
          sum(col("y").cast(dec) * col("y").cast(dec)).as("qy"),
          sum(col("z").cast(dec) * col("z").cast(dec)).as("qz"),
          sum(col("t").cast(dec) * col("t").cast(dec)).as("qt"))
        .selectExpr("CAST(n AS BIGINT) AS n", "CAST(3 AS BIGINT) AS k",
          """round(CAST('1.5' AS DOUBLE) * (CAST('1.0' AS DOUBLE)
            | - (CAST(n * qx - sx * sx AS DOUBLE)
            |    + CAST(n * qy - sy * sy AS DOUBLE)
            |    + CAST(n * qz - sz * sz AS DOUBLE))
            |   / CAST(n * qt - st * st AS DOUBLE)), 6) AS alpha"""
            .stripMargin),
      Some(s"""WITH $perOrderSql,
              |w AS (SELECT *, x + y + z AS t FROM per),
              |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
              |               CAST(sum(x) AS HUGEINT) AS sx,
              |               CAST(sum(y) AS HUGEINT) AS sy,
              |               CAST(sum(z) AS HUGEINT) AS sz,
              |               CAST(sum(t) AS HUGEINT) AS st,
              |               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
              |                 AS qx,
              |               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
              |                 AS qy,
              |               sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT))
              |                 AS qz,
              |               sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT))
              |                 AS qt
              |        FROM w)
              |SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k,
              |       round(CAST('1.5' AS DOUBLE) * (CAST('1.0' AS DOUBLE)
              |         - (CAST(n * qx - sx * sx AS DOUBLE)
              |            + CAST(n * qy - sy * sy AS DOUBLE)
              |            + CAST(n * qz - sz * sz AS DOUBLE))
              |           / CAST(n * qt - st * st AS DOUBLE)), 6) AS alpha
              |FROM mom""".stripMargin)),

    // ── VIFs from the closed-form 3-variable R²:
    //    R²_x = (r_xy² + r_xz² − 2 r_xy r_xz r_yz)/(1 − r_yz²).
    QueryDef("q_vif",
      (s, d) => {
        def r(a: String, b: String) =
          s"""(CAST(n * x_${a}_$b - s_$a * s_$b AS DOUBLE) /
             |sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE) *
             |     CAST(n * q_$b - s_$b * s_$b AS DOUBLE)))""".stripMargin
        def vif(me: String, o1: String, o2: String) =
          s"""round(CAST('1.0' AS DOUBLE) / (CAST('1.0' AS DOUBLE) -
             |  (r_${me}_$o1 * r_${me}_$o1 + r_${me}_$o2 * r_${me}_$o2
             |   - 2 * r_${me}_$o1 * r_${me}_$o2 * r_${o1}_$o2)
             |  / (CAST('1.0' AS DOUBLE) - r_${o1}_$o2 * r_${o1}_$o2)), 6)
             |""".stripMargin
        perOrder(s, d)
          .agg(count(lit(1)).cast(dec).as("n"),
            sum(col("x").cast(dec)).as("s_x"),
            sum(col("y").cast(dec)).as("s_y"),
            sum(col("z").cast(dec)).as("s_z"),
            sum(col("x").cast(dec) * col("x").cast(dec)).as("q_x"),
            sum(col("y").cast(dec) * col("y").cast(dec)).as("q_y"),
            sum(col("z").cast(dec) * col("z").cast(dec)).as("q_z"),
            sum(col("x").cast(dec) * col("y").cast(dec)).as("x_x_y"),
            sum(col("x").cast(dec) * col("z").cast(dec)).as("x_x_z"),
            sum(col("y").cast(dec) * col("z").cast(dec)).as("x_y_z"))
          .selectExpr("CAST(n AS BIGINT) AS n",
            s"${r("x", "y")} AS r_x_y", s"${r("x", "z")} AS r_x_z",
            s"${r("y", "z")} AS r_y_z")
          .selectExpr("n",
            s"${vif("x", "y", "z").replace("r_x_y", "r_x_y")
              .replace("r_x_z", "r_x_z").replace("r_y_z", "r_y_z")} AS vif_x",
            s"${vif("y", "x", "z").replace("r_y_x", "r_x_y")
              .replace("r_x_z", "r_x_z")} AS vif_y",
            s"${vif("z", "x", "y").replace("r_z_x", "r_x_z")
              .replace("r_z_y", "r_y_z")} AS vif_z")
      },
      Some {
        def r(a: String, b: String) =
          s"""(CAST(n * x_${a}_$b - s_$a * s_$b AS DOUBLE) /
             |sqrt(CAST(n * q_$a - s_$a * s_$a AS DOUBLE) *
             |     CAST(n * q_$b - s_$b * s_$b AS DOUBLE)))""".stripMargin
        def vif(me: String, o1: String, o2: String) =
          s"""round(CAST('1.0' AS DOUBLE) / (CAST('1.0' AS DOUBLE) -
             |  (r_${me}_$o1 * r_${me}_$o1 + r_${me}_$o2 * r_${me}_$o2
             |   - 2 * r_${me}_$o1 * r_${me}_$o2 * r_${o1}_$o2)
             |  / (CAST('1.0' AS DOUBLE) - r_${o1}_$o2 * r_${o1}_$o2)), 6)
             |""".stripMargin
        s"""WITH $perOrderSql,
           |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
           |               CAST(sum(x) AS HUGEINT) AS s_x,
           |               CAST(sum(y) AS HUGEINT) AS s_y,
           |               CAST(sum(z) AS HUGEINT) AS s_z,
           |               sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
           |                 AS q_x,
           |               sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT))
           |                 AS q_y,
           |               sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT))
           |                 AS q_z,
           |               sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
           |                 AS x_x_y,
           |               sum(CAST(x AS HUGEINT) * CAST(z AS HUGEINT))
           |                 AS x_x_z,
           |               sum(CAST(y AS HUGEINT) * CAST(z AS HUGEINT))
           |                 AS x_y_z
           |        FROM per),
           |rs AS (SELECT CAST(n AS BIGINT) AS n, ${r("x", "y")} AS r_x_y,
           |              ${r("x", "z")} AS r_x_z, ${r("y", "z")} AS r_y_z
           |       FROM mom)
           |SELECT n,
           |       ${vif("x", "y", "z")} AS vif_x,
           |       ${vif("y", "x", "z").replace("r_y_x", "r_x_y")} AS vif_y,
           |       ${vif("z", "x", "y").replace("r_z_x", "r_x_z")
                    .replace("r_z_y", "r_y_z")} AS vif_z
           |FROM rs""".stripMargin
      })
  )
}
