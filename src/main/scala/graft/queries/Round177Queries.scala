package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Sketches}
import org.apache.spark.sql.functions._

/** Round-177 batch — reliability growth, zero inflation, and the two
  * canonical method-comparison statistics:
  *
  *  - Duane growth (`q_duane_growth`): N(t) ≈ λt^β on cumulative
  *    monthly return counts — β from the log-log regression, entirely
  *    on the integer log₂ ladder (both axes), so the slope is
  *    engine-exact. β < 1 = reliability growth (returns decelerating),
  *    the standard hardware-reliability read applied to return flow.
  *  - Zero inflation (`q_zero_inflation`): observed zero (user, day)
  *    activity cells vs the Poisson expectation U·D·e^(−λ̂) — e^(−λ)
  *    through the 2^(−x) ladder (λ·log₂e in e6). The excess-zeros
  *    ratio is THE screen before fitting any count model.
  *  - Lin's CCC (`q_lins_ccc`): concordance correlation between the
  *    billed line value (extendedprice) and the catalog-implied value
  *    (quantity × retailprice) — precision×accuracy agreement, which
  *    Pearson alone overstates when there is a systematic offset. All
  *    moments at the same n²·cents² integer scale; one double close.
  *  - Bland–Altman (`q_bland_altman`): the companion limits-of-
  *    agreement — mean difference ± 1.96σ as e6-rounded integer cents
  *    BEFORE the outside-count comparison (two passes over one
  *    checkpointed frame), plus the outside share in e6.
  */
object Round177Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Duane: slope of log₂N(cum returns) on log₂(month index).
    QueryDef("q_duane_growth",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val monthly = Tables.lineitem(s, d)
          .where(col("l_returnflag") === "R")
          .groupBy(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
            " div 2592000000000").as("mo"))
          .agg(count(lit(1)).as("f"))
        val cum = monthly
          .withColumn("t",
            row_number().over(Window.orderBy("mo")).cast("long"))
          .withColumn("cn", sum(col("f")).over(Window.orderBy("mo")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("lx", Bm25.log2E6(col("t")))
          .withColumn("ly", Bm25.log2E6(col("cn")))
        cum.agg(count(lit(1)).as("n"), sum(col("lx")).as("sx"),
            sum(col("ly")).as("sy"),
            sum(expr(s"CAST(lx AS $dec) * lx")).as("sxx"),
            sum(expr(s"CAST(lx AS $dec) * ly")).as("sxy"))
          .selectExpr("CAST(n AS BIGINT) AS n_months",
            s"""CASE WHEN CAST(n AS $dec) * sxx
               | - CAST(sx AS $dec) * sx = 0 THEN NULL
               |ELSE round(CAST(CAST(n AS $dec) * sxy
               |    - CAST(sx AS $dec) * sy AS DOUBLE)
               |  / CAST(CAST(n AS $dec) * sxx
               |    - CAST(sx AS $dec) * sx AS DOUBLE), 6)
               |END AS beta""".stripMargin)
      },
      Some {
        val lt = Bm25.log2E6Sql("t")
        val ln = Bm25.log2E6Sql("cn")
        s"""WITH monthly AS (
           |  SELECT epoch_us(l_shipdate) // 2592000000000 AS mo,
           |         CAST(count(*) AS BIGINT) AS f
           |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
           |cum AS (SELECT CAST(row_number() OVER (ORDER BY mo)
           |          AS BIGINT) AS t,
           |          CAST(sum(f) OVER (ORDER BY mo
           |            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn
           |        FROM monthly),
           |lg AS (SELECT $lt AS lx, $ln AS ly FROM cum),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |             CAST(sum(lx) AS HUGEINT) AS sx,
           |             CAST(sum(ly) AS HUGEINT) AS sy,
           |             sum(CAST(lx AS HUGEINT) * lx) AS sxx,
           |             sum(CAST(lx AS HUGEINT) * ly) AS sxy
           |      FROM lg)
           |SELECT n AS n_months,
           |       CASE WHEN CAST(n AS HUGEINT) * sxx - sx * sx = 0
           |         THEN NULL
           |       ELSE round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy
           |           AS DOUBLE)
           |         / CAST(CAST(n AS HUGEINT) * sxx - sx * sx
           |           AS DOUBLE), 6)
           |       END AS beta
           |FROM m""".stripMargin
      }),

    // ── Zero inflation: observed vs Poisson-expected zero cells.
    QueryDef("q_zero_inflation",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("user_id").as("u"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val m = cells.agg(
          countDistinct(col("u")).as("uu"),
          countDistinct(col("day")).as("dd"),
          count(lit(1)).as("tot"))
        val nz = cells.distinct().agg(count(lit(1)).as("nonzero"))
        // All wide products go through decimal(38,0) (HUGEINT on the
        // oracle side): uu*dd*p0_e6 overflows BIGINT once uu*dd exceeds
        // ~9.2e12 cells — below the 100 TB scale this file reasons
        // about, and Spark non-ANSI would wrap silently where DuckDB
        // errors, breaking oracle parity. `div` lands back in BIGINT.
        m.crossJoin(broadcast(nz))
          .selectExpr("uu", "dd", "tot", "nonzero",
            "CAST(CAST(uu AS decimal(38,0)) * dd - nonzero AS BIGINT)" +
              " AS zeros_obs",
            "CAST(tot AS decimal(38,0)) * 1000000" +
              " div (CAST(uu AS decimal(38,0)) * dd) AS lambda_e6")
          .withColumn("y",
            expr("CAST(lambda_e6 AS decimal(38,0)) * 1442695 div 1000000"))
          .withColumn("p0_e6", Sketches.pow2NegE6Expr("y"))
          .selectExpr("uu", "dd", "zeros_obs", "lambda_e6",
            "CAST(uu AS decimal(38,0)) * dd * p0_e6 div 1000000" +
              " AS zeros_expected",
            """CASE WHEN CAST(uu AS decimal(38,0)) * dd * p0_e6
              |  div 1000000 = 0 THEN NULL
              |ELSE CAST(zeros_obs AS decimal(38,0)) * 1000000
              |  div (CAST(uu AS decimal(38,0)) * dd * p0_e6 div 1000000)
              |END AS excess_ratio_e6""".stripMargin)
      },
      Some {
        val p0 = Sketches.pow2NegE6Sql("y")
        s"""WITH cells AS (
           |  SELECT user_id AS u, epoch_us(ts) // 86400000000 AS day
           |  FROM events),
           |m AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS uu,
           |             CAST(count(DISTINCT day) AS BIGINT) AS dd,
           |             CAST(count(*) AS BIGINT) AS tot
           |      FROM cells),
           |nz AS (SELECT CAST(count(*) AS BIGINT) AS nonzero
           |       FROM (SELECT DISTINCT u, day FROM cells)),
           |b AS (SELECT uu, dd, tot, nonzero,
           |        CAST(CAST(uu AS HUGEINT) * dd - nonzero AS BIGINT)
           |          AS zeros_obs,
           |        CAST(CAST(tot AS HUGEINT) * 1000000
           |          // (CAST(uu AS HUGEINT) * dd) AS BIGINT) AS lambda_e6
           |      FROM m CROSS JOIN nz),
           |c AS (SELECT *, CAST(CAST(lambda_e6 AS HUGEINT) * 1442695
           |        // 1000000 AS BIGINT) AS y FROM b),
           |e AS (SELECT uu, dd, zeros_obs, lambda_e6,
           |        CAST(CAST(uu AS HUGEINT) * dd * $p0 // 1000000 AS BIGINT)
           |          AS zeros_expected
           |      FROM c)
           |SELECT uu, dd, zeros_obs, lambda_e6, zeros_expected,
           |       CASE WHEN zeros_expected = 0 THEN NULL
           |       ELSE CAST(CAST(zeros_obs AS HUGEINT) * 1000000
           |         // zeros_expected AS BIGINT)
           |       END AS excess_ratio_e6
           |FROM e""".stripMargin
      }),

    // ── Lin's concordance correlation: billed vs catalog line value.
    QueryDef("q_lins_ccc",
      (s, d) => {
        val m = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .selectExpr(
            "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x",
            """CAST(floor(l_quantity + 0.5) AS BIGINT)
              | * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
              | AS y""".stripMargin)
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum(expr(s"CAST(x AS $dec) * x")).as("qx"),
            sum(expr(s"CAST(y AS $dec) * y")).as("qy"),
            sum(expr(s"CAST(x AS $dec) * y")).as("qxy"))
        m.selectExpr("CAST(n AS BIGINT) AS n",
            s"CAST(n AS $dec) * qx - CAST(sx AS $dec) * sx AS cxx",
            s"CAST(n AS $dec) * qy - CAST(sy AS $dec) * sy AS cyy",
            s"CAST(n AS $dec) * qxy - CAST(sx AS $dec) * sy AS cxy",
            s"CAST(sx - sy AS $dec) * (sx - sy) AS msq")
          .selectExpr("n",
            """CASE WHEN cxx + cyy + msq = 0 THEN NULL
              |ELSE round(CAST('2.0' AS DOUBLE) * CAST(cxy AS DOUBLE)
              |  / CAST(cxx + cyy + msq AS DOUBLE), 6)
              |END AS ccc""".stripMargin,
            """CASE WHEN cxx = 0 OR cyy = 0 THEN NULL
              |ELSE round(CAST(cxy AS DOUBLE)
              |  / sqrt(CAST(cxx AS DOUBLE) * CAST(cyy AS DOUBLE)), 6)
              |END AS pearson_r""".stripMargin)
      },
      Some("""WITH b AS (
             |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |           AS x,
             |         CAST(floor(l_quantity + 0.5) AS BIGINT)
             |           * CAST(floor(p_retailprice * 100 + 0.5)
             |             AS BIGINT) AS y
             |  FROM lineitem JOIN part ON p_partkey = l_partkey),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(x) AS HUGEINT) AS sx,
             |             CAST(sum(y) AS HUGEINT) AS sy,
             |             sum(CAST(x AS HUGEINT) * x) AS qx,
             |             sum(CAST(y AS HUGEINT) * y) AS qy,
             |             sum(CAST(x AS HUGEINT) * y) AS qxy
             |      FROM b),
             |c AS (SELECT n,
             |        CAST(n AS HUGEINT) * qx - sx * sx AS cxx,
             |        CAST(n AS HUGEINT) * qy - sy * sy AS cyy,
             |        CAST(n AS HUGEINT) * qxy - sx * sy AS cxy,
             |        (sx - sy) * (sx - sy) AS msq
             |      FROM m)
             |SELECT n,
             |       CASE WHEN cxx + cyy + msq = 0 THEN NULL
             |       ELSE round(CAST('2.0' AS DOUBLE) * CAST(cxy AS DOUBLE)
             |         / CAST(cxx + cyy + msq AS DOUBLE), 6)
             |       END AS ccc,
             |       CASE WHEN cxx = 0 OR cyy = 0 THEN NULL
             |       ELSE round(CAST(cxy AS DOUBLE)
             |         / sqrt(CAST(cxx AS DOUBLE) * CAST(cyy AS DOUBLE)),
             |         6) END AS pearson_r
             |FROM c""".stripMargin)),

    // ── Bland–Altman limits of agreement + outside share.
    QueryDef("q_bland_altman",
      (s, d) => {
        val diffs = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .selectExpr(
            """CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
              | - CAST(floor(l_quantity + 0.5) AS BIGINT)
              |   * CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
              | AS dd""".stripMargin)
          .localCheckpoint(false) // moments + outside count
        val lim = diffs.agg(count(lit(1)).as("n"), sum(col("dd")).as("sd"),
            sum(expr(s"CAST(dd AS $dec) * dd")).as("qd"))
          .selectExpr("n", "sd div n AS md_cents",
            s"""CAST(round(CAST('1.96' AS DOUBLE)
               | * sqrt(CAST(CAST(n AS $dec) * qd
               |     - CAST(sd AS $dec) * sd AS DOUBLE))
               | / CAST(n AS DOUBLE)) AS BIGINT) AS w_cents"""
              .stripMargin)
        diffs.crossJoin(broadcast(lim))
          .agg(max(col("n")).as("n"), max(col("md_cents")).as("md_cents"),
            max(col("w_cents")).as("w_cents"),
            sum(expr("CASE WHEN dd < md_cents - w_cents" +
              " OR dd > md_cents + w_cents THEN 1L ELSE 0L END"))
              .as("outside"))
          .selectExpr("n", "md_cents",
            "md_cents - w_cents AS loa_lo_cents",
            "md_cents + w_cents AS loa_hi_cents", "outside",
            "outside * 1000000 div n AS outside_e6")
      },
      Some("""WITH diffs AS (
             |  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |           - CAST(floor(l_quantity + 0.5) AS BIGINT)
             |             * CAST(floor(p_retailprice * 100 + 0.5)
             |               AS BIGINT) AS dd
             |  FROM lineitem JOIN part ON p_partkey = l_partkey),
             |lim AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |          CAST(sum(dd) AS BIGINT) // CAST(count(*)
             |            AS BIGINT) AS md_cents,
             |          CAST(round(CAST('1.96' AS DOUBLE)
             |            * sqrt(CAST(CAST(count(*) AS HUGEINT)
             |                * sum(CAST(dd AS HUGEINT) * dd)
             |              - CAST(sum(dd) AS HUGEINT) * sum(dd)
             |              AS DOUBLE))
             |            / CAST(count(*) AS DOUBLE)) AS BIGINT)
             |            AS w_cents
             |        FROM diffs)
             |SELECT n, md_cents,
             |       md_cents - w_cents AS loa_lo_cents,
             |       md_cents + w_cents AS loa_hi_cents,
             |       CAST(sum(CASE WHEN dd < md_cents - w_cents
             |                  OR dd > md_cents + w_cents THEN 1
             |                ELSE 0 END) AS BIGINT) AS outside,
             |       CAST(sum(CASE WHEN dd < md_cents - w_cents
             |                  OR dd > md_cents + w_cents THEN 1
             |                ELSE 0 END) AS BIGINT) * 1000000 // n
             |         AS outside_e6
             |FROM diffs CROSS JOIN lim
             |GROUP BY n, md_cents, w_cents""".stripMargin))
  )
}
