package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-171 batch — uplift evaluation, two-part demand modelling, and
  * an imputation audit:
  *
  *  - Qini curve (`q_qini_uplift`): cumulative incremental conversions
  *    Y_t − Y_c·N_t/N_c by descending acctbal score band — the uplift
  *    companion to q_lift_gains (which ranks a RESPONSE model; Qini
  *    ranks a TREATMENT-EFFECT claim). Score bands are fixed-width
  *    acctbal buckets (exact-decile ranks would need an unpartitioned
  *    window over raw orders — a scale-killer this engine bans); the
  *    cumulative window runs on the bounded band axis post-aggregate.
  *  - Two-part model (`q_two_part_spend`): per segment, participation
  *    (any-order rate over ALL customers — the left join keeps the
  *    zeros q_share_of_wallet drops) × intensity (mean spend among
  *    buyers) = expected spend, plus the midpoint (Bennet/Oaxaca-style)
  *    decomposition of the BUILDING−MACHINERY gap into participation
  *    and intensity contributions. All e6/cents integers.
  *  - MICE step (`q_mice_step`): one regression-imputation round —
  *    deterministically mask acctbal on custkey%11=0, fit per-segment
  *    OLS acctbal~spend on the observed rows (exact integer moments,
  *    6dp coefficients), impute the masked rows, and score RMSE /
  *    bias against the held-back truth. The audit every imputation
  *    pipeline needs before it trusts the fill. Sums of squared errors
  *    stay integer (cents²); one sqrt at close.
  */
object Round171Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Qini: cumulative uplift by descending score band.
    QueryDef("q_qini_uplift",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"),
              expr("(CAST(floor(c_acctbal) AS BIGINT) + 1000) div 1500")
                .as("band"))),
            col("o_custkey") === col("c_custkey"))
          .selectExpr("band",
            "CASE WHEN o_orderpriority = '1-URGENT' THEN 1L ELSE 0L END" +
              " AS g",
            "CASE WHEN o_orderstatus = 'F' THEN 1L ELSE 0L END AS y")
        val perBand = base.groupBy(col("band"))
          .agg(sum(col("g")).as("nt"),
            sum(lit(1L) - col("g")).as("nc"),
            sum(expr("g * y")).as("yt"),
            sum(expr("(1 - g) * y")).as("yc"))
        val w = Window.orderBy(col("band").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perBand
          .withColumn("cnt", sum(col("nt")).over(w))
          .withColumn("cnc", sum(col("nc")).over(w))
          .withColumn("cyt", sum(col("yt")).over(w))
          .withColumn("cyc", sum(col("yc")).over(w))
          .selectExpr("band", "nt", "nc",
            "yt * 1000000 div greatest(1L, nt) AS rate_t_e6",
            "yc * 1000000 div greatest(1L, nc) AS rate_c_e6",
            """CASE WHEN cnc = 0 THEN NULL
              |ELSE round(CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE)
              | * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE), 6)
              |END AS qini_cum""".stripMargin)
      },
      Some("""WITH base AS (
             |  SELECT (CAST(floor(c_acctbal) AS BIGINT) + 1000) // 1500
             |           AS band,
             |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1
             |              ELSE 0 END AS g,
             |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
             |           AS y
             |  FROM orders JOIN customer ON c_custkey = o_custkey),
             |pb AS (SELECT band, CAST(sum(g) AS BIGINT) AS nt,
             |              CAST(sum(1 - g) AS BIGINT) AS nc,
             |              CAST(sum(g * y) AS BIGINT) AS yt,
             |              CAST(sum((1 - g) * y) AS BIGINT) AS yc
             |       FROM base GROUP BY 1),
             |c AS (SELECT band, nt, nc, yt, yc,
             |        CAST(sum(nt) OVER w AS BIGINT) AS cnt,
             |        CAST(sum(nc) OVER w AS BIGINT) AS cnc,
             |        CAST(sum(yt) OVER w AS BIGINT) AS cyt,
             |        CAST(sum(yc) OVER w AS BIGINT) AS cyc
             |      FROM pb WINDOW w AS (ORDER BY band DESC
             |        ROWS UNBOUNDED PRECEDING))
             |SELECT band, nt, nc,
             |       yt * 1000000 // greatest(1, nt) AS rate_t_e6,
             |       yc * 1000000 // greatest(1, nc) AS rate_c_e6,
             |       CASE WHEN cnc = 0 THEN NULL
             |       ELSE round(CAST(cyt AS DOUBLE) - CAST(cyc AS DOUBLE)
             |         * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE), 6)
             |       END AS qini_cum
             |FROM c""".stripMargin)),

    // ── Two-part model with midpoint gap decomposition.
    QueryDef("q_two_part_spend",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("sp"))
        val seg = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .selectExpr("seg", "coalesce(sp, 0L) AS sp")
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n_cust"),
            sum(expr("CASE WHEN sp > 0 THEN 1L ELSE 0L END"))
              .as("n_active"),
            sum(col("sp")).as("tot"))
          .selectExpr("seg", "n_cust", "n_active",
            "n_active * 1000000 div n_cust AS part_e6",
            "tot div greatest(1L, n_active) AS intensity_cents",
            "tot div n_cust AS expected_cents")
          .localCheckpoint(false) // per-seg rows + decomposition row
        val b = seg.where(col("seg") === "BUILDING")
          .selectExpr("part_e6 AS p1", "intensity_cents AS i1")
        val m = seg.where(col("seg") === "MACHINERY")
          .selectExpr("part_e6 AS p2", "intensity_cents AS i2")
        val decomp = b.crossJoin(m)
          .selectExpr("'BUILDING-MACHINERY' AS seg",
            "CAST(NULL AS BIGINT) AS n_cust",
            "CAST(NULL AS BIGINT) AS n_active",
            "p1 - p2 AS part_e6",
            "i1 - i2 AS intensity_cents",
            // midpoint decomposition: Δpart·ī + p̄·Δint (cents)
            s"""(CAST(p1 - p2 AS $dec) * (i1 + i2) div 2
               | + CAST(p1 + p2 AS $dec) * (i1 - i2) div 2)
               | div 1000000 AS expected_cents""".stripMargin)
          .selectExpr("seg", "n_cust", "n_active", "part_e6",
            "intensity_cents", "CAST(expected_cents AS BIGINT)" +
              " AS expected_cents")
        seg.unionByName(decomp)
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS sp
             |  FROM orders GROUP BY 1),
             |segs AS (SELECT c_mktsegment AS seg,
             |                coalesce(sp, 0) AS sp
             |         FROM customer
             |         LEFT JOIN spend ON o_custkey = c_custkey),
             |agg AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_cust,
             |          CAST(sum(CASE WHEN sp > 0 THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_active,
             |          CAST(sum(sp) AS BIGINT) AS tot
             |        FROM segs GROUP BY 1),
             |per AS (SELECT seg, n_cust, n_active,
             |          n_active * 1000000 // n_cust AS part_e6,
             |          tot // greatest(1, n_active) AS intensity_cents,
             |          tot // n_cust AS expected_cents
             |        FROM agg),
             |d AS (SELECT 'BUILDING-MACHINERY' AS seg,
             |        CAST(NULL AS BIGINT) AS n_cust,
             |        CAST(NULL AS BIGINT) AS n_active,
             |        b.part_e6 - m.part_e6 AS part_e6,
             |        b.intensity_cents - m.intensity_cents
             |          AS intensity_cents,
             |        CAST((CAST(b.part_e6 - m.part_e6 AS HUGEINT)
             |            * (b.intensity_cents + m.intensity_cents) // 2
             |          + CAST(b.part_e6 + m.part_e6 AS HUGEINT)
             |            * (b.intensity_cents - m.intensity_cents) // 2)
             |          // 1000000 AS BIGINT) AS expected_cents
             |      FROM (SELECT * FROM per WHERE seg = 'BUILDING') b
             |      CROSS JOIN (SELECT * FROM per
             |                  WHERE seg = 'MACHINERY') m)
             |SELECT * FROM per
             |UNION ALL
             |SELECT * FROM d""".stripMargin)),

    // ── One regression-imputation round + held-out audit.
    QueryDef("q_mice_step",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("sp"))
        val base = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"),
            floor(col("c_acctbal") * 100 + 0.5).cast("long").as("bal"))
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .selectExpr("c_custkey", "seg", "bal",
            "coalesce(sp, 0L) AS sp",
            "CASE WHEN c_custkey % 11 = 0 THEN 1L ELSE 0L END AS miss")
          .localCheckpoint(false) // fit on observed + score on masked
        val fit = base.where(col("miss") === 0)
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"), sum(col("sp")).as("sx"),
            sum(col("bal")).as("sy"),
            sum(expr(s"CAST(sp AS $dec) * sp")).as("sxx"),
            sum(expr(s"CAST(sp AS $dec) * bal")).as("sxy"))
          .selectExpr("seg",
            s"""CASE WHEN CAST(n AS $dec) * sxx
               | - CAST(sx AS $dec) * sx = 0 THEN CAST(0.0 AS DOUBLE)
               |ELSE round(CAST(CAST(n AS $dec) * sxy
               |    - CAST(sx AS $dec) * sy AS DOUBLE)
               |  / CAST(CAST(n AS $dec) * sxx
               |    - CAST(sx AS $dec) * sx AS DOUBLE), 6)
               |END AS b1""".stripMargin, "n", "sx", "sy")
          .selectExpr("seg", "b1",
            """round((CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE))
              | / CAST(n AS DOUBLE), 6) AS b0""".stripMargin)
        base.where(col("miss") === 1)
          .join(broadcast(fit), "seg")
          .selectExpr("bal",
            "CAST(round(b0 + b1 * CAST(sp AS DOUBLE)) AS BIGINT)" +
              " AS imp")
          .agg(count(lit(1)).as("n_masked"),
            sum(col("bal")).as("true_sum"), sum(col("imp")).as("imp_sum"),
            sum(expr(s"CAST(imp - bal AS $dec) * (imp - bal)"))
              .as("sse"))
          .selectExpr("n_masked",
            "(imp_sum - true_sum) div n_masked AS bias_cents",
            """round(sqrt(CAST(sse AS DOUBLE)
              | / CAST(n_masked AS DOUBLE))
              | / CAST('100.0' AS DOUBLE), 6) AS rmse_usd"""
              .stripMargin)
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey,
             |         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS sp
             |  FROM orders GROUP BY 1),
             |base AS (SELECT c_custkey, c_mktsegment AS seg,
             |           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
             |             AS bal,
             |           coalesce(sp, 0) AS sp,
             |           CASE WHEN c_custkey % 11 = 0 THEN 1 ELSE 0 END
             |             AS miss
             |         FROM customer
             |         LEFT JOIN spend ON o_custkey = c_custkey),
             |m AS (SELECT seg, CAST(count(*) AS BIGINT) AS n,
             |             CAST(sum(sp) AS BIGINT) AS sx,
             |             CAST(sum(bal) AS BIGINT) AS sy,
             |             sum(CAST(sp AS HUGEINT) * sp) AS sxx,
             |             sum(CAST(sp AS HUGEINT) * bal) AS sxy
             |      FROM base WHERE miss = 0 GROUP BY 1),
             |f1 AS (SELECT seg,
             |         CASE WHEN CAST(n AS HUGEINT) * sxx
             |             - CAST(sx AS HUGEINT) * sx = 0
             |           THEN CAST(0.0 AS DOUBLE)
             |         ELSE round(CAST(CAST(n AS HUGEINT) * sxy
             |             - CAST(sx AS HUGEINT) * sy AS DOUBLE)
             |           / CAST(CAST(n AS HUGEINT) * sxx
             |             - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6)
             |         END AS b1, n, sx, sy
             |       FROM m),
             |f AS (SELECT seg, b1,
             |        round((CAST(sy AS DOUBLE) - b1 * CAST(sx AS DOUBLE))
             |          / CAST(n AS DOUBLE), 6) AS b0
             |      FROM f1),
             |sc AS (SELECT bal,
             |         CAST(round(b0 + b1 * CAST(sp AS DOUBLE)) AS BIGINT)
             |           AS imp
             |       FROM base JOIN f USING (seg) WHERE miss = 1),
             |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_masked,
             |               CAST(sum(bal) AS BIGINT) AS true_sum,
             |               CAST(sum(imp) AS BIGINT) AS imp_sum,
             |               sum(CAST(imp - bal AS HUGEINT) * (imp - bal))
             |                 AS sse
             |        FROM sc)
             |SELECT n_masked,
             |       (imp_sum - true_sum) // n_masked AS bias_cents,
             |       round(sqrt(CAST(sse AS DOUBLE)
             |         / CAST(n_masked AS DOUBLE))
             |         / CAST('100.0' AS DOUBLE), 6) AS rmse_usd
             |FROM agg""".stripMargin))
  )
}
