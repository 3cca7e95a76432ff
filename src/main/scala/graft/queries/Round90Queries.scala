package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-90 batch, closing the inference suite: mediation analysis
  * (how much of the exposure→spend effect routes through order count —
  * Baron–Kenny with a pooled-within-groups mediator slope), treatment-
  * effect heterogeneity (per-segment effects z-tested against the
  * pooled effect — the CATE readout q_stratified_ate averages away),
  * and the conditional rate-ratio test (two-period event rates via the
  * exact binomial split — the Poisson comparison q_dispersion_index
  * motivates).
  */
object Round90Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Mediation: z = even custkey, mediator x = order count,
    //    outcome y = spend. a = Δx̄; b = pooled-within-z slope y~x;
    //    indirect = a·b, direct = total − indirect.
    QueryDef("q_mediation",
      (s, d) => {
        val ords = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("x"),
            sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
              .as("y"))
        val u = Tables.customer(s, d)
          .join(ords, col("c_custkey") === col("o_custkey"), "left")
          .select((col("c_custkey") % 2 === 0).as("z"),
            coalesce(col("x"), lit(0L)).cast(dec).as("x"),
            coalesce(col("y"), lit(0L)).cast(dec).as("y"))
        u.groupBy(col("z"))
          .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .agg(
            sum(when(col("z"), col("n")).otherwise(lit(0).cast(dec)))
              .as("n1"),
            sum(when(!col("z"), col("n")).otherwise(lit(0).cast(dec)))
              .as("n0"),
            sum(when(col("z"), col("sx")).otherwise(lit(0).cast(dec)))
              .as("sx1"),
            sum(when(!col("z"), col("sx")).otherwise(lit(0).cast(dec)))
              .as("sx0"),
            sum(when(col("z"), col("sy")).otherwise(lit(0).cast(dec)))
              .as("sy1"),
            sum(when(!col("z"), col("sy")).otherwise(lit(0).cast(dec)))
              .as("sy0"),
            // pooled within-z moments: Σ_g (n_g·Sxy_g − Sx_g·Sy_g)/n_g …
            // kept exact by scaling each group term by the OTHER group's n
            sum(expr("n * sxy - sx * sy")).as("cov_num_raw"),
            sum(expr("n * sxx - sx * sx")).as("var_num_raw"))
          .selectExpr(
            "CAST(n1 AS BIGINT) AS n1", "CAST(n0 AS BIGINT) AS n0",
            """round(CAST(sx1 * n0 - sx0 * n1 AS DOUBLE)
              |/ (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
              |AS a_path""".stripMargin,
            """CASE WHEN var_num_raw = 0 THEN NULL
              |     ELSE round(CAST(cov_num_raw AS DOUBLE)
              |          / CAST(var_num_raw AS DOUBLE), 6)
              |END AS b_path""".stripMargin,
            """round(CAST(sy1 * n0 - sy0 * n1 AS DOUBLE)
              |/ (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
              |AS total_effect""".stripMargin)
          .selectExpr("n1", "n0", "a_path", "b_path", "total_effect",
            "round(a_path * b_path, 6) AS indirect",
            "round(total_effect - a_path * b_path, 6) AS direct")
      },
      Some("""WITH ords AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS x,
             |                CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
             |                  AS BIGINT)) AS BIGINT) AS y
             |              FROM orders GROUP BY 1),
             |u AS (SELECT c_custkey % 2 = 0 AS z,
             |             CAST(coalesce(x, 0) AS HUGEINT) AS x,
             |             CAST(coalesce(y, 0) AS HUGEINT) AS y
             |      FROM customer LEFT JOIN ords ON c_custkey = o_custkey),
             |g AS (SELECT z, CAST(count(*) AS HUGEINT) AS n,
             |             sum(x) AS sx, sum(y) AS sy,
             |             sum(x * x) AS sxx, sum(x * y) AS sxy
             |      FROM u GROUP BY 1),
             |m AS (SELECT
             |        sum(CASE WHEN z THEN n ELSE 0 END) AS n1,
             |        sum(CASE WHEN z THEN 0 ELSE n END) AS n0,
             |        sum(CASE WHEN z THEN sx ELSE 0 END) AS sx1,
             |        sum(CASE WHEN z THEN 0 ELSE sx END) AS sx0,
             |        sum(CASE WHEN z THEN sy ELSE 0 END) AS sy1,
             |        sum(CASE WHEN z THEN 0 ELSE sy END) AS sy0,
             |        sum(n * sxy - sx * sy) AS cov_num_raw,
             |        sum(n * sxx - sx * sx) AS var_num_raw
             |      FROM g),
             |e AS (SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT)
             |               AS n0,
             |             round(CAST(sx1 * n0 - sx0 * n1 AS DOUBLE)
             |               / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
             |               AS a_path,
             |             CASE WHEN var_num_raw = 0 THEN NULL
             |                  ELSE round(CAST(cov_num_raw AS DOUBLE)
             |                       / CAST(var_num_raw AS DOUBLE), 6)
             |             END AS b_path,
             |             round(CAST(sy1 * n0 - sy0 * n1 AS DOUBLE)
             |               / (CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)), 6)
             |               AS total_effect
             |      FROM m)
             |SELECT n1, n0, a_path, b_path, total_effect,
             |       round(a_path * b_path, 6) AS indirect,
             |       round(total_effect - a_path * b_path, 6) AS direct
             |FROM e""".stripMargin)),

    // ── Heterogeneity: per-segment effect vs the pooled effect, Welch
    //    z on the difference (exact moments, one double sequence).
    QueryDef("q_treatment_heterogeneity",
      (s, d) => {
        val spend = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("y"))
        val u = Tables.customer(s, d)
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_mktsegment").as("seg"),
            (col("c_custkey") % 3 === 0).as("t"),
            coalesce(col("y"), lit(0L)).cast(dec).as("y"))
          .localCheckpoint(false) // per-seg + pooled moments
        def mom(df: org.apache.spark.sql.DataFrame,
                keys: Seq[String]) = {
          val g = if (keys.isEmpty) df.groupBy() else
            df.groupBy(keys.map(col): _*)
          g.agg(
            sum(when(col("t"), 1L).otherwise(0L)).cast(dec).as("nt"),
            sum(when(!col("t"), 1L).otherwise(0L)).cast(dec).as("nc"),
            sum(when(col("t"), col("y")).otherwise(lit(0).cast(dec)))
              .as("st"),
            sum(when(!col("t"), col("y")).otherwise(lit(0).cast(dec)))
              .as("sc"),
            sum(when(col("t"), col("y") * col("y"))
              .otherwise(lit(0).cast(dec))).as("qt"),
            sum(when(!col("t"), col("y") * col("y"))
              .otherwise(lit(0).cast(dec))).as("qc"))
        }
        val eff =
          """(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
            |- CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))""".stripMargin
        val se2 =
          """(CAST(nt * qt - st * st AS DOUBLE)
            |/ (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
            |   * CAST(nt AS DOUBLE))
            |+ CAST(nc * qc - sc * sc AS DOUBLE)
            |/ (CAST(nc AS DOUBLE) * CAST(nc AS DOUBLE)
            |   * CAST(nc AS DOUBLE)))""".stripMargin
        val segs = mom(u, Seq("seg"))
          .selectExpr("seg", "CAST(nt AS BIGINT) AS n_t",
            "CAST(nc AS BIGINT) AS n_c", s"$eff AS effect0",
            s"$se2 AS se20")
        val pool = mom(u, Seq.empty)
          .selectExpr(s"$eff AS peffect", s"$se2 AS pse2")
        segs.crossJoin(broadcast(pool))
          .selectExpr("seg", "n_t", "n_c",
            "round(effect0, 6) AS effect_cents",
            "round(peffect, 6) AS pooled_cents",
            """round((effect0 - peffect) / sqrt(se20 + pse2), 6)
              |AS z_het""".stripMargin)
      },
      Some {
        val eff =
          """(CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
            |- CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE))""".stripMargin
        val se2 =
          """(CAST(nt * qt - st * st AS DOUBLE)
            |/ (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
            |   * CAST(nt AS DOUBLE))
            |+ CAST(nc * qc - sc * sc AS DOUBLE)
            |/ (CAST(nc AS DOUBLE) * CAST(nc AS DOUBLE)
            |   * CAST(nc AS DOUBLE)))""".stripMargin
        def momSql(grp: String, proj: String) =
          s"""SELECT $proj
             |  CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
             |  CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS HUGEINT) AS nc,
             |  CAST(sum(CASE WHEN t THEN y ELSE 0 END) AS HUGEINT) AS st,
             |  CAST(sum(CASE WHEN t THEN 0 ELSE y END) AS HUGEINT) AS sc,
             |  sum(CASE WHEN t THEN CAST(y AS HUGEINT) * CAST(y AS HUGEINT)
             |      ELSE 0 END) AS qt,
             |  sum(CASE WHEN t THEN 0
             |      ELSE CAST(y AS HUGEINT) * CAST(y AS HUGEINT) END) AS qc
             |FROM u $grp""".stripMargin
        s"""WITH spend AS (SELECT o_custkey,
           |                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
           |                   AS BIGINT)) AS BIGINT) AS y
           |               FROM orders GROUP BY 1),
           |u AS (SELECT c_mktsegment AS seg, c_custkey % 3 = 0 AS t,
           |             coalesce(y, 0) AS y
           |      FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
           |segs AS (SELECT seg, CAST(nt AS BIGINT) AS n_t,
           |                CAST(nc AS BIGINT) AS n_c,
           |                $eff AS effect0, $se2 AS se20
           |         FROM (${momSql("GROUP BY seg", "seg,")}) sm),
           |pool AS (SELECT $eff AS peffect, $se2 AS pse2
           |         FROM (${momSql("", "")}) pm)
           |SELECT seg, n_t, n_c, round(effect0, 6) AS effect_cents,
           |       round(peffect, 6) AS pooled_cents,
           |       round((effect0 - peffect) / sqrt(se20 + pse2), 6)
           |         AS z_het
           |FROM segs CROSS JOIN pool""".stripMargin
      }),

    // ── Rate ratio: first vs second half of the day range per type;
    //    conditional-binomial z with the exposure split as p₀.
    QueryDef("q_rate_ratio_test",
      (s, d) => {
        val days = Tables.events(s, d)
          .select(col("event_type").as("et"),
            expr("unix_micros(ts) div 86400000000").as("day"))
        val mid = days.agg(expr("(min(day) + max(day)) div 2").as("mid"),
          (max(col("day")) - min(col("day")) + 1).as("span"),
          min(col("day")).as("d0"))
        days.crossJoin(broadcast(mid))
          .groupBy(col("et"), col("span"), col("mid"), col("d0"))
          .agg(sum(when(col("day") <= col("mid"), 1L).otherwise(0L))
            .as("c1"),
            sum(when(col("day") > col("mid"), 1L).otherwise(0L)).as("c2"))
          .selectExpr("et", "c1", "c2",
            "mid - d0 + 1 AS t1", "span - (mid - d0 + 1) AS t2")
          .selectExpr("et", "c1", "c2", "t1", "t2",
            """round((CAST(c1 AS DOUBLE) - CAST(c1 + c2 AS DOUBLE)
              |* CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE))
              |/ sqrt(CAST(c1 + c2 AS DOUBLE)
              |       * (CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE))
              |       * (CAST('1.0' AS DOUBLE) - CAST(t1 AS DOUBLE)
              |          / CAST(t1 + t2 AS DOUBLE))), 6) AS z"""
              .stripMargin)
      },
      Some("""WITH days AS (SELECT event_type AS et,
             |                    epoch_us(ts) // 86400000000 AS day
             |             FROM events),
             |mid AS (SELECT (min(day) + max(day)) // 2 AS mid,
             |               max(day) - min(day) + 1 AS span,
             |               min(day) AS d0
             |        FROM days),
             |c AS (SELECT et, span, mid, d0,
             |             CAST(sum(CASE WHEN day <= mid THEN 1 ELSE 0 END)
             |               AS BIGINT) AS c1,
             |             CAST(sum(CASE WHEN day > mid THEN 1 ELSE 0 END)
             |               AS BIGINT) AS c2
             |      FROM days CROSS JOIN mid GROUP BY 1, 2, 3, 4),
             |e AS (SELECT et, c1, c2, mid - d0 + 1 AS t1,
             |             span - (mid - d0 + 1) AS t2
             |      FROM c)
             |SELECT et, c1, c2, t1, t2,
             |       round((CAST(c1 AS DOUBLE) - CAST(c1 + c2 AS DOUBLE)
             |         * CAST(t1 AS DOUBLE) / CAST(t1 + t2 AS DOUBLE))
             |         / sqrt(CAST(c1 + c2 AS DOUBLE)
             |                * (CAST(t1 AS DOUBLE)
             |                   / CAST(t1 + t2 AS DOUBLE))
             |                * (CAST('1.0' AS DOUBLE)
             |                   - CAST(t1 AS DOUBLE)
             |                     / CAST(t1 + t2 AS DOUBLE))), 6) AS z
             |FROM e""".stripMargin))
  )
}
