package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextAnalysis
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-102 batch: paired-proportion and inter-rater agreement tests
  * (McNemar, Cohen's kappa) plus Benjamini–Hochberg FDR control — the
  * multiple-testing correction layer the per-group test queries feed.
  */
object Round102Queries {

  private def inList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  def defs: Seq[QueryDef] = Seq(

    // ── McNemar: paired binary outcomes per user (ever clicked vs ever
    //    purchased). Only the DISCORDANT cells b (click-only) and c
    //    (purchase-only) carry information; χ² = (b−c)²/(b+c)
    //    (uncorrected form; both engines share it). All-integer:
    //    (b−c)² ≥ 0 so the truncating division is engine-identical.
    QueryDef("q_mcnemar",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
        .agg(sum(expr("CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END")).as("b"),
          sum(expr("CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END")).as("c"))
        .selectExpr("CAST(b AS BIGINT) AS b", "CAST(c AS BIGINT) AS c",
          "(b - c) * (b - c) * 1000000 div greatest(b + c, 1) AS chi2_e6"),
      Some("""WITH u AS (SELECT user_id,
             |                  max(CASE WHEN event_type = 'click'
             |                      THEN 1 ELSE 0 END) AS x,
             |                  max(CASE WHEN event_type = 'purchase'
             |                      THEN 1 ELSE 0 END) AS y
             |           FROM events GROUP BY 1)
             |SELECT CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS b,
             |       CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS c,
             |       CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
             |          - sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT)
             |       * CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
             |            - sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) * 1000000
             |       // greatest(CAST(sum(CASE WHEN x <> y THEN 1 ELSE 0 END)
             |            AS BIGINT), 1) AS chi2_e6
             |FROM u""".stripMargin)),

    // ── Cohen's kappa between the DECLARED lang label and the langId
    //    heuristic's prediction — the chance-corrected summary of
    //    q_text_langid's confusion matrix (accuracy alone flatters a
    //    skewed label mix). κ = (po−pe)/(1−pe) in N²-scaled integers:
    //    num = diag·N − Σ row·col may be NEGATIVE (worse-than-chance),
    //    so the truncating division is sign-factored per the repo
    //    convention (SURVEY.md:152).
    QueryDef("q_cohen_kappa",
      (s, d) => {
        val cells = TextAnalysis.langId(Tables.documents(s, d))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true) // margins + diagonal reuse the cells
        val margins = cells.groupBy(col("lang")).agg(sum(col("cnt")).as("rw"))
          .join(cells.groupBy(col("pred_lang")).agg(sum(col("cnt")).as("cl")),
            col("lang") === col("pred_lang"), "full")
          .select(coalesce(col("lang"), col("pred_lang")).as("l"),
            coalesce(col("rw"), lit(0L)).as("rw"),
            coalesce(col("cl"), lit(0L)).as("cl"))
        val stats = cells.agg(sum(col("cnt")).as("n"),
            sum(when(col("lang") === col("pred_lang"), col("cnt"))
              .otherwise(0L)).as("diag"))
          .crossJoin(broadcast(
            margins.agg(sum(expr("rw * cl")).as("rc"))))
        stats.selectExpr("CAST(n AS BIGINT) AS n",
          "CAST(diag AS BIGINT) AS n_agree",
          "diag * n * 1000000 div (n * n) AS po_e6",
          "rc * 1000000 div (n * n) AS pe_e6",
          // greatest guard: pe=1 (single-cell confusion) must not
          // divide by zero (Spark nulls, DuckDB errors — divergent)
          """CASE WHEN diag * n >= rc
            |  THEN (diag * n - rc) * 1000000 div greatest(n * n - rc, 1)
            |  ELSE -((rc - diag * n) * 1000000 div greatest(n * n - rc, 1))
            |END AS kappa_e6""".stripMargin)
      },
      Some {
        val en = TextAnalysis.stopwords.toMap.apply("en")
        val es = TextAnalysis.stopwords.toMap.apply("es")
        val de = TextAnalysis.stopwords.toMap.apply("de")
        s"""WITH h AS (SELECT lang,
           |   CAST(len(list_filter(ws, w -> list_contains(${inList(en)}, w))) AS BIGINT) AS hits_en,
           |   CAST(len(list_filter(ws, w -> list_contains(${inList(es)}, w))) AS BIGINT) AS hits_es,
           |   CAST(len(list_filter(ws, w -> list_contains(${inList(de)}, w))) AS BIGINT) AS hits_de
           |   FROM (SELECT lang, string_split(text, ' ') AS ws
           |         FROM documents) t),
           |p AS (SELECT lang,
           |             CASE WHEN hits_en + hits_es + hits_de = 0 THEN 'unknown'
           |                  WHEN hits_en >= hits_es AND hits_en >= hits_de THEN 'en'
           |                  WHEN hits_es >= hits_de THEN 'es'
           |                  ELSE 'de' END AS pred_lang
           |      FROM h),
           |cells AS (SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS cnt
           |          FROM p GROUP BY 1, 2),
           |rm AS (SELECT lang AS l, CAST(sum(cnt) AS BIGINT) AS rw
           |       FROM cells GROUP BY 1),
           |cm AS (SELECT pred_lang AS l, CAST(sum(cnt) AS BIGINT) AS cl
           |       FROM cells GROUP BY 1),
           |mg AS (SELECT CAST(sum(coalesce(rw, 0) * coalesce(cl, 0)) AS BIGINT)
           |                AS rc
           |       FROM rm FULL JOIN cm USING (l)),
           |st AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
           |              CAST(sum(CASE WHEN lang = pred_lang THEN cnt
           |                       ELSE 0 END) AS BIGINT) AS diag
           |       FROM cells)
           |SELECT n, diag AS n_agree,
           |       diag * n * 1000000 // (n * n) AS po_e6,
           |       rc * 1000000 // (n * n) AS pe_e6,
           |       CASE WHEN diag * n >= rc
           |         THEN (diag * n - rc) * 1000000 // greatest(n * n - rc, 1)
           |         ELSE -((rc - diag * n) * 1000000 // greatest(n * n - rc, 1))
           |       END AS kappa_e6
           |FROM st CROSS JOIN mg""".stripMargin
      }),

    // ── Benjamini–Hochberg FDR across the 25 per-nation tests of
    //    "share of finished orders ≠ global share": z² in e6 from exact
    //    counts, pseudo-p by the distribution-free Chebyshev bound
    //    p ≤ 1/z² (log/erf-free → portable), then the BH step-up rule
    //    p(k) ≤ α·k/m at α = 0.05. Everything after the per-nation
    //    rollup rides a 25-row axis.
    QueryDef("q_bh_fdr",
      (s, d) => {
        val joined = Tables.orders(s, d)
          .join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("f"))
          .localCheckpoint(true) // nation cells + the global rollup
        val g = joined.agg(sum(col("n")).as("tn"), sum(col("f")).as("tf"),
          count(lit(1)).as("m"))
        val z = joined.crossJoin(broadcast(g))
          // z² = n·(p̂−p0)²/(p0(1−p0)) in e6: exact integer numerators,
          // non-negative throughout → truncation engine-identical
          .withColumn("p_hat_e6", expr("f * 1000000 div n"))
          .withColumn("p0_e6", expr("tf * 1000000 div tn"))
          .withColumn("z2_e6", expr(
            """n * (p_hat_e6 - p0_e6) * (p_hat_e6 - p0_e6)
              | div greatest(p0_e6 * (1000000 - p0_e6) div 1000000, 1)""".stripMargin))
          .withColumn("p_e6",
            expr("least(1000000L, 1000000000000L div greatest(z2_e6, 1))"))
        val ranked = z
          .withColumn("rk", row_number().over(
            Window.orderBy(col("p_e6"), col("n_name"))).cast("long"))
          .withColumn("bh_thresh_e6", expr("rk * 50000 div m"))
          .withColumn("pass", expr("CASE WHEN p_e6 <= bh_thresh_e6 THEN rk ELSE 0 END"))
        ranked
          .withColumn("kmax", max(col("pass")).over(
            Window.orderBy(col("rk")).rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
          .withColumn("rejected",
            expr("CAST(CASE WHEN rk <= kmax THEN 1 ELSE 0 END AS BIGINT)"))
          .select(col("n_name"), col("z2_e6"), col("p_e6"), col("rk"),
            col("bh_thresh_e6"), col("rejected"))
      },
      Some("""WITH cells AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n,
             |                      CAST(sum(CASE WHEN o_orderstatus = 'F'
             |                        THEN 1 ELSE 0 END) AS BIGINT) AS f
             |               FROM orders
             |               JOIN customer ON o_custkey = c_custkey
             |               JOIN nation ON c_nationkey = n_nationkey
             |               GROUP BY 1),
             |g AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
             |             CAST(sum(f) AS BIGINT) AS tf,
             |             CAST(count(*) AS BIGINT) AS m FROM cells),
             |z AS (SELECT n_name, n, f, tn, tf, m,
             |             f * 1000000 // n AS p_hat_e6,
             |             tf * 1000000 // tn AS p0_e6
             |      FROM cells CROSS JOIN g),
             |z2 AS (SELECT n_name, m,
             |              n * (p_hat_e6 - p0_e6) * (p_hat_e6 - p0_e6)
             |                // greatest(p0_e6 * (1000000 - p0_e6) // 1000000, 1)
             |                AS z2_e6
             |       FROM z),
             |p AS (SELECT n_name, m, z2_e6,
             |             least(1000000, 1000000000000 // greatest(z2_e6, 1))
             |               AS p_e6
             |      FROM z2),
             |r AS (SELECT n_name, z2_e6, p_e6,
             |             CAST(row_number() OVER (ORDER BY p_e6, n_name)
             |               AS BIGINT) AS rk,
             |             m
             |      FROM p),
             |t AS (SELECT *, rk * 50000 // m AS bh_thresh_e6,
             |             CASE WHEN p_e6 <= rk * 50000 // m THEN rk
             |                  ELSE 0 END AS pass
             |      FROM r),
             |k AS (SELECT *, max(pass) OVER () AS kmax FROM t)
             |SELECT n_name, z2_e6, p_e6, rk, bh_thresh_e6,
             |       CAST(CASE WHEN rk <= kmax THEN 1 ELSE 0 END AS BIGINT)
             |         AS rejected
             |FROM k""".stripMargin))
  )
}
