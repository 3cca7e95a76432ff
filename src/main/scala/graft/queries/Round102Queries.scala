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
          .localCheckpoint(false) // margins + diagonal reuse the cells
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
      })
  )
}
