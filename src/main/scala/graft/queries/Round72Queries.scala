package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-72 batch, LLM-corpus curation: tokenizer fertility (subword-
  * per-word ratio by language — the tokenization-cost lens on
  * q_text_tokens), perplexity filtering (drop the top-decile bigram-NLL
  * docs, rate by source — the LM-quality gate next to q_text_quality),
  * and greedy k-center coreset selection over embeddings (max-min
  * distance seeds — the diversity-coverage pick q_mmr_diversify makes
  * per-query, done corpus-wide).
  */
object Round72Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Fertility: Σ regex-subwords / Σ whitespace-words per language.
    QueryDef("q_tokenizer_fertility",
      (s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws_tokens")).as("ws_tokens"),
          sum(col("re_tokens")).as("re_tokens"))
        .withColumn("fertility_e6",
          expr("re_tokens * 1000000 div greatest(ws_tokens, 1)")),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(len(string_split(text, ' '))) AS BIGINT)
             |         AS ws_tokens,
             |       CAST(sum(len(regexp_extract_all(text,
             |         '[a-z]+|[0-9]+|[^ ]'))) AS BIGINT) AS re_tokens,
             |       CAST(sum(len(regexp_extract_all(text,
             |         '[a-z]+|[0-9]+|[^ ]'))) AS BIGINT) * 1000000
             |         // greatest(CAST(sum(len(string_split(text, ' ')))
             |                    AS BIGINT), 1) AS fertility_e6
             |FROM documents GROUP BY 1""".stripMargin)),

    // ── Perplexity gate: flag docs above the 90th-percentile bigram
    //    NLL (positional ceil index), report the drop rate per source.
    QueryDef("q_perplexity_filter",
      (s, d) => {
        val nll = TextAnalysis.bigramNll(
            Tables.documents(s, d).select(col("doc_id"), col("text")))
          .localCheckpoint(false) // reused: threshold + rollup
        // Percentile THRESHOLD via the distinct-score axis (group → cum
        // counts → select the value at position ⌈0.9n⌉): the selected
        // VALUE is identical to the positional pick regardless of
        // tie-break, and the window runs over score cells, never docs.
        val cells = nll.groupBy(col("avg_nll_e6"))
          .agg(count(lit(1)).as("c"))
        val thr = cells
          .withColumn("cum", sum(col("c")).over(
            Window.orderBy(col("avg_nll_e6"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("n", sum(col("c")).over(
            Window.partitionBy(lit(1))))
          .where(col("cum") >= expr("(9 * n + 9) div 10") &&
            col("cum") - col("c") < expr("(9 * n + 9) div 10"))
          .select(col("avg_nll_e6").as("thr"))
        nll.join(Tables.documents(s, d)
            .select(col("doc_id"), col("source")), "doc_id")
          .crossJoin(broadcast(thr))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("avg_nll_e6") > col("thr"), 1L).otherwise(0L))
              .as("n_flagged"),
            max(col("thr")).as("thr_e6"))
          .withColumn("flag_rate_e6",
            expr("n_flagged * 1000000 div n_docs"))
      },
      Some {
        val nll = graft.ops.Bm25.log2E6Sql("c1.c1 + vv.v") + " - " +
          graft.ops.Bm25.log2E6Sql("c12.c12 + 1")
        s"""WITH t AS MATERIALIZED (
           |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |bg AS (SELECT doc_id,
           |              unnest(list_transform(generate_series(1, len(ws) - 1),
           |                i -> struct_pack(w1 := ws[i], w2 := ws[i + 1])))
           |                AS b
           |       FROM t WHERE len(ws) >= 2),
           |pair AS MATERIALIZED (SELECT doc_id, b.w1 AS w1, b.w2 AS w2
           |                      FROM bg),
           |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
           |        FROM pair GROUP BY 1, 2),
           |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
           |       FROM pair GROUP BY 1),
           |vv AS (SELECT CAST(count(DISTINCT wd) AS BIGINT) AS v
           |       FROM (SELECT unnest(ws) AS wd FROM t)),
           |sc AS (SELECT p.doc_id, $nll AS nll_e6
           |       FROM pair p JOIN c12 ON c12.w1 = p.w1 AND c12.w2 = p.w2
           |                   JOIN c1 ON c1.w1 = p.w1 CROSS JOIN vv),
           |docnll AS (SELECT doc_id,
           |                  CAST(sum(nll_e6) // count(*) AS BIGINT)
           |                    AS avg_nll_e6
           |           FROM sc GROUP BY 1),
           |thr AS (SELECT avg_nll_e6 AS thr FROM (
           |          SELECT avg_nll_e6, doc_id,
           |                 row_number() OVER (ORDER BY avg_nll_e6, doc_id)
           |                   AS rn,
           |                 count(*) OVER () AS n
           |          FROM docnll)
           |        WHERE rn = (9 * n + 9) // 10)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(CASE WHEN avg_nll_e6 > thr THEN 1 ELSE 0 END)
           |         AS BIGINT) AS n_flagged,
           |       CAST(max(thr) AS BIGINT) AS thr_e6,
           |       CAST(sum(CASE WHEN avg_nll_e6 > thr THEN 1 ELSE 0 END)
           |         AS BIGINT) * 1000000 // count(*) AS flag_rate_e6
           |FROM docnll JOIN documents USING (doc_id) CROSS JOIN thr
           |GROUP BY 1""".stripMargin
      }),

    // ── Greedy k-center: 4 max-min-distance seeds over the e6-int
    //    embedding metric; each round is one broadcast join + argmax.
    QueryDef("q_kcenter_coreset",
      (s, d) => {
        val pts = Tables.embeddings(s, d).select(
            col("vec_id").cast("long").as("vec_id"),
            expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
              "x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))").as("qv"))
          .localCheckpoint(false) // rescanned once per greedy round
        val seed0 = pts.agg(min(col("vec_id")).as("vec_id"))
          .join(pts, "vec_id")
          .select(lit(1L).as("step"), col("vec_id"), col("qv"),
            lit(0L).as("d2"))
        var centers: DataFrame = seed0.localCheckpoint(false)
        for (step <- 2 to 4) {
          val cand = pts.crossJoin(broadcast(
              centers.select(col("qv").as("cv"))))
            .select(col("vec_id"), col("qv"),
              expr("""aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)),
                     |0L, (acc, v) -> acc + v)""".stripMargin).as("dd"))
            .groupBy(col("vec_id")).agg(min(col("dd")).as("mind"),
              first(col("qv")).as("qv"))
          val pick = cand
            .withColumn("rk", row_number().over(
              Window.orderBy(col("mind").desc, col("vec_id"))))
            .where(col("rk") === 1)
            .select(lit(step.toLong).as("step"), col("vec_id"), col("qv"),
              col("mind").as("d2"))
          centers = centers.unionByName(pick).localCheckpoint(false)
        }
        centers.select(col("step"), col("vec_id"), col("d2").as("d2_e12"))
      },
      Some {
        def d2(a: String, b: String) =
          s"""CAST(list_sum(list_transform(generate_series(1, len($a)),
             |  i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"""
            .stripMargin
        def round(k: Int) =
          s"""cand$k AS (SELECT p.vec_id, p.qv,
             |                  min(${d2("p.qv", "c.qv")}) AS mind
             |           FROM pts p CROSS JOIN cent${k - 1} c
             |           GROUP BY 1, 2),
             |pick$k AS (SELECT CAST($k AS BIGINT) AS step, vec_id, qv,
             |                  mind AS d2
             |           FROM (SELECT *, row_number() OVER
             |                   (ORDER BY mind DESC, vec_id) AS rk
             |                 FROM cand$k)
             |           WHERE rk = 1),
             |cent$k AS (SELECT * FROM cent${k - 1}
             |           UNION ALL SELECT step, vec_id, qv, d2 FROM pick$k)"""
            .stripMargin
        s"""WITH pts AS MATERIALIZED (
           |  SELECT CAST(vec_id AS BIGINT) AS vec_id,
           |         list_transform(CAST(embedding AS DOUBLE[]),
           |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
           |  FROM embeddings),
           |cent1 AS (SELECT CAST(1 AS BIGINT) AS step, vec_id, qv,
           |                 CAST(0 AS BIGINT) AS d2
           |          FROM pts WHERE vec_id = (SELECT min(vec_id) FROM pts)),
           |${round(2)},
           |${round(3)},
           |${round(4)}
           |SELECT step, vec_id, d2 AS d2_e12 FROM cent4""".stripMargin
      })
  )
}
