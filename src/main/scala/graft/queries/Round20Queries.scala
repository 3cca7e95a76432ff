package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Bm25, Stats, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-20 batch: Welch's unequal-variance t-test, Heaps'-law
  * vocabulary-growth exponent, and skip-gram PMI word association —
  * each with an exact DuckDB oracle twin.
  */
object Round20Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Welch t between click and purchase cents values: exact decimal
    //    moments, deterministic-double epilogue (t + Welch df).
    QueryDef("q_welch_ttest",
      (s, d) => Stats.welchT(
        Tables.events(s, d)
          .filter(col("event_type").isin("click", "purchase"))
          .select(when(col("event_type") === "click", 0L).otherwise(1L).as("s"),
            floor(col("value") * 100 + 0.5).cast("long").as("v")),
        "s", "v"),
      Some("""WITH p AS (
             |  SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS s,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
             |  FROM events WHERE event_type IN ('click', 'purchase')),
             |m AS (SELECT
             |        sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS n1,
             |        sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n2,
             |        sum(CASE WHEN s = 0 THEN v ELSE 0 END) AS s1,
             |        sum(CASE WHEN s = 1 THEN v ELSE 0 END) AS s2,
             |        sum(CASE WHEN s = 0 THEN v * v ELSE 0 END) AS q1,
             |        sum(CASE WHEN s = 1 THEN v * v ELSE 0 END) AS q2
             |      FROM p),
             |vv AS (SELECT n1, n2, s1, s2,
             |         CAST(n1 * q1 - s1 * s1 AS DOUBLE) /
             |           (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)) AS v1,
             |         CAST(n2 * q2 - s2 * s2 AS DOUBLE) /
             |           (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)) AS v2
             |       FROM m),
             |ee AS (SELECT n1, n2, s1, s2, v1, v2,
             |         v1 / CAST(n1 AS DOUBLE) AS e1,
             |         v2 / CAST(n2 AS DOUBLE) AS e2
             |       FROM vv)
             |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             |       CAST(s1 * 1000000 // n1 AS BIGINT) AS mean1_e6,
             |       CAST(s2 * 1000000 // n2 AS BIGINT) AS mean2_e6,
             |       CASE WHEN n1 < 2 OR n2 < 2 OR e1 + e2 = 0 THEN NULL
             |            ELSE round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |                      - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             |                 / sqrt(e1 + e2), 6)
             |       END AS t,
             |       CASE WHEN n1 < 2 OR n2 < 2 OR e1 + e2 = 0 THEN NULL
             |            ELSE round((e1 + e2) * (e1 + e2)
             |                 / (e1 * e1 / CAST(n1 - 1 AS DOUBLE)
             |                  + e2 * e2 / CAST(n2 - 1 AS DOUBLE)), 6)
             |       END AS df_w
             |FROM ee""".stripMargin)),

    // ── Heaps'-law exponent per source: cumulative (tokens, vocab)
    //    walk in doc_id order, LS slope of log₂V on log₂N (exact e6
    //    logs, one double division).
    QueryDef("q_heaps_law",
      (s, d) => TextAnalysis.vocabGrowth(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("text"))),
      Some {
        val lx = Bm25.log2E6Sql("nn")
        val ly = Bm25.log2E6Sql("vv")
        s"""WITH tok AS MATERIALIZED (
           |  SELECT doc_id, source AS src, wd AS word
           |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS wd
           |        FROM documents) u WHERE wd <> ''),
           |perdoc AS (SELECT src, doc_id, count(*) AS toks
           |           FROM tok GROUP BY 1, 2),
           |firsto AS (SELECT src, word, min(doc_id) AS doc_id
           |           FROM tok GROUP BY 1, 2),
           |neww AS (SELECT src, doc_id, count(*) AS nw
           |         FROM firsto GROUP BY 1, 2),
           |walk AS (SELECT p.src, p.doc_id,
           |           CAST(sum(p.toks) OVER (PARTITION BY p.src ORDER BY p.doc_id
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |             AS BIGINT) AS nn,
           |           CAST(sum(coalesce(w.nw, 0)) OVER (PARTITION BY p.src
           |             ORDER BY p.doc_id
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |             AS BIGINT) AS vv
           |         FROM perdoc p LEFT JOIN neww w
           |           ON w.src = p.src AND w.doc_id = p.doc_id),
           |pts AS (SELECT src, CAST($lx AS BIGINT) AS x,
           |               CAST($ly AS BIGINT) AS y FROM walk),
           |m AS (SELECT src, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           |             sum(x * x) AS sxx, sum(x * y) AS sxy
           |      FROM pts GROUP BY src)
           |SELECT src AS source, CAST(n AS BIGINT) AS n_docs,
           |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
           |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) /
           |                 CAST(n * sxx - sx * sx AS DOUBLE), 6)
           |       END AS beta
           |FROM m""".stripMargin
      }),

    // ── Skip-gram PMI: top-20 word associations within a 2-token
    //    window, pair count ≥ 5 — exact e6 fixed-point log₂ PMI.
    QueryDef("q_skipgram_pmi",
      (s, d) => TextAnalysis.skipgramPmi(
        Tables.documents(s, d).select(col("doc_id"), col("text")), 2, 5L, 20),
      Some {
        val pmi = Bm25.log2E6Sql("cab") + " - " + Bm25.log2E6Sql("pp") +
          " - " + Bm25.log2E6Sql("ca") + " - " + Bm25.log2E6Sql("cb") +
          " + 2 * " + Bm25.log2E6Sql("tt")
        s"""WITH t AS MATERIALIZED (
           |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           |pr0 AS (
           |  SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
           |           i -> struct_pack(a := ws[i], b := ws[i + 1]))) AS bb
           |  FROM t WHERE len(ws) >= 2
           |  UNION ALL
           |  SELECT unnest(list_transform(generate_series(1, len(ws) - 2),
           |           i -> struct_pack(a := ws[i], b := ws[i + 2]))) AS bb
           |  FROM t WHERE len(ws) >= 3),
           |pr AS MATERIALIZED (
           |  SELECT least(bb.a, bb.b) AS w1, greatest(bb.a, bb.b) AS w2
           |  FROM pr0 WHERE bb.a <> '' AND bb.b <> ''),
           |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cab
           |       FROM pr GROUP BY 1, 2),
           |uni AS (SELECT wd AS w, CAST(count(*) AS BIGINT) AS cw
           |        FROM (SELECT unnest(ws) AS wd FROM t) u
           |        WHERE wd <> '' GROUP BY 1),
           |j AS (SELECT p.w1, p.w2, p.cab, a.cw AS ca, b.cw AS cb,
           |        (SELECT CAST(sum(cab) AS BIGINT) FROM pc) AS pp,
           |        (SELECT CAST(sum(cw) AS BIGINT) FROM uni) AS tt
           |      FROM pc p JOIN uni a ON a.w = p.w1 JOIN uni b ON b.w = p.w2
           |      WHERE p.cab >= 5)
           |SELECT w1, w2, cab AS pairs, CAST($pmi AS BIGINT) AS pmi_e6
           |FROM j ORDER BY pmi_e6 DESC, w1, w2 LIMIT 20""".stripMargin
      })
  )
}
