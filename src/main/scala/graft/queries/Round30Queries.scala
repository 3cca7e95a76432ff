package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Curation, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-30 batch: LLM-ingestion prep ops — sliding-window chunking and
  * a hashed-feature linear scorer — both integer/digest-exact with
  * DuckDB oracle twins.
  */
object Round30Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Sliding 40-token chunks every 30 tokens (overlap 10), digest
    //    per chunk; trailing partials kept.
    QueryDef("q_chunk_documents",
      (s, d) => Curation.chunk(
        Tables.documents(s, d).select(col("doc_id"), col("text")), 40, 30),
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             |c AS (
             |  SELECT doc_id, ws, len(ws) AS n,
             |         unnest(generate_series(0, (len(ws) - 1) // 30))
             |           AS chunk_id
             |  FROM t)
             |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
             |       CAST(least(40, n - (chunk_id * 30 + 1) + 1) AS BIGINT)
             |         AS n_tok,
             |       md5(array_to_string(
             |         list_slice(ws, chunk_id * 30 + 1,
             |                    least(chunk_id * 30 + 40, n)), ' '))
             |         AS chunk_md5
             |FROM c WHERE n - chunk_id * 30 > 0""".stripMargin)),

    // ── Hashed linear model margins, top-20 docs (fastText-gate shape).
    QueryDef("q_linear_score",
      (s, d) => TextAnalysis.linearScore(
        Tables.documents(s, d).select(col("doc_id"), col("text")), 256, 20),
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
              |  FROM documents),
              |f AS (
              |  SELECT doc_id,
              |         ${PortableSql.hash48("token", "'fh'")} % 256 AS dim
              |  FROM tok WHERE token <> ''),
              |w AS (
              |  SELECT doc_id,
              |         ${PortableSql.hash48(
                          "CAST(dim AS VARCHAR)", "'lw'")} % 2001 - 1000
              |           AS wt
              |  FROM f)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
              |       CAST(sum(wt) AS BIGINT) AS margin
              |FROM w GROUP BY doc_id
              |ORDER BY margin DESC, doc_id LIMIT 20""".stripMargin))
  )
}
