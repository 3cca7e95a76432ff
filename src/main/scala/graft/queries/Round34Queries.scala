package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{ClusterEval, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-34 batch: embedding centroid-drift monitoring and
  * uncertainty-sampling batch selection.
  */
object Round34Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Did fold 0's embeddings move vs the rest? Per-label centroid
    //    squared-L2 drift in e12.
    QueryDef("q_centroid_drift",
      (s, d) => ClusterEval.centroidDrift(Tables.embeddings(s, d), 0L),
      Some("""WITH comp AS MATERIALIZED (
             |  SELECT vec_id, CAST(label AS BIGINT) AS label,
             |         CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END AS probe,
             |         unnest(list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)))
             |           AS v,
             |         unnest(range(1, len(embedding) + 1)) AS i
             |  FROM embeddings),
             |p AS (SELECT label, i,
             |        CAST(floor(CAST(sum(v) AS DOUBLE) / count(*))
             |          AS BIGINT) AS cp,
             |        CAST(count(*) AS BIGINT) AS np
             |      FROM comp WHERE probe = 1 GROUP BY 1, 2),
             |r AS (SELECT label, i,
             |        CAST(floor(CAST(sum(v) AS DOUBLE) / count(*))
             |          AS BIGINT) AS cr,
             |        CAST(count(*) AS BIGINT) AS nr
             |      FROM comp WHERE probe = 0 GROUP BY 1, 2)
             |SELECT p.label, max(p.np) AS n_probe, max(r.nr) AS n_ref,
             |       CAST(sum((p.cp - r.cr) * (p.cp - r.cr)) AS BIGINT)
             |         AS drift_d2_e12
             |FROM p JOIN r ON r.label = p.label AND r.i = p.i
             |GROUP BY p.label""".stripMargin)),

    // ── Next 20 docs for annotation: margins nearest the boundary.
    QueryDef("q_uncertainty_sample",
      (s, d) => TextAnalysis.uncertaintySample(
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
              |  FROM f),
              |m AS (
              |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
              |         CAST(sum(wt) AS BIGINT) AS margin
              |  FROM w GROUP BY doc_id)
              |SELECT doc_id, n_tok, margin, abs(margin) AS abs_margin
              |FROM m ORDER BY abs_margin, doc_id LIMIT 20""".stripMargin))
  )
}
