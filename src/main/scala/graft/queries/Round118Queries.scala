package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-118 batch: two more curation screens the LLM-data families
  * still lacked — degenerate-repetition runs (the "word word word"
  * loop signature of low-quality or machine-generated text, found via
  * the gaps-and-islands idiom) and prefix-template mining (shared
  * 5-word document heads = boilerplate headers that survive per-doc
  * dedup) — plus a Bloom-filter sizing advisor over the join-key
  * columns (the m/k arithmetic every build side of q_bloom_join needs,
  * in exact fixed-point so both engines agree bit-for-bit).
  */
object Round118Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Repetition loops: islands of ≥3 identical consecutive words.
    //    Island key = rn − row_number within (doc, word) — the standard
    //    gaps-and-islands subtraction, all on the one doc-partitioned
    //    token pass. Rolled up per language with the longest run.
    QueryDef("q_repetition_loops",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .filter(col("w") =!= "")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
          .withColumn("isl", col("rn") - row_number().over(
            Window.partitionBy(col("doc_id"), col("w"))
              .orderBy(col("pos"))))
        val runs = tok.groupBy(col("doc_id"), col("lang"), col("w"),
            col("isl"))
          .agg(count(lit(1)).as("len"))
          .filter(col("len") >= 3)
        runs.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_runs"),
            countDistinct(col("doc_id")).as("n_docs"),
            max(col("len")).as("max_run"),
            sum(col("len")).as("looped_tokens"))
          .selectExpr("lang", "CAST(n_runs AS BIGINT) AS n_runs",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(max_run AS BIGINT) AS max_run",
            "CAST(looped_tokens AS BIGINT) AS looped_tokens")
      },
      Some("""WITH tok0 AS (SELECT doc_id, lang,
             |                   generate_subscripts(string_split(text, ' '),
             |                                       1) AS pos,
             |                   unnest(string_split(text, ' ')) AS w
             |            FROM documents),
             |tok AS (SELECT doc_id, lang, w,
             |               row_number() OVER (PARTITION BY doc_id
             |                                  ORDER BY pos) AS rn,
             |               row_number() OVER (PARTITION BY doc_id, w
             |                                  ORDER BY pos) AS rw
             |        FROM tok0 WHERE w <> ''),
             |runs AS (SELECT doc_id, lang, w, rn - rw AS isl,
             |                CAST(count(*) AS BIGINT) AS len
             |         FROM tok GROUP BY 1, 2, 3, 4
             |         HAVING count(*) >= 3)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_runs,
             |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |       CAST(max(len) AS BIGINT) AS max_run,
             |       CAST(sum(len) AS BIGINT) AS looped_tokens
             |FROM runs GROUP BY 1""".stripMargin)),

    // ── Prefix templates: documents sharing their first five words are
    //    template instances (headers/boilerplate that per-doc hashes
    //    miss). The prefix assembles via a conditional-max pivot over
    //    rn ≤ 5 (one doc-keyed rollup — no string re-scan), then the
    //    template axis ranks by membership. Top 10, ≥2 docs.
    QueryDef("q_prefix_templates",
      (s, d) => {
        val head = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .filter(col("w") =!= "")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
          .filter(col("rn") <= 5)
          .groupBy(col("doc_id"), col("lang"))
          .agg(concat_ws(" ",
            max(when(col("rn") === 1, col("w"))),
            max(when(col("rn") === 2, col("w"))),
            max(when(col("rn") === 3, col("w"))),
            max(when(col("rn") === 4, col("w"))),
            max(when(col("rn") === 5, col("w")))).as("prefix"),
            max(col("rn")).as("n_head"))
          .filter(col("n_head") === 5L)
        head.groupBy(col("prefix"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"))
          .filter(col("n_docs") >= 2)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n_docs").desc, col("prefix"))))
          .filter(col("rk") <= 10)
          .selectExpr("prefix", "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(n_langs AS BIGINT) AS n_langs",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH tok0 AS (SELECT doc_id, lang,
             |                   generate_subscripts(string_split(text, ' '),
             |                                       1) AS pos,
             |                   unnest(string_split(text, ' ')) AS w
             |            FROM documents),
             |tok AS (SELECT doc_id, lang, w,
             |               row_number() OVER (PARTITION BY doc_id
             |                                  ORDER BY pos) AS rn
             |        FROM tok0 WHERE w <> ''),
             |head AS (SELECT doc_id, lang,
             |                concat_ws(' ',
             |                  max(CASE WHEN rn = 1 THEN w END),
             |                  max(CASE WHEN rn = 2 THEN w END),
             |                  max(CASE WHEN rn = 3 THEN w END),
             |                  max(CASE WHEN rn = 4 THEN w END),
             |                  max(CASE WHEN rn = 5 THEN w END)) AS prefix,
             |                max(rn) AS n_head
             |         FROM tok WHERE rn <= 5 GROUP BY 1, 2
             |         HAVING max(rn) = 5),
             |tpl AS (SELECT prefix, CAST(count(*) AS BIGINT) AS n_docs,
             |               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
             |        FROM head GROUP BY 1 HAVING count(*) >= 2)
             |SELECT prefix, n_docs, n_langs, rk
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY n_docs DESC,
             |        prefix) AS BIGINT) AS rk
             |      FROM tpl)
             |WHERE rk <= 10""".stripMargin)),

    // ── Bloom sizing advisor for the registry's join-key columns:
    //    optimal bits m = ⌈n·ln(1/p)/ln²2⌉ at p = 1% is n·9.5851
    //    (fixed-point: (ndv·95851 + 9999) div 10000) with k = 7
    //    hashes — the exact parameters a q_bloom_join build side
    //    should provision. One distinct-count per key column, all
    //    arithmetic integer.
    QueryDef("q_bloom_advisor",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        val cols = li.agg(
          countDistinct(col("l_partkey")).as("l_partkey"),
          countDistinct(col("l_suppkey")).as("l_suppkey"))
          .selectExpr("stack(2, 'l_partkey', l_partkey, " +
            "'l_suppkey', l_suppkey) AS (col_name, ndv)")
          .unionByName(o.agg(countDistinct(col("o_custkey")).as("n"))
            .selectExpr("'o_custkey' AS col_name", "n AS ndv"))
        cols
          .withColumn("m_bits", expr("(ndv * 95851 + 9999) div 10000"))
          .selectExpr("col_name", "CAST(ndv AS BIGINT) AS ndv",
            "m_bits", "CAST(7 AS BIGINT) AS n_hashes",
            "(m_bits + 8191) div 8192 AS kib")
      },
      Some("""WITH c AS (
             |  SELECT 'l_partkey' AS col_name,
             |         CAST(count(DISTINCT l_partkey) AS BIGINT) AS ndv
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_suppkey',
             |         CAST(count(DISTINCT l_suppkey) AS BIGINT)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'o_custkey',
             |         CAST(count(DISTINCT o_custkey) AS BIGINT)
             |  FROM orders)
             |SELECT col_name, ndv,
             |       (ndv * 95851 + 9999) // 10000 AS m_bits,
             |       CAST(7 AS BIGINT) AS n_hashes,
             |       ((ndv * 95851 + 9999) // 10000 + 8191) // 8192 AS kib
             |FROM c""".stripMargin))
  )
}
