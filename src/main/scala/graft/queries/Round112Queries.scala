package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-112 batch: three corpus-curation screens a pretraining data
  * pipeline runs before anything else touches the text — Gopher-style
  * rule flags (Rae et al. 2021 §A1.1 heuristics re-expressed over the
  * documents table), duplicated-n-gram coverage (the RefinedWeb /
  * Gopher "fraction of characters in duplicated n-grams" signal that
  * catches boilerplate MinHash misses), and RAKE keyword extraction
  * (Rose et al. 2010 — stopword-delimited phrase degree/frequency).
  */
object Round112Queries {

  /** Fixed function-word list shared by the rules + RAKE screens; tiny
    * and closed so both engines inline it as a literal IN. */
  private val stopwords = Seq("the", "a", "of", "to", "and", "in",
    "is", "on", "for", "it")
  private def stopSql: String = stopwords.map("'" + _ + "'").mkString(", ")

  def defs: Seq[QueryDef] = Seq(

    // ── Gopher quality rules per language: each doc graded on four
    //    integer-exact heuristics (word-count range, mean-word-length
    //    range via cross-multiplication, ≥2 distinct function words,
    //    top-word frequency ≤ 20%), rolled up to per-lang pass counts.
    //    One token explode → one (doc, word) rollup → one per-doc
    //    rollup; the lang axis is bounded so the final agg is tiny.
    QueryDef("q_gopher_rules",
      (s, d) => {
        val wc = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("doc_id"), col("lang"), col("w"))
          .agg(count(lit(1)).as("c"))
        val doc = wc.groupBy(col("doc_id"), col("lang"))
          .agg(sum(col("c")).as("n_words"),
            sum(col("c") * length(col("w"))).as("sum_wlen"),
            max(col("c")).as("max_freq"),
            sum(when(col("w").isInCollection(stopwords), 1L)
              .otherwise(0L)).as("n_stop_kinds"))
          .selectExpr("lang",
            "CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS r_count",
            "CASE WHEN 3 * n_words <= sum_wlen AND sum_wlen <= 10 * n_words THEN 1 ELSE 0 END AS r_wlen",
            "CASE WHEN n_stop_kinds >= 2 THEN 1 ELSE 0 END AS r_stop",
            "CASE WHEN max_freq * 5 <= n_words THEN 1 ELSE 0 END AS r_rep")
        doc.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("r_count")).as("pass_count"),
            sum(col("r_wlen")).as("pass_wlen"),
            sum(col("r_stop")).as("pass_stop"),
            sum(col("r_rep")).as("pass_rep"),
            sum(expr("r_count * r_wlen * r_stop * r_rep")).as("pass_all"))
          .selectExpr("lang", "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(pass_count AS BIGINT) AS pass_count",
            "CAST(pass_wlen AS BIGINT) AS pass_wlen",
            "CAST(pass_stop AS BIGINT) AS pass_stop",
            "CAST(pass_rep AS BIGINT) AS pass_rep",
            "CAST(pass_all AS BIGINT) AS pass_all")
      },
      Some(s"""WITH wc AS (
             |  SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id, lang,
             |               unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  WHERE w <> '' GROUP BY 1, 2, 3),
             |doc AS (
             |  SELECT lang,
             |         CASE WHEN sum(c) >= 50 AND sum(c) <= 100000
             |              THEN 1 ELSE 0 END AS r_count,
             |         CASE WHEN 3 * sum(c) <= sum(c * length(w))
             |               AND sum(c * length(w)) <= 10 * sum(c)
             |              THEN 1 ELSE 0 END AS r_wlen,
             |         CASE WHEN sum(CASE WHEN w IN ($stopSql)
             |                            THEN 1 ELSE 0 END) >= 2
             |              THEN 1 ELSE 0 END AS r_stop,
             |         CASE WHEN max(c) * 5 <= sum(c)
             |              THEN 1 ELSE 0 END AS r_rep
             |  FROM wc GROUP BY doc_id, lang)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(r_count) AS BIGINT) AS pass_count,
             |       CAST(sum(r_wlen) AS BIGINT) AS pass_wlen,
             |       CAST(sum(r_stop) AS BIGINT) AS pass_stop,
             |       CAST(sum(r_rep) AS BIGINT) AS pass_rep,
             |       CAST(sum(r_count * r_wlen * r_stop * r_rep) AS BIGINT)
             |         AS pass_all
             |FROM doc GROUP BY 1""".stripMargin)),

    // ── Duplicated 5-gram coverage per language: the fraction of gram
    //    instances whose gram also appears in ANOTHER document —
    //    template/boilerplate mass that survives exact- and MinHash-
    //    level dedup. Tokens are renumbered post-filter (row_number per
    //    doc) so gram windows never straddle a dropped empty token the
    //    same way in both engines; grams assemble via lead() — one
    //    window over the doc axis, no self-join. The gram→doc-count
    //    rollup shuffles once on the gram string; at corpus scale that
    //    is the same keyed exchange a dedup pass already pays.
    QueryDef("q_gram_coverage",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .filter(col("w") =!= "")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("rn"))
        val grams = tok
          .withColumn("g", concat_ws(" ", col("w"),
            lead(col("w"), 1).over(wd), lead(col("w"), 2).over(wd),
            lead(col("w"), 3).over(wd), lead(col("w"), 4).over(wd)))
          .withColumn("w4", lead(col("w"), 4).over(wd))
          .filter(col("w4").isNotNull)
          .select(col("doc_id"), col("lang"), col("g"))
          .localCheckpoint(false) // instance side + the gram-docs rollup
        val dup = grams.groupBy(col("g"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2).select(col("g"))
        grams.join(dup.withColumn("is_dup", lit(1L)), Seq("g"), "left")
          .groupBy(col("lang"))
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_grams"),
            sum(coalesce(col("is_dup"), lit(0L))).as("n_dup"))
          .selectExpr("lang", "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(n_grams AS BIGINT) AS n_grams",
            "CAST(n_dup AS BIGINT) AS n_dup",
            "n_dup * 1000000 div n_grams AS dup_cov_e6")
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
             |grams AS (SELECT doc_id, lang,
             |                 concat_ws(' ', w,
             |                   lead(w, 1) OVER wd, lead(w, 2) OVER wd,
             |                   lead(w, 3) OVER wd, lead(w, 4) OVER wd)
             |                   AS g,
             |                 lead(w, 4) OVER wd AS w4
             |          FROM tok
             |          WINDOW wd AS (PARTITION BY doc_id ORDER BY rn)),
             |gf AS (SELECT doc_id, lang, g FROM grams
             |       WHERE w4 IS NOT NULL),
             |dup AS (SELECT g, 1 AS is_dup FROM gf
             |        GROUP BY g HAVING count(DISTINCT doc_id) >= 2)
             |SELECT lang,
             |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             |       CAST(count(*) AS BIGINT) AS n_grams,
             |       CAST(sum(coalesce(is_dup, 0)) AS BIGINT) AS n_dup,
             |       CAST(sum(coalesce(is_dup, 0)) AS BIGINT) * 1000000
             |         // count(*) AS dup_cov_e6
             |FROM gf LEFT JOIN dup USING (g)
             |GROUP BY 1""".stripMargin)),

    // ── RAKE keywords: stopword-delimited phrases (phrase id = running
    //    stopword count per doc), word score = degree/freq where degree
    //    sums the lengths of every phrase the word appears in. Top 15
    //    by score (deg·1e6 div freq — both non-negative, so truncate ==
    //    floor), tie-broken on freq then word. One explode feeds the
    //    phrase segmentation window; phrase lengths join back on the
    //    bounded (doc, phrase) key.
    QueryDef("q_rake_keywords",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .filter(col("w") =!= "")
          .withColumn("is_stop",
            when(col("w").isInCollection(stopwords), 1L).otherwise(0L))
          .withColumn("phrase", sum(col("is_stop")).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
          .filter(col("is_stop") === 0L)
          .select(col("doc_id"), col("phrase"), col("w"))
          .localCheckpoint(false) // member side + the phrase-length rollup
        val plen = tok.groupBy(col("doc_id"), col("phrase"))
          .agg(count(lit(1)).as("plen"))
        tok.join(plen, Seq("doc_id", "phrase"))
          .groupBy(col("w"))
          .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
          .withColumn("score_e6", expr("degree * 1000000 div freq"))
          .withColumn("rk", row_number().over(Window.orderBy(
            col("score_e6").desc, col("freq").desc, col("w"))))
          .filter(col("rk") <= 15)
          .selectExpr("w AS word", "CAST(freq AS BIGINT) AS freq",
            "CAST(degree AS BIGINT) AS degree", "score_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some(s"""WITH tok0 AS (SELECT doc_id,
             |                   generate_subscripts(string_split(text, ' '),
             |                                       1) AS pos,
             |                   unnest(string_split(text, ' ')) AS w
             |            FROM documents),
             |seg AS (SELECT doc_id, pos, w,
             |               CASE WHEN w IN ($stopSql) THEN 1 ELSE 0 END
             |                 AS is_stop,
             |               sum(CASE WHEN w IN ($stopSql) THEN 1 ELSE 0
             |                   END) OVER (PARTITION BY doc_id
             |                              ORDER BY pos) AS phrase
             |        FROM tok0 WHERE w <> ''),
             |tok AS (SELECT doc_id, phrase, w FROM seg WHERE is_stop = 0),
             |plen AS (SELECT doc_id, phrase,
             |                CAST(count(*) AS BIGINT) AS plen
             |         FROM tok GROUP BY 1, 2),
             |sc AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
             |              CAST(sum(plen) AS BIGINT) AS degree
             |       FROM tok JOIN plen USING (doc_id, phrase)
             |       GROUP BY 1),
             |r AS (SELECT w, freq, degree,
             |             degree * 1000000 // freq AS score_e6,
             |             CAST(row_number() OVER (ORDER BY
             |               degree * 1000000 // freq DESC, freq DESC, w)
             |               AS BIGINT) AS rk
             |      FROM sc)
             |SELECT w AS word, freq, degree, score_e6, rk
             |FROM r WHERE rk <= 15""".stripMargin))
  )
}
