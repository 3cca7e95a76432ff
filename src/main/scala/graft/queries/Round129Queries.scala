package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-129 batch: corpus-linguistics screens over the documents
  * table — deviation-of-proportions word dispersion (Gries' DP: is a
  * word evenly spread across sources or clumped — the corpus-balance
  * check beside q_kl_vocab's divergence), Church–Gale word burstiness
  * (re-occurrence within documents vs document frequency — the
  * adaptation signal a dedup/quality pipeline reads before trusting
  * term counts), and pairwise source-vocabulary Jaccard (which sources
  * share a lexicon — the duplicate-source candidate list). All counts
  * are integers; every share is an e6 div.
  */
object Round129Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Word dispersion (DP) for the 15 most frequent words:
    //    DP = Σ_s |share_of_word_in_s − share_of_corpus_in_s| / 2, e6.
    //    One (source, word) rollup; the word totals broadcast back onto
    //    the bounded source×top-word grid.
    QueryDef("q_word_dispersion",
      (s, d) => {
        val sw = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // word totals + source totals + grid
        val wt = sw.groupBy(col("w")).agg(sum(col("c")).as("cw"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cw").desc, col("w"))))
          .filter(col("rk") <= 15)
        val st = sw.groupBy(col("source")).agg(sum(col("c")).as("cs"))
        val tot = st.agg(sum(col("cs")).as("n"))
        sw.join(broadcast(wt), "w")
          .join(broadcast(st), "source")
          .crossJoin(broadcast(tot))
          // |c/cw − cs/n| e6, sign-factored cross-multiply (Spark div
          // truncates / DuckDB // floors — they agree only on ≥0).
          .select(col("w"), col("cw"), col("rk"), expr(
            """CASE WHEN c * n >= cs * cw
              |  THEN (c * n - cs * cw) * 1000000 div (cw * n)
              |ELSE (cs * cw - c * n) * 1000000 div (cw * n)
              |END""".stripMargin).as("dev_e6"))
          .groupBy(col("w"), col("cw"), col("rk"))
          .agg(expr("sum(dev_e6) div 2").as("dp_e6"))
          .selectExpr("w", "CAST(cw AS BIGINT) AS cw", "dp_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH sw AS (
             |  SELECT source, wd AS w, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS wd
             |        FROM documents)
             |  WHERE wd <> '' GROUP BY 1, 2),
             |wt AS (SELECT w, cw, rk FROM (
             |         SELECT w, CAST(sum(c) AS BIGINT) AS cw,
             |                CAST(row_number() OVER (ORDER BY sum(c) DESC,
             |                  w) AS BIGINT) AS rk
             |         FROM sw GROUP BY 1)
             |       WHERE rk <= 15),
             |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs
             |       FROM sw GROUP BY 1),
             |tot AS (SELECT CAST(sum(cs) AS BIGINT) AS n FROM st),
             |dev AS (SELECT wt.w, wt.cw, wt.rk,
             |               CASE WHEN sw.c * tot.n >= st.cs * wt.cw
             |                 THEN (sw.c * tot.n - st.cs * wt.cw)
             |                      * 1000000 // (wt.cw * tot.n)
             |                 ELSE (st.cs * wt.cw - sw.c * tot.n)
             |                      * 1000000 // (wt.cw * tot.n)
             |               END AS dev_e6
             |        FROM sw JOIN wt ON sw.w = wt.w
             |        JOIN st ON sw.source = st.source
             |        CROSS JOIN tot)
             |SELECT w, cw, CAST(sum(dev_e6) // 2 AS BIGINT) AS dp_e6, rk
             |FROM dev GROUP BY w, cw, rk""".stripMargin)),

    // ── Word burstiness for the top 20 words by document frequency:
    //    df1 = docs containing the word, df2 = docs containing it ≥2×,
    //    burst = df2/df1 e6 (Church–Gale: how much more likely is a
    //    second occurrence once one happened). ONE (doc, word) rollup.
    QueryDef("q_word_burstiness",
      (s, d) => {
        val dw = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("doc_id"), col("w"))
          .agg(count(lit(1)).as("c"))
        dw.groupBy(col("w"))
          .agg(count(lit(1)).as("df1"),
            sum(when(col("c") >= 2, 1L).otherwise(0L)).as("df2"),
            sum(col("c")).as("tf"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("df1").desc, col("w"))))
          .filter(col("rk") <= 20)
          .selectExpr("w", "CAST(df1 AS BIGINT) AS df1",
            "CAST(df2 AS BIGINT) AS df2", "CAST(tf AS BIGINT) AS tf",
            "df2 * 1000000 div df1 AS burst_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH dw AS (
             |  SELECT doc_id, wd AS w, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |        FROM documents)
             |  WHERE wd <> '' GROUP BY 1, 2),
             |agg AS (SELECT w, CAST(count(*) AS BIGINT) AS df1,
             |               CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0
             |                 END) AS BIGINT) AS df2,
             |               CAST(sum(c) AS BIGINT) AS tf
             |        FROM dw GROUP BY 1)
             |SELECT w, df1, df2, tf, df2 * 1000000 // df1 AS burst_e6, rk
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY df1 DESC,
             |        w) AS BIGINT) AS rk
             |      FROM agg)
             |WHERE rk <= 20""".stripMargin)),

    // ── Source-vocabulary Jaccard: distinct words per source, pairwise
    //    |A∩B| via a word-keyed self-join (words are the join key — no
    //    all-pairs doc scan), |A∪B| = |A|+|B|−|A∩B|; top 10 pairs. The
    //    source axis is bounded (~20), so the pair frame is tiny.
    QueryDef("q_source_vocab_jaccard",
      (s, d) => {
        val sv = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .select(col("source"), col("w")).distinct()
          .localCheckpoint(false) // sizes + the intersection self-join
        val sz = sv.groupBy(col("source")).agg(count(lit(1)).as("nv"))
        val inter = sv.as("a").join(sv.as("b"),
            col("a.w") === col("b.w") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
          .agg(count(lit(1)).as("ninter"))
        inter
          .join(broadcast(sz.select(col("source").as("sa"),
            col("nv").as("na"))), "sa")
          .join(broadcast(sz.select(col("source").as("sb"),
            col("nv").as("nb"))), "sb")
          .withColumn("jaccard_e6",
            expr("ninter * 1000000 div (na + nb - ninter)"))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("jaccard_e6").desc, col("sa"), col("sb"))))
          .filter(col("rk") <= 10)
          .selectExpr("sa", "sb", "CAST(ninter AS BIGINT) AS ninter",
            "CAST(na AS BIGINT) AS na", "CAST(nb AS BIGINT) AS nb",
            "jaccard_e6", "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH sv AS (
             |  SELECT DISTINCT source, wd AS w
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS wd
             |        FROM documents)
             |  WHERE wd <> ''),
             |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
             |       FROM sv GROUP BY 1),
             |inter AS (SELECT a.source AS sa, b.source AS sb,
             |                 CAST(count(*) AS BIGINT) AS ninter
             |          FROM sv a JOIN sv b ON a.w = b.w
             |            AND a.source < b.source
             |          GROUP BY 1, 2),
             |j AS (SELECT sa, sb, ninter, za.nv AS na, zb.nv AS nb,
             |             ninter * 1000000 // (za.nv + zb.nv - ninter)
             |               AS jaccard_e6
             |      FROM inter
             |      JOIN sz za ON inter.sa = za.source
             |      JOIN sz zb ON inter.sb = zb.source)
             |SELECT sa, sb, ninter, na, nb, jaccard_e6, rk
             |FROM (SELECT *, CAST(row_number() OVER (ORDER BY jaccard_e6
             |        DESC, sa, sb) AS BIGINT) AS rk
             |      FROM j)
             |WHERE rk <= 10""".stripMargin))
  )
}
