package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-145 batch: tokenizer-design inputs over the corpus —
  * character unigram entropy per language (the code-page sanity
  * number; fixed-point log₂ so both engines emit identical integers),
  * first-round BPE merge candidates (the most frequent adjacent
  * character pairs inside words — what a byte-pair tokenizer would
  * merge first), and the hapax ratio per source (share of
  * once-occurring word types — q_good_turing's ff₁ read, per-source).
  * Char explosion is the only data-sized pass; everything after rides
  * bounded (lang × charset / pair / source) axes.
  */
object Round145Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Char entropy per lang: H = log2(N) − Σc·log2(c)/N over the
    //    single-character histogram (spaces excluded).
    QueryDef("q_char_entropy",
      (s, d) => {
        val ch = Tables.documents(s, d)
          .select(col("lang"),
            explode(split(col("text"), "")).as("ch"))
          .filter(col("ch") =!= "" && col("ch") =!= " ")
          .groupBy(col("lang"), col("ch"))
          .agg(count(lit(1)).as("c"))
        ch.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_chars"), sum(col("c")).as("n"),
            sum(col("c") * Bm25.log2E6(col("c"))).as("scl"))
          .select(col("lang"),
            col("n_chars").cast("long").as("n_chars"),
            col("n").cast("long").as("n"),
            (Bm25.log2E6(col("n")) - expr("scl div n")).as("entropy_e6"))
      },
      Some(s"""WITH ch AS (
             |  SELECT lang, c AS ch, CAST(count(*) AS BIGINT) AS c
             |  FROM (SELECT lang, unnest(string_split(text, '')) AS c
             |        FROM documents)
             |  WHERE c <> '' AND c <> ' '
             |  GROUP BY 1, 2),
             |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_chars,
             |             CAST(sum(c) AS BIGINT) AS n,
             |             CAST(sum(c * ${Bm25.log2E6Sql("c")})
             |               AS BIGINT) AS scl
             |      FROM ch GROUP BY 1)
             |SELECT lang, n_chars, n,
             |       CAST(${Bm25.log2E6Sql("n")} - scl // n AS BIGINT)
             |         AS entropy_e6
             |FROM g""".stripMargin)),

    // ── BPE merge candidates: adjacent char pairs within words (the
    //    i/i+1 zip of each word's characters), top 20 by count — what
    //    the first merge round of a byte-pair encoder would pick.
    //    TakeOrdered top-k; the rank window runs on the 20-row frame.
    QueryDef("q_bpe_merge_candidates",
      (s, d) => {
        val pairs = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) >= 2)
          .select(explode(expr(
            """transform(sequence(1, length(w) - 1),
              |  i -> concat(substring(w, i, 1),
              |              substring(w, i + 1, 1)))""".stripMargin))
            .as("pair"))
          .groupBy(col("pair")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // total + top-k
        val tot = pairs.agg(sum(col("c")).as("tot"))
        pairs.orderBy(col("c").desc, col("pair")).limit(20)
          .crossJoin(broadcast(tot))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("c").desc, col("pair"))))
          .selectExpr("pair", "CAST(c AS BIGINT) AS c",
            "c * 1000000 div tot AS share_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH w AS (SELECT wd AS w
             |           FROM (SELECT unnest(string_split(text, ' '))
             |                   AS wd
             |                 FROM documents)
             |           WHERE length(wd) >= 2),
             |p AS (SELECT unnest(list_transform(
             |               range(1, length(w)),
             |               i -> substring(w, i, 1)
             |                    || substring(w, i + 1, 1))) AS pair
             |      FROM w),
             |cnt AS (SELECT pair, CAST(count(*) AS BIGINT) AS c
             |        FROM p GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM cnt)
             |SELECT pair, c, c * 1000000 // tot AS share_e6, rk
             |FROM (SELECT pair, c, tot,
             |             CAST(row_number() OVER (ORDER BY c DESC,
             |               pair) AS BIGINT) AS rk
             |      FROM cnt CROSS JOIN tot)
             |WHERE rk <= 20""".stripMargin)),

    // ── Hapax ratio per source: word types seen once vs total types —
    //    high hapax share flags thin or noisy sources before they skew
    //    a vocabulary build. One (source, word) rollup.
    QueryDef("q_hapax_ratio",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("tf"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_types"),
            sum(when(col("tf") === 1L, 1L).otherwise(0L)).as("n_hapax"),
            sum(col("tf")).as("n_tokens"))
          .selectExpr("source", "CAST(n_types AS BIGINT) AS n_types",
            "CAST(n_hapax AS BIGINT) AS n_hapax",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            "n_hapax * 1000000 div n_types AS hapax_e6")
      },
      Some("""WITH tw AS (
             |  SELECT source, wd AS w, CAST(count(*) AS BIGINT) AS tf
             |  FROM (SELECT source, unnest(string_split(text, ' '))
             |          AS wd
             |        FROM documents)
             |  WHERE wd <> '' GROUP BY 1, 2)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_types,
             |       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) AS n_hapax,
             |       CAST(sum(tf) AS BIGINT) AS n_tokens,
             |       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
             |         AS BIGINT) * 1000000 // count(*) AS hapax_e6
             |FROM tw GROUP BY 1""".stripMargin))
  )
}
