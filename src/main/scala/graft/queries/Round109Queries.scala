package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-109 batch: Ripley's K multi-radius clustering profile (the
  * scale-resolved companion to the single-number q_morans_i /
  * q_getis_ord), Ansari–Bradley dispersion test (the SCALE-difference
  * sibling of q_mann_whitney's location test), and chunked type–token
  * ratio (length-controlled lexical diversity — the per-window fix for
  * raw TTR's document-length bias that q_heaps_law models globally).
  */
object Round109Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Ripley's K on the latitude-band axis: for r ∈ {1, 2, 4}, the
    //    share of ordered point pairs within r bands of each other.
    //    With per-band counts x and the RANGE-window neighborhood sum
    //    S_r, pairs(r) = Σ x·S_r − N exactly (the subtraction removes
    //    each point paired with itself); K_e6 = pairs·1e6/(N(N−1)).
    //    Rising K(r)/expected marks clustering at that radius. All
    //    integer; the three radii ride one checkpointed 34-band axis.
    QueryDef("q_ripley_k",
      (s, d) => {
        val bands = Tables.events(s, d)
          .select(expr("(user_id * 37 % 17000) div 500").as("band"))
          .groupBy(col("band")).agg(count(lit(1)).as("x"))
          .localCheckpoint(false) // three radii share the axis
        def nb(r: Int) = Window.orderBy(col("band")).rangeBetween(-r, r)
        val m = bands
          .withColumn("s1", sum(col("x")).over(nb(1)))
          .withColumn("s2", sum(col("x")).over(nb(2)))
          .withColumn("s4", sum(col("x")).over(nb(4)))
          .agg(sum(col("x")).as("n"),
            sum(expr("x * s1")).as("p1"), sum(expr("x * s2")).as("p2"),
            sum(expr("x * s4")).as("p4"))
          .localCheckpoint(false)
        def row(r: Int, p: String) = m.selectExpr(
          s"CAST($r AS BIGINT) AS r",
          s"CAST($p - n AS BIGINT) AS n_pairs",
          s"($p - n) * 1000000 div (n * (n - 1)) AS k_e6")
        row(1, "p1").unionByName(row(2, "p2")).unionByName(row(4, "p4"))
      },
      Some("""WITH bands AS (
             |  SELECT (user_id * 37 % 17000) // 500 AS band,
             |         CAST(count(*) AS BIGINT) AS x
             |  FROM events GROUP BY 1),
             |w AS (SELECT x,
             |        CAST(sum(x) OVER (ORDER BY band RANGE BETWEEN
             |          1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS s1,
             |        CAST(sum(x) OVER (ORDER BY band RANGE BETWEEN
             |          2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS s2,
             |        CAST(sum(x) OVER (ORDER BY band RANGE BETWEEN
             |          4 PRECEDING AND 4 FOLLOWING) AS BIGINT) AS s4
             |      FROM bands),
             |m AS (SELECT CAST(sum(x) AS BIGINT) AS n,
             |             CAST(sum(x * s1) AS BIGINT) AS p1,
             |             CAST(sum(x * s2) AS BIGINT) AS p2,
             |             CAST(sum(x * s4) AS BIGINT) AS p4
             |      FROM w)
             |SELECT CAST(1 AS BIGINT) AS r, p1 - n AS n_pairs,
             |       (p1 - n) * 1000000 // (n * (n - 1)) AS k_e6 FROM m
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), p2 - n,
             |       (p2 - n) * 1000000 // (n * (n - 1)) FROM m
             |UNION ALL
             |SELECT CAST(4 AS BIGINT), p4 - n,
             |       (p4 - n) * 1000000 // (n * (n - 1)) FROM m"""
        .stripMargin)),

    // ── Ansari–Bradley dispersion test between daily click and view
    //    volumes on the shared 30-day axis: rank the combined sample
    //    from both ends (score = min(rank, N+1−rank)), sum the click
    //    sample's scores. Ties broken deterministically by
    //    (value, group, day) — the documented convention both engines
    //    share. Expected value under H0 emitted beside the statistic
    //    (parity-exact e6 form).
    QueryDef("q_ansari_bradley",
      (s, d) => {
        val daily = Tables.events(s, d)
          .filter(col("event_type").isin("click", "view"))
          .select(col("event_type").as("et"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .groupBy(col("et"), col("day")).agg(count(lit(1)).as("c"))
          .localCheckpoint(false) // rank walk + group sizes
        val n = daily.agg(count(lit(1)).as("n_all"))
        daily.crossJoin(broadcast(n))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("c"), col("et"), col("day"))).cast("long"))
          .withColumn("score", least(col("rk"), col("n_all") + 1 - col("rk")))
          .agg(max(col("n_all")).as("n_all"),
            sum(expr("CASE WHEN et = 'click' THEN 1 ELSE 0 END")).as("n1"),
            sum(expr("CASE WHEN et = 'click' THEN score ELSE 0 END"))
              .as("ab_stat"))
          .selectExpr("CAST(n_all AS BIGINT) AS n_all",
            "CAST(n1 AS BIGINT) AS n1", "CAST(ab_stat AS BIGINT) AS ab_stat",
            """CASE WHEN n_all % 2 = 0
              |     THEN n1 * (n_all + 2) * 1000000 div 4
              |     ELSE n1 * (n_all + 1) * (n_all + 1) * 1000000
              |          div (4 * n_all) END AS e_ab_e6""".stripMargin)
      },
      Some("""WITH daily AS (SELECT event_type AS et,
             |                      epoch_us(ts) // 86400000000 AS day,
             |                      CAST(count(*) AS BIGINT) AS c
             |               FROM events
             |               WHERE event_type IN ('click', 'view')
             |               GROUP BY 1, 2),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM daily),
             |r AS (SELECT et, n_all,
             |             CAST(row_number() OVER (ORDER BY c, et, day)
             |               AS BIGINT) AS rk
             |      FROM daily CROSS JOIN n),
             |sc AS (SELECT et, n_all,
             |              least(rk, n_all + 1 - rk) AS score FROM r),
             |m AS (SELECT max(n_all) AS n_all,
             |             CAST(sum(CASE WHEN et = 'click' THEN 1 ELSE 0 END)
             |               AS BIGINT) AS n1,
             |             CAST(sum(CASE WHEN et = 'click' THEN score
             |                      ELSE 0 END) AS BIGINT) AS ab_stat
             |      FROM sc)
             |SELECT n_all, n1, ab_stat,
             |       CASE WHEN n_all % 2 = 0
             |            THEN n1 * (n_all + 2) * 1000000 // 4
             |            ELSE n1 * (n_all + 1) * (n_all + 1) * 1000000
             |                 // (4 * n_all) END AS e_ab_e6
             |FROM m""".stripMargin)),

    // ── Chunked type–token ratio per language: split each document
    //    into tumbling 50-token chunks, keep only FULL chunks (the
    //    length control raw TTR lacks), TTR = distinct/50 per chunk,
    //    then the per-language mean in e6. One token explode feeds one
    //    (doc, chunk) rollup; the language mean rides a tiny axis.
    QueryDef("q_chunk_ttr",
      (s, d) => {
        val chunks = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
          .filter(col("word") =!= "")
          // re-number non-empty tokens? No: position is the RAW split
          // index in both engines (empty tokens excluded AFTER), so the
          // chunk boundaries agree as long as the convention matches.
          .withColumn("chunk", expr("pos div 50"))
          .groupBy(col("doc_id"), col("lang"), col("chunk"))
          .agg(countDistinct(col("word")).as("d_words"),
            count(lit(1)).as("t_words"))
          .filter(col("t_words") === 50L)
        chunks.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(expr("d_words * 20000")).as("ttr_sum_e6"))
          .selectExpr("lang", "CAST(n_chunks AS BIGINT) AS n_chunks",
            "ttr_sum_e6 div n_chunks AS mean_ttr_e6")
      },
      Some("""WITH tok AS (SELECT doc_id, lang,
             |                    generate_subscripts(string_split(text, ' '),
             |                                        1) - 1 AS pos,
             |                    unnest(string_split(text, ' ')) AS word
             |             FROM documents),
             |ch AS (SELECT doc_id, lang, pos // 50 AS chunk,
             |              CAST(count(DISTINCT word) AS BIGINT) AS d_words,
             |              CAST(count(*) AS BIGINT) AS t_words
             |       FROM tok WHERE word <> ''
             |       GROUP BY 1, 2, 3
             |       HAVING count(*) = 50)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
             |       CAST(sum(d_words * 20000) AS BIGINT) // count(*)
             |         AS mean_ttr_e6
             |FROM ch GROUP BY 1""".stripMargin))
  )
}
