package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Ranks, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-99 batch: the §7.4m Ranks percentile facade (global exact
  * selection riding the rank layout) plus two corpus-health estimators
  * a training-data pipeline runs before spending tokens — Good–Turing
  * unseen mass and distinct-bigram diversity.
  */
object Round99Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Global exact nearest-rank percentiles via Ranks.globalRow-
    //    Number: ONE data-sized range exchange (checkpointed layout;
    //    the count and offset aggregates ride it) + a broadcast of the
    //    5 target ranks. The selection facade promised in §7.4m —
    //    compare Quantiles.exactPercentiles' histogram-refine (two
    //    light scans, no total order) vs this (one shuffle, reusable
    //    totally-ordered layout).
    QueryDef("q_rank_percentile",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
            .as("cents"),
          col("l_orderkey"), col("l_linenumber"))
        Ranks.globalExactPercentiles(li, col("cents"),
          Seq(col("l_orderkey"), col("l_linenumber")),
          Seq(1, 25, 50, 75, 99), valueName = "value_cents")
      },
      Some("""WITH v AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c,
             |                  l_orderkey, l_linenumber FROM lineitem),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
             |r AS (SELECT c, row_number() OVER (ORDER BY c, l_orderkey,
             |                                   l_linenumber) AS rk
             |      FROM v),
             |p AS (SELECT CAST(p AS BIGINT) AS p
             |      FROM (VALUES (1),(25),(50),(75),(99)) AS ps(p))
             |SELECT p.p AS p, r.c AS value_cents
             |FROM p CROSS JOIN t
             |JOIN r ON r.rk = (p.p * t.n + 99) // 100""".stripMargin)),

    // ── Good–Turing: unseen-TRIGRAM mass (r=0 row, N₁/N e6) + smoothed
    //    counts r* = (r+1)·N_{r+1}/N_r for r=1..5 (trigram species: the
    //    synthetic vocab is ~31 words, so only n≥3 has a singleton
    //    tail). Corpus read once; everything after the species-count
    //    shuffle is a ≤7-row axis.
    QueryDef("q_good_turing",
      (s, d) => TextAnalysis.goodTuring(
        Tables.documents(s, d).select(col("text")), n = 3, maxR = 5),
      Some("""WITH w AS (SELECT unnest(list_transform(range(1, len(ws) - 1),
             |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
             |             AS word
             |           FROM (SELECT string_split(text, ' ') AS ws
             |                 FROM documents) t),
             |c AS (SELECT word, CAST(count(*) AS BIGINT) AS c
             |      FROM w GROUP BY 1),
             |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM c),
             |ff AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r
             |       FROM c WHERE c <= 6 GROUP BY 1),
             |sm AS (SELECT a.r, a.n_r,
             |              (a.r + 1) * coalesce(b.n_r, 0) * 1000000 // a.n_r
             |                AS gt_e6
             |       FROM ff a LEFT JOIN ff b ON b.r = a.r + 1
             |       WHERE a.r <= 5),
             |un AS (SELECT CAST(0 AS BIGINT) AS r, n_r,
             |              n_r * 1000000 // n_tokens AS gt_e6
             |       FROM ff CROSS JOIN t WHERE ff.r = 1)
             |SELECT r, n_r, gt_e6 FROM un
             |UNION ALL
             |SELECT r, n_r, gt_e6 FROM sm""".stripMargin)),

    // ── distinct-bigram diversity per source (Li et al. 2016's
    //    distinct-n): unique bigrams ÷ total bigrams — low ratios flag
    //    templated/boilerplate slices. Bigrams build in-row (zip_with,
    //    no shuffle); only the per-source distinct aggregates exchange.
    QueryDef("q_distinct_n",
      (s, d) => TextAnalysis.distinctBigrams(
        Tables.documents(s, d).select(col("source"), col("text"))),
      Some("""WITH b AS (SELECT source,
             |                  unnest(list_transform(range(1, len(ws)),
             |                    i -> ws[i] || ' ' || ws[i+1])) AS bg
             |           FROM (SELECT source, string_split(text, ' ') AS ws
             |                 FROM documents) t)
             |SELECT source,
             |       CAST(count(*) AS BIGINT) AS n_bigrams,
             |       CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct,
             |       CAST(count(DISTINCT bg) AS BIGINT) * 1000000 // count(*)
             |         AS distinct_e6
             |FROM b GROUP BY source""".stripMargin))
  )
}
