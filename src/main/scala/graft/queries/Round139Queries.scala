package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Round-139 batch: the audits a dedup pipeline runs on ITSELF —
  * measured LSH recall by true-Jaccard band (does the 4-band/2-row
  * MinHash config actually catch what it promises; truth from the
  * lossless prefix join, candidates from the production LSH path),
  * shingle document-frequency skew (hot blocking keys are the salting
  * decision input — one shingle in half the corpus means one straggler
  * bucket at 100 TB), and the dedup threshold sweep (pair volume at
  * τ ∈ {0.3, 0.5, 0.7, 0.9} from ONE τ=0.3 join — the policy-knob
  * curve). Truth joins run on the doc_id<200 slice + injected
  * near-dups (the house corpus-injection convention); the LSH and
  * shingle paths are the production operators unchanged.
  */
object Round139Queries {

  /** doc_id<200 slice ∪ near-dup copies of every 7th doc (re-keyed
    * +1e6) — same injection as DedupQueries.nearAug, restricted so the
    * brute-truth oracle stays tractable. */
  private def slice(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = Tables.documents(s, d).filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" graft extra tail")).as("text")))
  }
  private val sliceSql =
    """(SELECT doc_id, text FROM documents WHERE doc_id < 200
      | UNION ALL
      | SELECT doc_id + 1000000 AS doc_id,
      |        concat(text, ' graft extra tail') AS text
      | FROM documents WHERE doc_id < 200 AND doc_id % 7 = 0)""".stripMargin

  /** Brute set-Jaccard truth pairs over `docsSql` at τ (e6) — the
    * oracle twin of [[Dedup.jaccardPrefixJoin]] (proven equivalent by
    * q_jaccard_prefix). */
  private def truthSql(docsSql: String, tauE6: Long): String =
    s"""(WITH w AS (SELECT DISTINCT doc_id, wd AS word
       |            FROM (SELECT doc_id,
       |                         unnest(string_split(text, ' ')) AS wd
       |                  FROM $docsSql dd) u
       |            WHERE wd <> ''),
       | sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
       |           FROM w GROUP BY doc_id),
       | inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                  CAST(count(*) AS BIGINT) AS inter
       |           FROM w a JOIN w b ON a.word = b.word
       |             AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       | SELECT i.doc_a, i.doc_b, i.inter,
       |        sa.sz + sb.sz - i.inter AS uni
       | FROM inter i
       | JOIN sizes sa ON sa.doc_id = i.doc_a
       | JOIN sizes sb ON sb.doc_id = i.doc_b
       | WHERE i.inter * 1000000 >= $tauE6 * (sa.sz + sb.sz - i.inter))"""
      .stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ── LSH recall by true-Jaccard decile (≥0.5): truth pairs from the
    //    prefix join, hits = pairs the banded MinHash path also
    //    surfaces. Both sides are the production operators; the left
    //    join is on the tiny pair frame.
    QueryDef("q_lsh_recall",
      (s, d) => {
        val docs = slice(s, d)
        val truth = Dedup.jaccardPrefixJoin(docs, 500000L)
        val cands = Dedup.candidates(Dedup.minhash(Dedup.shingles(docs)))
          .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
        truth.join(cands, Seq("doc_a", "doc_b"), "left")
          .groupBy(expr("least(inter * 10 div uni, 9)").as("band"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .selectExpr("CAST(band AS BIGINT) AS band",
            "CAST(n_pairs AS BIGINT) AS n_pairs",
            "CAST(n_hit AS BIGINT) AS n_hit",
            "n_hit * 1000000 div n_pairs AS recall_e6")
      },
      Some(s"""WITH truth AS (SELECT * FROM ${truthSql(sliceSql, 500000L)} t),
             |cands AS (SELECT doc_a, doc_b, 1 AS hit
             |          FROM ${DedupQueries.candSql(sliceSql)} c)
             |SELECT CAST(least(truth.inter * 10 // truth.uni, 9)
             |         AS BIGINT) AS band,
             |       CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(sum(coalesce(cands.hit, 0)) AS BIGINT) AS n_hit,
             |       CAST(sum(coalesce(cands.hit, 0)) AS BIGINT) * 1000000
             |         // count(*) AS recall_e6
             |FROM truth LEFT JOIN cands
             |  ON truth.doc_a = cands.doc_a AND truth.doc_b = cands.doc_b
             |GROUP BY 1""".stripMargin)),

    // ── Shingle DF skew: document frequency of every 3-shingle over
    //    the FULL corpus, top 20 + share of total shingle-postings
    //    mass — the blocking-key hot-spot audit (one keyed rollup; the
    //    production shingle op unchanged).
    QueryDef("q_shingle_skew",
      (s, d) => {
        val df = Dedup.shingles(Tables.documents(s, d)
            .select(col("doc_id"), col("text")))
          .select(col("doc_id"), col("shingle")).distinct()
          .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .localCheckpoint(false) // total + the top-20 rank
        val tot = df.agg(sum(col("df")).as("tot"))
        // top-20 via TakeOrdered (distributed top-k), NOT a global rank
        // window — the shingle vocabulary grows with the corpus, so a
        // single-partition sort over it would not survive 100 TB. The
        // rank window runs on the 20-row limited frame only.
        val top = df.orderBy(col("df").desc, col("shingle")).limit(20)
        top.crossJoin(broadcast(tot))
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("df").desc, col("shingle"))))
          .selectExpr("shingle", "CAST(df AS BIGINT) AS df",
            "df * 1000000 div tot AS share_e6",
            "CAST(rk AS BIGINT) AS rk")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
             |           FROM documents),
             |sh AS (SELECT DISTINCT doc_id,
             |              unnest(list_transform(range(1, len(ws) - 1),
             |                i -> ws[i] || ' ' || ws[i+1] || ' '
             |                     || ws[i+2])) AS shingle
             |       FROM w WHERE len(ws) >= 3),
             |df AS (SELECT shingle, CAST(count(*) AS BIGINT) AS df
             |       FROM sh GROUP BY 1),
             |tot AS (SELECT CAST(sum(df) AS BIGINT) AS tot FROM df)
             |SELECT shingle, df, df * 1000000 // tot AS share_e6, rk
             |FROM (SELECT shingle, df, tot,
             |             CAST(row_number() OVER (ORDER BY df DESC,
             |               shingle) AS BIGINT) AS rk
             |      FROM df CROSS JOIN tot)
             |WHERE rk <= 20""".stripMargin)),

    // ── Threshold sweep: ONE τ=0.3 prefix join, pair volumes at the
    //    four policy thresholds via cross-multiplied re-tests — how
    //    aggressive would each dedup setting be.
    QueryDef("q_dedup_threshold_sweep",
      (s, d) => {
        val truth = Dedup.jaccardPrefixJoin(slice(s, d), 300000L)
          .localCheckpoint(false) // four conditional rollups share it
        val taus = s.range(0, 4)
          .select((col("id") * 200000 + 300000).as("tau_e6"))
        truth.crossJoin(broadcast(taus))
          .filter(expr("inter * 1000000 >= tau_e6 * uni"))
          .groupBy(col("tau_e6"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("doc_b")).as("n_docs_dropped"))
          .selectExpr("CAST(tau_e6 AS BIGINT) AS tau_e6",
            "CAST(n_pairs AS BIGINT) AS n_pairs",
            "CAST(n_docs_dropped AS BIGINT) AS n_docs_dropped")
      },
      Some(s"""WITH truth AS (SELECT * FROM ${truthSql(sliceSql, 300000L)} t),
             |taus AS (SELECT unnest([300000, 500000, 700000, 900000])
             |           AS tau_e6)
             |SELECT CAST(tau_e6 AS BIGINT) AS tau_e6,
             |       CAST(count(*) AS BIGINT) AS n_pairs,
             |       CAST(count(DISTINCT doc_b) AS BIGINT)
             |         AS n_docs_dropped
             |FROM truth CROSS JOIN taus
             |WHERE inter * 1000000 >= tau_e6 * uni
             |GROUP BY 1""".stripMargin))
  )
}
