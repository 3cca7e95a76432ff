package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{Dedup, TimeSeries}
import org.apache.spark.sql.functions._

/** Round-42 batch: the LLM-curation audits that sit AROUND the existing
  * filters — a C4/Gopher-style quality-gate funnel with first-kill
  * attribution, embedding-space benchmark decontamination (the vector
  * leg of q_decontaminate's shingle overlap), the MinHash LSH S-curve
  * calibration table (observed candidates vs the analytic band-collision
  * probability), and Holt–Winters triple smoothing (completing the
  * exponential-smoothing family: EWMA → Holt → HW).
  */
object Round42Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Quality-gate funnel: each document is attributed to the FIRST
    //    rule that kills it (the order is the pipeline order), so stage
    //    counts tell you what each gate uniquely removes — the standard
    //    corpus-cleaning report. ONE scan, a case ladder, one tiny agg.
    QueryDef("q_quality_funnel",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            size(split(col("text"), " ")).cast("long").as("n_toks"),
            size(array_distinct(split(col("text"), " "))).cast("long")
              .as("n_dist"))
          // Thresholds are calibrated to THIS corpus's spread (48..553
          // chars, mean word length 4.7..6.2, min distinct ratio 0.28)
          // so every gate demonstrably fires — the shape, not the cuts,
          // is the operator.
          .withColumn("stage",
            when(col("n_chars") < 120, "1_too_short")
              .when(col("n_chars") > 400, "2_too_long")
              .when(col("n_chars") > col("n_toks") * 6, "3_word_shape")
              .when(col("n_dist") * 10 < col("n_toks") * 4, "4_repetitive")
              .otherwise("5_pass"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_toks")).as("n_tokens"))
      },
      Some("""WITH f AS (
             |  SELECT doc_id, n_chars,
             |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
             |         CAST(len(list_distinct(string_split(text, ' ')))
             |              AS BIGINT) AS n_dist
             |  FROM documents),
             |st AS (
             |  SELECT CASE
             |           WHEN n_chars < 120 THEN '1_too_short'
             |           WHEN n_chars > 400 THEN '2_too_long'
             |           WHEN n_chars > n_toks * 6 THEN '3_word_shape'
             |           WHEN n_dist * 10 < n_toks * 4 THEN '4_repetitive'
             |           ELSE '5_pass' END AS stage, n_toks
             |  FROM f)
             |SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_toks) AS BIGINT) AS n_tokens
             |FROM st GROUP BY 1""".stripMargin)),

    // ── Embedding decontamination: corpus vectors (folds ≠ 0) whose
    //    cosine against ANY benchmark vector (fold 0) clears τ = 0.95 —
    //    compared EXACTLY in integers: d > 0 ∧ d²·10⁴ ≥ 9025·‖a‖²·‖b‖²
    //    (squares ride DECIMAL(38,0)/HUGEINT — multiplication only, no
    //    division anywhere). The benchmark side broadcasts; the corpus
    //    never self-joins.
    QueryDef("q_decontaminate_embedding",
      (s, d) => {
        // Natural cross-fold cosines top out at 0.49 on this corpus
        // (verified), so contamination is PLANTED the augmented-dedup
        // way: every 10th benchmark vector re-enters the corpus scaled
        // ×1.001 under a fold-1 id — the query must recover exactly
        // those.
        val base = Tables.embeddings(s, d)
          .select(col("vec_id"), expr("CAST(embedding AS ARRAY<DOUBLE>)")
            .as("ev"))
        val withInjected = base.unionByName(
          base.filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 1000001L).as("vec_id"),
              expr("transform(ev, x -> x * 1001.0 / 1000.0)").as("ev")))
        val q = withInjected.select(col("vec_id"),
          expr("""transform(ev,
                 |x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))
                 |""".stripMargin).as("qv"))
          .withColumn("nrm",
            expr("aggregate(qv, 0L, (acc, v) -> acc + v * v)"))
        val width = s.sessionState.conf.numShufflePartitions
        val corpus = q.filter(col("vec_id") % 5 =!= 0)
          .select(col("vec_id"), col("qv"), col("nrm")).repartition(width)
        val bench = q.filter(col("vec_id") % 5 === 0)
          .select(col("vec_id").as("b_id"), col("qv").as("bv"),
            col("nrm").as("b_nrm"))
        corpus.crossJoin(broadcast(bench))
          .withColumn("dot",
            expr("""aggregate(zip_with(qv, bv, (x, y) -> x * y),
                   |0L, (acc, v) -> acc + v)""".stripMargin))
          .filter(col("dot") > 0 &&
            expr("""CAST(dot AS DECIMAL(38,0)) * dot * 10000
                   |>= CAST(9025 AS DECIMAL(38,0)) * nrm * b_nrm
                   |""".stripMargin))
          .groupBy(col("vec_id"))
          .agg(count(lit(1)).as("n_bench_hits"),
            min(col("b_id")).as("first_bench"))
      },
      Some("""WITH aug AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
             |  FROM embeddings
             |  UNION ALL
             |  SELECT vec_id + 1000001 AS vec_id,
             |         list_transform(CAST(embedding AS DOUBLE[]),
             |           x -> x * 1001.0 / 1000.0) AS ev
             |  FROM embeddings WHERE vec_id % 10 = 0),
             |q AS MATERIALIZED (
             |  SELECT vec_id,
             |         list_transform(ev,
             |           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
             |  FROM aug),
             |n AS MATERIALIZED (
             |  SELECT vec_id, qv,
             |         list_sum(list_transform(qv, v -> v * v)) AS nrm
             |  FROM q),
             |hits AS (
             |  SELECT c.vec_id, b.vec_id AS b_id,
             |         list_sum(list_transform(generate_series(1, len(c.qv)),
             |           i -> c.qv[i] * b.qv[i])) AS dot,
             |         c.nrm AS c_nrm, b.nrm AS b_nrm
             |  FROM n c JOIN n b
             |    ON c.vec_id % 5 <> 0 AND b.vec_id % 5 = 0)
             |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
             |       CAST(min(b_id) AS BIGINT) AS first_bench
             |FROM hits
             |WHERE dot > 0
             |  AND CAST(dot AS HUGEINT) * dot * 10000
             |      >= CAST(9025 AS HUGEINT) * c_nrm * b_nrm
             |GROUP BY 1""".stripMargin)),

    // ── MinHash LSH S-curve calibration: candidate pairs grouped by
    //    their equal-minhash count (est. Jaccard = n_eq/8), with the
    //    ANALYTIC collision probability of the 4-band × 2-row scheme at
    //    that similarity: p = 1 − (1 − s²)⁴ — integer-exact in e6 as
    //    1e6 − (64 − n_eq²)⁴·1e6 div 64⁴. The table that justifies (or
    //    indicts) the banding choice.
    QueryDef("q_minhash_curve",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        Dedup.candidates(Dedup.minhash(Dedup.shingles(docs)))
          .groupBy(col("n_eq"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("n_bands")).as("sum_shared_bands"))
          .select(col("n_eq"), col("n_pairs"), col("sum_shared_bands"),
            expr("n_eq * 1000000 div 8").as("est_jaccard_e6"),
            expr("""1000000 - (64 - n_eq * n_eq) * (64 - n_eq * n_eq)
                   |* (64 - n_eq * n_eq) * (64 - n_eq * n_eq) * 1000000
                   |div 16777216""".stripMargin).as("collision_prob_e6"))
      },
      Some {
        // the shared oracle twin of candidates∘minhash∘shingles
        val cand = DedupQueries.candSql("(SELECT doc_id, text FROM documents)")
        s"""WITH cand AS (SELECT * FROM $cand c0)
           |SELECT CAST(n_eq AS BIGINT) AS n_eq,
           |       CAST(count(*) AS BIGINT) AS n_pairs,
           |       CAST(sum(n_bands) AS BIGINT) AS sum_shared_bands,
           |       CAST(n_eq * 1000000 // 8 AS BIGINT) AS est_jaccard_e6,
           |       CAST(1000000 - (64 - n_eq * n_eq) * (64 - n_eq * n_eq)
           |            * (64 - n_eq * n_eq) * (64 - n_eq * n_eq) * 1000000
           |            // 16777216 AS BIGINT) AS collision_prob_e6
           |FROM cand GROUP BY n_eq""".stripMargin
      }),

    // ── Holt–Winters (α = β = γ = ½, period 7) over each type's first
    //    14 daily counts: the seasonal completion of EWMA → Holt.
    QueryDef("q_holt_winters",
      (s, d) => TimeSeries.holtWinters(
        Tables.events(s, d)
          .groupBy(col("event_type").as("k"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .agg(count(lit(1)).as("c")),
        "k", "day", "day", "c", 7),
      Some(TimeSeries.holtWintersSql(
        """SELECT event_type AS key, epoch_us(ts) // 86400000000 AS t,
          |       epoch_us(ts) // 86400000000 AS tie, count(*) AS x
          |FROM events GROUP BY 1, 2, 3""".stripMargin, 7)))
  )
}
