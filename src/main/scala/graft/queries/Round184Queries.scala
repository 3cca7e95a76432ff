package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bm25
import org.apache.spark.sql.functions._

/** Round-184 batch — agreement, diversity, and probabilistic-eval
  * closers:
  *
  *  - Quadratic-weighted kappa (`q_weighted_kappa`): chance-corrected
  *    agreement between two 6-level ordinal reads of a line (quantity
  *    decile vs discount band) with w_ij = (i−j)² — the metric ordinal
  *    ML graders standardize on. κ_w = 1 − n·ΣwO / Σ(w·r·c) stays an
  *    exact integer ratio on the bounded 6×6 table; sign-split e6
  *    close (κ < 0 = worse than chance).
  *  - Simpson diversity (`q_simpson_diversity`): per-source word
  *    concentration D = Σm(m−1)/(N(N−1)) and its inverse (effective
  *    vocabulary size) — the ecology take on corpus diversity next to
  *    q_yule_k (same spectrum, different functional), all integers.
  *  - Log loss (`q_log_loss`): cross-entropy of a per-discount-band
  *    return-rate model trained on EVEN order keys and scored on ODD
  *    ones — the train/score split every leakage-honest eval needs.
  *    Probabilities live in e6, clipped to [1e3, 1e6−1e3] (standard
  *    log-loss clipping, mirrored), and ln closes through the shared
  *    integer log₂ (·ln2), so the total is an integer sum — no double
  *    accumulation.
  *
  * Scale shapes: one pass each onto bounded axes (6×6 agreement table,
  * per-source word counts, 11 discount bands); the train/score join is
  * a broadcast of the 11-row rate table.
  */
object Round184Queries {

  private val dec = "decimal(38,0)"

  def defs: Seq[QueryDef] = Seq(

    // ── Quadratic-weighted Cohen's kappa on the 6×6 band table.
    QueryDef("q_weighted_kappa",
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .select(expr("least(CAST(floor(l_quantity + 0.5) AS BIGINT)" +
            " div 10, 5)").as("i"),
            expr("least(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)" +
              " div 2, 5)").as("j"))
          .groupBy(col("i"), col("j")).agg(count(lit(1)).as("o"))
          .localCheckpoint(false) // ≤ 36 cells at any SF
        val n = cells.agg(sum(col("o")).as("n"))
        val wo = cells.agg(
          sum(expr("(i - j) * (i - j) * o")).as("swo"))
        val margins = cells.groupBy(col("i")).agg(sum(col("o")).as("r"))
          .crossJoin(broadcast(
            cells.groupBy(col("j")).agg(sum(col("o")).as("c"))))
          .agg(sum(expr(s"CAST((i - j) * (i - j) AS $dec) * r * c"))
            .as("swrc"))
        wo.crossJoin(broadcast(margins)).crossJoin(broadcast(n))
          .selectExpr("n", "swo", "CAST(swrc AS BIGINT) AS swrc",
            s"""CASE WHEN swrc = 0 THEN NULL
               |WHEN swrc >= CAST(n AS $dec) * swo
               |  THEN CAST((swrc - CAST(n AS $dec) * swo) * 1000000
               |    div swrc AS BIGINT)
               |  ELSE -CAST((CAST(n AS $dec) * swo - swrc) * 1000000
               |    div swrc AS BIGINT)
               |END AS kappa_w_e6""".stripMargin)
      },
      Some("""WITH cells AS (
             |  SELECT least(CAST(floor(l_quantity + 0.5) AS BIGINT)
             |           // 10, 5) AS i,
             |         least(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
             |           // 2, 5) AS j,
             |         CAST(count(*) AS BIGINT) AS o
             |  FROM lineitem GROUP BY 1, 2),
             |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
             |wo AS (SELECT CAST(sum((i - j) * (i - j) * o) AS BIGINT)
             |         AS swo FROM cells),
             |margins AS (SELECT sum(CAST((a.i - b.j) * (a.i - b.j)
             |                AS HUGEINT) * a.r * b.c) AS swrc
             |            FROM (SELECT i, sum(o) AS r FROM cells
             |                  GROUP BY 1) a
             |            CROSS JOIN (SELECT j, sum(o) AS c FROM cells
             |                        GROUP BY 1) b)
             |SELECT n, swo, CAST(swrc AS BIGINT) AS swrc,
             |       CASE WHEN swrc = 0 THEN NULL
             |       WHEN swrc >= CAST(n AS HUGEINT) * swo
             |         THEN CAST((swrc - CAST(n AS HUGEINT) * swo)
             |           * 1000000 // swrc AS BIGINT)
             |         ELSE -CAST((CAST(n AS HUGEINT) * swo - swrc)
             |           * 1000000 // swrc AS BIGINT)
             |       END AS kappa_w_e6
             |FROM wo CROSS JOIN margins CROSS JOIN n""".stripMargin)),

    // ── Simpson diversity of word use per source.
    QueryDef("q_simpson_diversity",
      (s, d) => Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("m"))
        .groupBy(col("source"))
        .agg(sum(col("m")).as("n_tokens"), count(lit(1)).as("vocab"),
          sum(expr(s"CAST(m AS $dec) * (m - 1)")).as("rep"))
        .selectExpr("source", "n_tokens", "vocab",
          s"""CASE WHEN n_tokens < 2 THEN NULL
             |ELSE CAST(rep * 1000000000 div (CAST(n_tokens AS $dec)
             |  * (n_tokens - 1)) AS BIGINT)
             |END AS simpson_d_e9""".stripMargin,
          s"""CASE WHEN rep = 0 THEN NULL
             |ELSE CAST(CAST(n_tokens AS $dec) * (n_tokens - 1) * 1000
             |  div rep AS BIGINT)
             |END AS inv_simpson_e3""".stripMargin),
      Some("""WITH wc AS (
             |  SELECT source, w, CAST(count(*) AS BIGINT) AS m
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  GROUP BY 1, 2),
             |agg AS (SELECT source, CAST(sum(m) AS BIGINT) AS n_tokens,
             |          CAST(count(*) AS BIGINT) AS vocab,
             |          sum(CAST(m AS HUGEINT) * (m - 1)) AS rep
             |        FROM wc GROUP BY 1)
             |SELECT source, n_tokens, vocab,
             |       CASE WHEN n_tokens < 2 THEN NULL
             |       ELSE CAST(rep * 1000000000
             |         // (CAST(n_tokens AS HUGEINT) * (n_tokens - 1))
             |         AS BIGINT)
             |       END AS simpson_d_e9,
             |       CASE WHEN rep = 0 THEN NULL
             |       ELSE CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1)
             |         * 1000 // rep AS BIGINT)
             |       END AS inv_simpson_e3
             |FROM agg""".stripMargin)),

    // ── Log loss of a per-discount-band return model, even→odd split.
    QueryDef("q_log_loss",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(expr("CAST(floor(l_discount * 100 + 0.5) AS BIGINT)")
            .as("band"),
            (col("l_returnflag") === "R").as("y"),
            (col("l_orderkey") % 2 === 0).as("train"))
        // train-side per-band return rate in e6, clipped to the
        // standard [1e3, 1e6−1e3] log-loss band
        val rates = li.filter(col("train"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("nt"),
            sum(when(col("y"), 1L).otherwise(0L)).as("pt"))
          .selectExpr("band",
            "least(greatest(pt * 1000000 div nt, 1000L)," +
              " 999000L) AS p_e6")
        // −ln x = (L(1e6) − L(x_e6))·ln2 with L = the SHARED fixed-point
        // log₂ — the 1e6 anchor must come from the same 5-bit table
        // (log2E6Int, the plan-build-time twin) so −ln(1) is exactly 0.
        val l1m = Bm25.log2E6Int(1000000L)
        val scored = li.filter(!col("train"))
          .join(broadcast(rates), Seq("band"))
          .withColumn("lp", Bm25.log2E6(col("p_e6")))
          .withColumn("lq", Bm25.log2E6(lit(1000000L) - col("p_e6")))
          .withColumn("term_e6",
            expr(s"CASE WHEN y THEN (${l1m}L - lp) * 693147L div 1000000L" +
              s" ELSE (${l1m}L - lq) * 693147L div 1000000L END"))
        scored.agg(count(lit(1)).as("n_eval"),
            sum(col("term_e6")).as("tot"))
          .selectExpr("n_eval", "tot div n_eval AS logloss_e6")
      },
      Some {
        val lp = Bm25.log2E6Sql("p_e6")
        val lq = Bm25.log2E6Sql("1000000 - p_e6")
        val l1m = Bm25.log2E6Int(1000000L)
        s"""WITH li AS (
           |  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
           |           AS band,
           |         l_returnflag = 'R' AS y,
           |         l_orderkey % 2 = 0 AS train
           |  FROM lineitem),
           |rates AS (SELECT band,
           |            CAST(least(greatest(
           |              sum(CASE WHEN y THEN 1 ELSE 0 END) * 1000000
           |                // count(*), 1000), 999000) AS BIGINT) AS p_e6
           |          FROM li WHERE train GROUP BY 1),
           |scored AS (SELECT li.y,
           |             CAST($lp AS BIGINT) AS lp,
           |             CAST($lq AS BIGINT) AS lq
           |           FROM li JOIN rates ON rates.band = li.band
           |           WHERE NOT li.train),
           |terms AS (SELECT CASE WHEN y
           |            THEN ($l1m - lp) * 693147 // 1000000
           |            ELSE ($l1m - lq) * 693147 // 1000000
           |            END AS term_e6
           |          FROM scored)
           |SELECT CAST(count(*) AS BIGINT) AS n_eval,
           |       CAST(sum(term_e6) // count(*) AS BIGINT) AS logloss_e6
           |FROM terms""".stripMargin
      })
  )
}
