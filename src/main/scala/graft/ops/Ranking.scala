package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combining a lexical ranking (BM25)
  * with a vector ranking (embedding cosine) — or any N rankings — into
  * one list is the standard last step of a modern search/dedup pipeline.
  */
object Ranking {

  /** Reciprocal Rank Fusion (Cormack et al.): score(d) =
    * Σ_lists 1/(k + rank_list(d)), here as the e6 truncating integer
    * Σ 1e6 div (k + rank) — engine-portable, no FP. Items absent from a
    * list contribute nothing for it; `k` (classically 60) damps the
    * head so one list's #1 cannot dominate consensus mid-ranks.
    *
    * Input frames each carry (id, rank) with rank 1-based; output is
    * (id, score_e6, n_lists) — consumers sort by (score_e6 desc, id).
    *
    * Scale: a union + ONE groupBy(id) exchange regardless of list
    * count; no joins (fusion is associative over the union).
    */
  def rrf(rankings: Seq[DataFrame], k: Long = 60L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 0L, "k must be non-negative")
    val contrib = rankings.map(_.select(col("id"),
      expr(s"1000000L div (${k}L + rank)").as("c")))
    contrib.reduce(_ unionByName _)
      .groupBy(col("id"))
      .agg(sum(col("c")).as("score_e6"), count(lit(1)).as("n_lists"))
  }

  /** Precision@k and MRR per group — the binary-relevance companions to
    * [[ndcgAtK]], both from ONE aggregate over the ranked frame:
    * prec@k = |{rank ≤ k, rel > 0}|·1e6 div k, and MRR from the minimum
    * relevant rank (NULL mrr for groups with no relevant item at all —
    * distinguishable from a deep first hit). Integer-exact.
    */
  /** Top-k members per group with an "other" rollup — the reporting
    * contract every dashboard needs (pie charts, budget tables): the k
    * largest members keep their identity, the tail collapses to one
    * deterministic bucket so output stays k+1 rows per group no matter
    * the cardinality. Rank ties break on member id. Output: (group, who,
    * total, n_members).
    *
    * Scale: one keyed pre-aggregate, one rank window over members (far
    * smaller than rows), one keyed re-aggregate — the window never sees
    * raw rows. */
  def topKWithOther(df: DataFrame, groupCol: String, memberCol: String,
                    valueCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val t = df.select(col(groupCol).as("grp"), col(memberCol).as("member"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("member")).agg(sum(col("v")).as("total"))
    val rk = Window.partitionBy(col("grp"))
      .orderBy(col("total").desc, col("member"))
    t.withColumn("rk", row_number().over(rk))
      .withColumn("who",
        when(col("rk") <= k, col("member").cast("string")).otherwise("other"))
      .groupBy(col("grp"), col("who"))
      .agg(sum(col("total")).as("total"), count(lit(1)).as("n_members"))
  }

  /** ROC-AUC of an integer score as a binary-label predictor, by the
    * Mann–Whitney rank-sum identity — the standard calibration check for
    * any heuristic quality filter ("does my score actually separate the
    * classes?"). Tie-exact: tied scores get their textbook AVERAGE rank,
    * carried in doubled units so everything stays integer:
    *   rank2(value group) = 2·cum_before + cnt + 1   (= min+max rank)
    *   U2 = Σ_pos rank2 − n_pos·(n_pos+1)
    *   auc_e6 = U2·1e6 div (2·n_pos·n_neg)
    * so the result is bit-exact in any engine — no FP, no sampling.
    *
    * Scale: one aggregate by score value (map-side combinable), then a
    * prefix sum over DISTINCT score values — bounded-domain scores keep
    * that window tiny regardless of corpus size (same argument as the
    * histogram percentiles); the final reduce is a scalar. Output one
    * row: (n_pos, n_neg, auc_e6). */
  def aucRank(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byVal = df.select(col(scoreCol).cast("long").as("v"),
        when(col(labelCol), 1L).otherwise(0L).as("pos"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("pc"))
    val ord = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byVal
      .withColumn("cum", sum(col("cnt")).over(ord))
      .withColumn("r2", (col("cum") - col("cnt")) * 2 + col("cnt") + 1)
      .agg(sum(col("pc") * col("r2")).as("sr2"),
        sum(col("pc")).as("n_pos"), sum(col("cnt") - col("pc")).as("n_neg"))
      .selectExpr("n_pos", "n_neg",
        """CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
          |     ELSE (sr2 - n_pos * (n_pos + 1)) * 1000000
          |          div (2 * n_pos * n_neg)
          |END AS auc_e6""".stripMargin)
  }

  /** Step-wise precision-recall AUC (average precision over the
    * DISTINCT-score threshold sweep, high scores first): AP =
    * Σ_thresholds pc·prec@τ / n_pos, where prec@τ is the running
    * precision INCLUDING the tied block — tie-deterministic because no
    * within-tie order exists to disagree on, the PR companion of
    * [[aucRank]]'s rank-statistic ROC AUC (ROC flatters heavy-negative
    * corpora; PR does not). NULL when no positives. Output one row:
    * (n_pos, n_neg, ap_e6).
    *
    * Scale: the [[aucRank]] contract — one score-keyed count aggregate
    * off the raw scan, then the sweep window on the DISTINCT-value
    * axis only. */
  def prAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byVal = df.select(col(scoreCol).cast("long").as("v"),
        when(col(labelCol), 1L).otherwise(0L).as("pos"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("pc"))
    val ord = Window.orderBy(col("v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byVal
      .withColumn("cum_cnt", sum(col("cnt")).over(ord))
      .withColumn("cum_pos", sum(col("pc")).over(ord))
      .withColumn("prec_e6", expr("cum_pos * 1000000 div cum_cnt"))
      .agg(sum(col("pc")).as("n_pos"),
        sum(col("cnt") - col("pc")).as("n_neg"),
        sum(col("pc") * col("prec_e6")).as("apn"))
      .selectExpr("n_pos", "n_neg",
        """CASE WHEN n_pos = 0 THEN NULL
          |     ELSE CAST(apn div n_pos AS BIGINT)
          |END AS ap_e6""".stripMargin)
  }

  def retrievalMetrics(df: DataFrame, groupCol: String, rankCol: String,
                       relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.select(col(groupCol).as("g"), col(rankCol).as("rank"),
        col(relCol).cast("long").as("rel"))
      .groupBy(col("g"))
      .agg(sum(when(col("rank") <= k && col("rel") > 0, 1L).otherwise(0L))
          .as("n_rel_at_k"),
        min(when(col("rel") > 0, col("rank"))).as("first_rel_rank"))
      .withColumn("prec_e6", expr(s"n_rel_at_k * 1000000 div ${k}L"))
      .withColumn("mrr_e6", expr("1000000 div first_rel_rank"))
  }

  /** NDCG@k per group — ranking-quality evaluation with the engine's
    * portable fixed-point log₂ ([[Bm25.log2E6]]: exact msb + 5-bit
    * mantissa), so the metric hash-matches across engines where a float
    * log never would. Linear gain (rel, not 2^rel−1); discount
    * 1/log₂(rank+1); the IDEAL ranking orders the FULL candidate set by
    * (rel desc, predicted rank) — predicted rank as the tie-break makes
    * the ideal deterministic without changing IDCG (ties share rel).
    *
    * Input (group, rank, rel): `rank` 1-based predicted order, `rel`
    * integer grade ≥ 0. Output per group: dcg_e6, idcg_e6, ndcg_e6.
    * Both rank windows and the aggregate partition by group — ONE
    * exchange.
    */
  def ndcgAtK(df: DataFrame, groupCol: String, rankCol: String,
              relCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ideal = Window.partitionBy(col("g"))
      .orderBy(col("rel").desc, col("rank"))
    df.select(col(groupCol).as("g"), col(rankCol).as("rank"),
        col(relCol).cast("long").as("rel"))
      .withColumn("irank", row_number().over(ideal).cast("long"))
      .withColumn("l2p", Bm25.log2E6(col("rank") + 1))
      .withColumn("l2i", Bm25.log2E6(col("irank") + 1))
      .withColumn("c_pred", when(col("rank") <= k,
        expr("(rel * 1000000000000L) div l2p")).otherwise(lit(0L)))
      .withColumn("c_ideal", when(col("irank") <= k,
        expr("(rel * 1000000000000L) div l2i")).otherwise(lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("c_pred")).as("dcg_e6"), sum(col("c_ideal")).as("idcg_e6"))
      .withColumn("ndcg_e6",
        expr("dcg_e6 * 1000000 div nullif(idcg_e6, 0)"))
  }
}
