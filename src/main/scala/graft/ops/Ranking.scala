package graft.ops

import org.apache.spark.sql.DataFrame
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
}
