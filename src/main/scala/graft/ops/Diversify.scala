package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result diversification for retrieval pipelines: Maximal Marginal
  * Relevance (Carbonell & Goldstein 1998) re-ranking of a candidate set.
  *
  * MMR is inherently greedy-sequential — each pick depends on everything
  * picked so far — so the DISTRIBUTED shape is: candidate generation
  * (top-N by relevance) stays a full-scale scan + TakeOrdered, and the
  * k-round greedy runs over the N-sized candidate frame only (N and k
  * are user-constants, never data-sized). At 100 TB the corpus pass is
  * the only heavy stage; the re-rank costs k tiny argmax aggregates over
  * broadcast-sized frames.
  *
  * All scores are caller-supplied INTEGERS (e6-quantized inner products
  * in the shipped query), so the pick sequence is bit-deterministic and
  * oracle-replayable — no float tie ambiguity.
  */
object Diversify {

  /** Greedy MMR over `cands` (id, rel) with pairwise similarities `sims`
    * (a, b, sim) — both directions present for every unordered candidate
    * pair. With λ = ½ the margin is score₂ = 2·MMR = rel − max sim to
    * the selected set; the first pick (empty set) scores its plain
    * relevance. Ties break toward the smaller id at every round.
    * Output: (pick, id, rel, mmr2) for picks 1..k. */
  def mmr(cands: DataFrame, sims: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 16, "k must be in [1, 16]")
    val c = cands.select(col("id"), col("rel")).localCheckpoint(false)
    val sm = sims.select(col("a"), col("b"), col("sim")).localCheckpoint(false)
    var selected = c
      .agg(max(struct(col("rel"), (-col("id")).as("ni"))).as("f"))
      .select((-col("f.ni")).as("id"), col("f.rel").as("rel"),
        col("f.rel").as("mmr2"), lit(1L).as("pick"))
      .localCheckpoint(false)
    var r = 1
    while (r < k) {
      r += 1
      val rem = c.join(selected.select(col("id")), Seq("id"), "left_anti")
      val pick = rem
        .join(sm, rem("id") === sm("a"))
        .join(selected.select(col("id").as("b")), Seq("b"))
        .groupBy(col("id"), col("rel"))
        .agg(max(col("sim")).as("ms"))
        .withColumn("sc", col("rel") - col("ms"))
        .agg(max(struct(col("sc"), (-col("id")).as("ni"),
          col("rel"))).as("f"))
        .select((-col("f.ni")).as("id"), col("f.rel").as("rel"),
          col("f.sc").as("mmr2"), lit(r.toLong).as("pick"))
      selected = selected.unionByName(pick).localCheckpoint(false)
    }
    selected.select(col("pick"), col("id"), col("rel"), col("mmr2"))
  }
}
