package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Viterbi decoding as an ASSOCIATIVE max-plus matrix reduction — the
  * scale-first form of HMM dynamic programming. The textbook recursion
  * v_d = v_{d−1} ⊗ M_d is a sequential chain (T rounds, useless on a
  * cluster); but ⊗ (max-plus matrix product) is associative, so the
  * chain M_1 ⊗ … ⊗ M_{T−1} reduces pairwise in ⌈log₂ T⌉ rounds — each
  * round ONE keyed aggregate over idx div 2 that halves the frame. At
  * T = 10⁹ time steps that is 30 tiny shuffles instead of a billion
  * sequential steps; per-round state is the 2×2 score matrix per
  * segment (4 longs). Score-only (plus arg-end-state): full path
  * recovery adds the standard reverse sweep — same shape, another
  * log₂ T rounds.
  *
  * 2-state matrices ride as 4 columns (m00 m01 m10 m11), log-prob e6
  * integers; NEG (−10¹⁵) is the additive-identity sentinel — two
  * additions away from Long overflow, never more (each combine adds
  * exactly two entries).
  */
object Viterbi {

  val NEG: Long = -1000000000000000L

  /** Reduce `mats` (idx, m00, m01, m10, m11; idx 0-based dense) to the
    * single max-plus product matrix, left-to-right order preserved.
    * Bounded driver loop: ⌈log₂ n⌉ rounds, each one keyed aggregate
    * over a frame that HALVES; every round's result is eagerly
    * checkpointed (lineage would double per round otherwise). */
  def reduceMaxPlus(mats: DataFrame): DataFrame = {
    var m = mats.localCheckpoint(true)
    var n = m.count()
    while (n > 1) {
      val paired = m.groupBy(expr("idx div 2").as("idx"))
        .agg(
          max(when(col("idx") % 2 === 0, col("m00"))).as("a00"),
          max(when(col("idx") % 2 === 0, col("m01"))).as("a01"),
          max(when(col("idx") % 2 === 0, col("m10"))).as("a10"),
          max(when(col("idx") % 2 === 0, col("m11"))).as("a11"),
          max(when(col("idx") % 2 === 1, col("m00"))).as("b00"),
          max(when(col("idx") % 2 === 1, col("m01"))).as("b01"),
          max(when(col("idx") % 2 === 1, col("m10"))).as("b10"),
          max(when(col("idx") % 2 === 1, col("m11"))).as("b11"))
      // odd tail (no right element): pass the left through unchanged
      m = paired.selectExpr("idx",
          "CASE WHEN b00 IS NULL THEN a00 ELSE greatest(a00 + b00, a01 + b10) END AS m00",
          "CASE WHEN b00 IS NULL THEN a01 ELSE greatest(a00 + b01, a01 + b11) END AS m01",
          "CASE WHEN b00 IS NULL THEN a10 ELSE greatest(a10 + b00, a11 + b10) END AS m10",
          "CASE WHEN b00 IS NULL THEN a11 ELSE greatest(a10 + b01, a11 + b11) END AS m11")
        .localCheckpoint(true)
      n = (n + 1) / 2
    }
    m.select(col("m00"), col("m01"), col("m10"), col("m11"))
  }
}
