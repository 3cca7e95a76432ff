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

  /** Inclusive max-plus PREFIX products of `mats` (idx 0-based dense):
    * row idx ends up holding M_0 ⊗ … ⊗ M_idx (or the SUFFIX product
    * M_idx ⊗ … ⊗ M_{n−1} when `forward` is false). Hillis–Steele scan:
    * ⌈log₂ n⌉ rounds, each ONE self-join of the axis against itself
    * shifted by the round's offset — the distributed replacement for
    * sequential Viterbi backtracking (per-position forward⊗backward
    * scores fall out of the two scans). Each round checkpoints: the
    * frame is the bounded time axis, not the data volume. */
  def scanMaxPlus(mats: DataFrame, forward: Boolean = true): DataFrame = {
    var m = mats.localCheckpoint(false)
    val n = m.count()
    var off = 1L
    while (off < n) {
      val shifted = m.selectExpr(
        s"idx ${if (forward) "+" else "-"} ${off}L AS idx",
        "m00 AS s00", "m01 AS s01", "m10 AS s10", "m11 AS s11")
      // left operand is the EARLIER segment in chain order: for the
      // forward scan that is the shifted row, for the suffix scan the
      // unshifted row
      val (a, bPfx) = if (forward) ("s", "m") else ("m", "s")
      m = m.join(shifted, Seq("idx"), "left")
        .selectExpr("idx",
          s"CASE WHEN s00 IS NULL THEN m00 ELSE greatest(${a}00 + ${bPfx}00, ${a}01 + ${bPfx}10) END AS m00",
          s"CASE WHEN s00 IS NULL THEN m01 ELSE greatest(${a}00 + ${bPfx}01, ${a}01 + ${bPfx}11) END AS m01",
          s"CASE WHEN s00 IS NULL THEN m10 ELSE greatest(${a}10 + ${bPfx}00, ${a}11 + ${bPfx}10) END AS m10",
          s"CASE WHEN s00 IS NULL THEN m11 ELSE greatest(${a}10 + ${bPfx}01, ${a}11 + ${bPfx}11) END AS m11")
        .localCheckpoint(false)
      off *= 2
    }
    m
  }

  /** Reduce `mats` (idx, m00, m01, m10, m11; idx 0-based dense) to the
    * single max-plus product matrix, left-to-right order preserved.
    * Bounded driver loop: ⌈log₂ n⌉ rounds, each one keyed aggregate
    * over a frame that HALVES; every round's result is eagerly
    * checkpointed (lineage would double per round otherwise). */
  def reduceMaxPlus(mats: DataFrame): DataFrame = {
    var m = mats.localCheckpoint(false)
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
        .localCheckpoint(false)
      n = (n + 1) / 2
    }
    m.select(col("m00"), col("m01"), col("m10"), col("m11"))
  }
}
