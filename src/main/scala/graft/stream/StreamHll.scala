package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sketches}

/** HyperLogLog on streams. Like the count-min table ([[StreamSketch]]),
  * HLL registers are state bounded BY CONSTRUCTION: per group key the
  * entire state is m=64 (bucket → max ρ) rows, independent of how many
  * distinct items flow through. max is monotone, so registers never
  * need eviction or a watermark — the safe streaming answer to
  * "distinct users per type over an unbounded stream", where a
  * streaming countDistinct would accumulate unbounded key state.
  *
  * Batch twin: `q_hll` (same hash, same ρ, same α₆₄ closed form) — the
  * oracle-checked pin of the register semantics.
  */
object StreamHll {

  /** Streaming register table: groups × ≤64 rows, outputMode update or
    * complete. Same (hash48 % 64, ρ of the next 26 bits) layout as
    * [[Sketches.hll]], so any epoch's snapshot estimates with
    * [[estimate]]. */
  def hllStream(df: DataFrame, group: String, itemCol: String): DataFrame = {
    val h = Dedup.hash48(col(itemCol).cast("string"), lit("hll"))
    df.select(col(group),
        (h % Sketches.hllM).as("bucket"),
        Sketches.hllRho(shiftright(h, 6).bitwiseAND(lit((1L << 26) - 1)))
          .as("rho"))
      .groupBy(col(group), col("bucket")).agg(max(col("rho")).as("r"))
  }

  /** Per-group cardinality estimate off a register snapshot (batch-side
    * read of the streaming state — the [[Sketches.hll]] closed form).
    * Absent registers need no grid join: each contributes 2^(rmax−0) =
    * 2^rmax to the harmonic sum, so the zero-fill folds into one term —
    * a single keyed aggregate, no self-join against the snapshot (which
    * would also trip conflicting-reference resolution on a memory
    * sink's plan). */
  def estimate(regs: DataFrame, group: String): DataFrame =
    regs.select(col(group), col("r").cast("long").as("r"))
      .groupBy(col(group))
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .select(col(group), expr("array_max(rs)").as("rmax"),
        expr("CAST(size(filter(rs, x -> x > 0)) AS BIGINT)")
          .as("nz_registers"),
        expr("aggregate(rs, 0L, (acc, x) -> acc + shiftleft(1L, " +
          "CAST(array_max(rs) - x AS INT))) + " +
          s"(${Sketches.hllM}L - size(rs)) * shiftleft(1L, " +
          "CAST(array_max(rs) AS INT))").as("s"))
      .select(col(group), col("rmax"), col("nz_registers"), col("s"),
        expr(s"709L * ${Sketches.hllM}L * ${Sketches.hllM}L * " +
          "shiftleft(1L, CAST(rmax AS INT)) div (s * 1000L)").as("est"))
}
