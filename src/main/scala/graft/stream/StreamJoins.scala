package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (absent from the reference — SURVEY.md §2.6 — but
  * table stakes for a streaming engine). Structured Streaming requires
  * BOTH sides watermarked plus an event-time range in the join condition
  * so each side's buffered state is provably prunable; an unbounded
  * equi-join would buffer both streams forever.
  *
  * Scale: state per side is (watermark + tolerance) worth of rows, hash-
  * partitioned on the key — the same shuffle a batch equi-join does, plus
  * the state store. Widen `tolerance` and state grows linearly; that is
  * the knob to surface, not hide.
  */
object StreamJoins {

  /** Inner interval join: rows match when keys are equal and `rightTs` is
    * within ±`tolerance` of `leftTs`. Both inputs must already carry
    * watermarks on their respective time columns. Time columns are resolved
    * against their own side (`left(leftTs)`/`right(rightTs)`), so the two
    * streams may use the SAME timestamp column name without ambiguity. */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String, tolerance: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) - expr(s"interval $tolerance") &&
        right(rightTs) <= left(leftTs) + expr(s"interval $tolerance"),
      "inner")
      .drop(right(key))

  /** LEFT OUTER interval join — the semantically hard variant: a left
    * row that finds no right match within ±`tolerance` is NOT dropped;
    * it is emitted null-padded, but only once BOTH watermarks have
    * passed the point where a match could still arrive (the engine must
    * prove absence, not just observe it — hence outer emissions lag the
    * watermark, never the data). Same state bound as the inner form.
    * Batch twin: a plain left_outer join with the same range predicate
    * (`q_interval_left_outer`), where absence is provable immediately. */
  def joinLeftOuterWithin(left: DataFrame, right: DataFrame, key: String,
                          leftTs: String, rightTs: String,
                          tolerance: String): DataFrame =
    left.join(right,
      left(key) === right(key) &&
        right(rightTs) >= left(leftTs) - expr(s"interval $tolerance") &&
        right(rightTs) <= left(leftTs) + expr(s"interval $tolerance"),
      "left_outer")
      .drop(right(key))
}
