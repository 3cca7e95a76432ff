package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Shims

/** Column-level bit helpers that `functions._` lacks (its shift functions
  * only accept literal counts). */
object BitOps {

  /** Right-shift `v` by a COLUMN amount — Catalyst ShiftRight via the
    * Spark-4 shim. */
  def shiftRight(v: Column, amount: Column): Column =
    Shims.column(org.apache.spark.sql.catalyst.expressions.ShiftRight(
      Shims.expression(v), Shims.expression(amount.cast("int"))))
}
