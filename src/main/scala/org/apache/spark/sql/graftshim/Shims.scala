package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` surface for Spark 4.x, where
  * `new Column(expr)` no longer exists (Column is ColumnNode-based). Lives
  * under org.apache.spark.sql so the package-private members resolve; keep
  * this file to the absolute minimum — all engine logic stays in `graft`.
  */
object Shims {
  /** Wrap a Catalyst Expression as a user-facing Column (Spark 4 classic). */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Recover the Catalyst Expression behind a classic Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp Catalyst-expression function usable from SQL. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
