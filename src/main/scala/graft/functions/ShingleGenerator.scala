package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.unsafe.types.UTF8String

/** Native table-generating function (UDTF surface): word k-shingles of a
  * text column, one output row per shingle. The reference has no Generator
  * operator (SURVEY.md §2.4); this is the designed extension exercising
  * Spark's `Generator` — the same machinery behind `explode` — so shingling
  * runs as a `Generate` physical node (streamed, never materializing the
  * shingle array per row, unlike split+transform+explode which builds the
  * full array first).
  *
  * Documents with fewer than k words produce no rows (same contract as
  * [[graft.ops.Dedup.shingles]]).
  */
case class ShingleGenerator(text: Expression, kExpr: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, kExpr)

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Nil
    else {
      val k = kExpr.eval(input).asInstanceOf[Int]
      val words = t.toString.split(" ", -1)
      if (words.length < k) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        private val sb = new java.lang.StringBuilder
        def hasNext: Boolean = i <= words.length - k
        def next(): InternalRow = {
          sb.setLength(0)
          var j = 0
          while (j < k) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j)); j += 1
          }
          i += 1
          InternalRow(UTF8String.fromString(sb.toString))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "shingles"
}

object ShingleGenerator {
  def shingles(text: Column, k: Int): Column =
    Shims.column(ShingleGenerator(Shims.expression(text), Literal(k)))
}
