package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftshim.Shims

/** The `TypedImperativeAggregate` surface (the machinery behind sketches
  * like HLL/QuantileSummaries): an exact-distinct counter over a long
  * column with an imperative hash-set buffer and explicit binary
  * serialization for partial-aggregate shuffle. Exact — so it is
  * oracle-checkable against `count(DISTINCT x)` — while exercising the
  * same buffer lifecycle an approximate sketch would use (create, update,
  * merge across partitions, serialize/deserialize, eval).
  *
  * Scale note: memory is O(distinct-per-group) per partition; for
  * unbounded cardinalities swap the buffer for an HLL (same class shape,
  * same shuffle contract) — which is what `approx_count_distinct` does.
  */
case class ExactDistinct(child: Expression,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashSet[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    child.eval(input) match {
      case null => ()
      case l: java.lang.Long => buf.add(l)
      case i: java.lang.Integer => buf.add(i.longValue())
      case sh: java.lang.Short => buf.add(sh.longValue())
      case b: java.lang.Byte => buf.add(b.longValue())
      case other => throw new IllegalArgumentException(
        s"exact_distinct_sketch requires an integral column, got ${other.getClass.getSimpleName}")
    }
    buf
  }

  override def merge(buf: java.util.HashSet[Long], other: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    buf.addAll(other); buf
  }

  override def eval(buf: java.util.HashSet[Long]): Any = buf.size.toLong

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.HashSet[Long](Math.max(16, n * 2))
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): ExactDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)

  override def prettyName: String = "exact_distinct_sketch"
}

object ExactDistinct {
  def exact_distinct(c: Column): Column =
    Shims.column(ExactDistinct(Shims.expression(c)).toAggregateExpression())
}
