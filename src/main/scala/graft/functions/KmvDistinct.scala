package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.graftshim.Shims

/** Approximate-distinct via a K-Minimum-Values sketch (Bar-Yossef et al.,
  * "Counting distinct elements in a data stream"; the estimator behind
  * theta sketches). State is the k smallest distinct 48-bit hashes of the
  * input; the estimate is `(k-1) * 2^48 / h_(k)` (k-th smallest hash), or
  * the exact buffer size when fewer than k distinct values were seen.
  *
  * Chosen over HyperLogLog deliberately: the whole estimator is integer
  * arithmetic over a portable hash (first 12 hex chars of
  * `md5('kmv|' || value)`, the same [[graft.ops.Dedup.hash48]] scheme), so
  * any ANSI engine reproduces it bit-for-bit from SQL — the sketch output
  * itself is DuckDB-oracle-checkable, where HLL's small-range linear
  * counting needs `ln` and floats. Accuracy: rsd ~ 1/sqrt(k-2) (~13% at
  * the default k=64); exact below k.
  *
  * Scale: O(k) state per group in every phase (partial aggregate per
  * partition, one shuffle of k longs per group, merge = sorted-union
  * trim), the same contract `approx_count_distinct`'s HLL buffer has.
  */
case class KmvDistinct(child: Expression,
                       k: Int = 64,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 2, "kmv_distinct needs k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  private val hashSpace = 1L << 48

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  /** 48-bit portable hash: first 6 bytes of md5("kmv|" + v), big-endian —
    * exactly `conv(substring(md5(concat('kmv','|',v)), 1, 12), 16, 10)`. */
  private def hash48(v: String): Long = {
    md.reset()
    val d = md.digest(("kmv|" + v).getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 6) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = hash48(v.toString)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last && !buf.contains(h)) { buf.add(h); buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Long], other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toLong
    else (k - 1).toLong * hashSpace / buf.last

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)

  override def prettyName: String = "kmv_distinct"
}

object KmvDistinct {
  def kmv_distinct(c: Column, k: Int = 64): Column =
    Shims.column(KmvDistinct(Shims.expression(c), k).toAggregateExpression())
}
