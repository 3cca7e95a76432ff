package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

case class Scored(vec_id: Long, cos: Double)
case class TopKBuf(items: Seq[Scored])

/** Bounded top-k as a typed Aggregator: the buffer never exceeds k
  * entries, so a global top-k over N rows moves O(k) state per partition
  * through the merge tree instead of sorting N rows — the aggregator
  * equivalent of TakeOrdered, usable inside any groupBy. Deterministic
  * tie-break: (-score, vec_id). */
class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {
  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.cos, x.vec_id)).take(k)

  override def zero: TopKBuf = TopKBuf(Nil)
  override def reduce(b: TopKBuf, a: Scored): TopKBuf = TopKBuf(trim(b.items :+ a))
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = TopKBuf(trim(a.items ++ b.items))
  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
