package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-Dataset input row for the argmax aggregator (micros epoch keeps
  * the buffer primitive-only — no nullable boxing in the hot path). */
case class PosRec(provider: String, vehicleId: String, ts_us: Long,
                  event_id: Long, lat: Double, lon: Double)

/** Custom UDAF surface (SURVEY.md §2.4 extension): per-key argmax by
  * (event time, event id) as an `org.apache.spark.sql.expressions
  * .Aggregator` — the fourth formulation of the reference's A2/A3 argmax
  * (join-back, max_by, row_number being the others; all four are
  * oracle-checked against the same SQL).
  *
  * The buffer is a single record (empty marked by ts_us = Long.MinValue),
  * so partial aggregation is O(1) state per key per partition — the same
  * merge shape `max_by` compiles to, here spelled out on the typed API.
  */
object LatestPositionAgg extends Aggregator[PosRec, PosRec, PosRec] {
  private val empty = PosRec(null, null, Long.MinValue, Long.MinValue, 0.0, 0.0)

  override def zero: PosRec = empty

  private def newer(a: PosRec, b: PosRec): PosRec =
    if (b.ts_us > a.ts_us || (b.ts_us == a.ts_us && b.event_id > a.event_id)) b else a

  override def reduce(buf: PosRec, in: PosRec): PosRec = newer(buf, in)
  override def merge(a: PosRec, b: PosRec): PosRec = newer(a, b)
  override def finish(buf: PosRec): PosRec = buf

  override def bufferEncoder: Encoder[PosRec] = Encoders.product[PosRec]
  override def outputEncoder: Encoder[PosRec] = Encoders.product[PosRec]
}
