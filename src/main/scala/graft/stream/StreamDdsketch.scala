package graft.stream

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.{Bm25, Sketches}

/** The DDSketch-style log-bucket quantile sketch as STREAMING state —
  * the batch sketch ([[Sketches.logBucketSketch]]) pairs with
  * `transformWithState` exactly because its state is a bounded map of
  * (log-bucket → count): ~64/k buckets per key regardless of stream
  * length, no watermark, no eviction (counts are monotone). Each
  * trigger emits the CURRENT landing bucket + fixed-point
  * representative value per requested percentile, so the stream
  * continuously serves the same answer [[Sketches.logBucketQuantile]]
  * gives in batch — the spec proves the two agree on identical input,
  * split across arbitrary batch boundaries.
  */
object StreamDdsketch {

  case class Obs(key: String, value: Long)
  /** One row per (key, percentile) per trigger: the sketch's landing
    * bucket, the subject count at emit time, and the integer
    * representative value 2^((bucket+½)·k) from the shared 2^x table. */
  case class QuantileRow(key: String, p_e6: Long, n: Long, bucket: Long,
                         rep_value: Long)

  /** Pure-Scala twin of [[Sketches.logBucketSketch]]'s bucketing. */
  def bucketOf(value: Long, kE6: Long): Long =
    Bm25.log2E6Int(math.max(1L, value)) / kE6

  /** Pure-Scala twin of [[Sketches.pow2E6Expr]] for the representative
    * value at the bucket's midpoint exponent. */
  def repValue(bucket: Long, kE6: Long): Long = {
    val x = bucket * kE6 + kE6 / 2
    (1L << (x / 1000000L).toInt) *
      Sketches.pow2MantissaE6(((x % 1000000L) * 32 / 1000000L).toInt) / 1000000L
  }

  class DdsketchProcessor(kE6: Long, psE6: Seq[Long])
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Obs, QuantileRow] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, MapState}
    @transient private var st: MapState[Long, Long] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[Long, Long]("buckets",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[QuantileRow] = {
      rows.foreach { o =>
        val b = bucketOf(o.value, kE6)
        val c = if (st.containsKey(b)) st.getValue(b) else 0L
        st.updateValue(b, c + 1L)
      }
      // bounded walk: the map holds at most ~(64e6/kE6) buckets
      val buckets = st.iterator().map(p => (p._1, p._2)).toSeq.sortBy(_._1)
      val n = buckets.map(_._2).sum
      psE6.iterator.map { p =>
        val target = (p * n + 999999L) / 1000000L // ceil(p·n)
        var cum = 0L
        var landing = buckets.head._1
        val it = buckets.iterator
        var found = false
        while (it.hasNext && !found) {
          val (b, c) = it.next()
          cum += c
          if (cum >= target) { landing = b; found = true }
        }
        QuantileRow(key, p, n, landing, repValue(landing, kE6))
      }
    }
  }

  /** Per-trigger quantile readout over the running per-key sketch.
    * `kE6` is the bucket width in e6 log₂ units (same contract as the
    * batch sketch); `psE6` the percentiles in e6. Streaming frames
    * only; RocksDB provider recommended for large key spaces. */
  def quantiles(ds: Dataset[Obs], kE6: Long,
                psE6: Seq[Long]): Dataset[QuantileRow] = {
    require(kE6 >= 1000L && kE6 <= 1000000L, "kE6 must be in [1e3, 1e6]")
    require(psE6.nonEmpty && psE6.forall(p => p >= 0L && p <= 1000000L),
      "percentiles must be e6 in [0, 1e6]")
    val spark = ds.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    ds.groupByKey(_.key)
      .transformWithState(new DdsketchProcessor(kE6, psE6),
        TimeMode.None(), OutputMode.Append)
  }
}
