package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Dedup

/** KMV (k-minimum-values / theta) distinct-count sketch as EXPLICIT
  * keyed streaming state — the third bounded-state sketch surface
  * beside [[StreamSketch]] (count-min) and [[StreamHll]] (registers).
  * Per key the entire state is the ≤k smallest distinct 48-bit hashes;
  * inserting a batch is a sorted-merge + truncate, so state is k longs
  * per key forever, no watermark, no eviction. Unlike HLL the sketch
  * also supports set algebra (union/intersect via θ — see
  * [[graft.ops.Sketches.thetaSetOps]]), which is why a pipeline keeps
  * both. Only keys whose sketch CHANGED emit a row per batch (delta
  * semantics, the [[StatefulLatest]] convention).
  *
  * Batch twin: `q_kmv_maintain` / `q_kmv_set_ops` (same hash, same
  * (k−1)·2⁴⁸ div θ estimator) — oracle-checked pins of the sketch
  * semantics.
  */
object StreamKmv {
  val maxH48: Long = 281474976710656L // 2^48

  case class KmvRow(g: String, h: Long)
  case class KmvState(hs: Vector[Long])
  case class KmvOut(g: String, n_sketch: Int, kth: Long, est: Long)

  private def out(g: String, hs: Vector[Long], k: Int): KmvOut = {
    val est = if (hs.size < k) hs.size.toLong
      else (k - 1).toLong * maxH48 / hs.last
    KmvOut(g, hs.size, if (hs.size < k) 0L else hs.last, est)
  }

  private def update(k: Int)(key: String, rows: Iterator[KmvRow],
                             state: GroupState[KmvState]): Iterator[KmvOut] = {
    val prev = state.getOption.map(_.hs).getOrElse(Vector.empty)
    val merged = (prev ++ rows.map(_.h)).distinct.sorted.take(k)
    if (merged == prev) Iterator.empty
    else { state.update(KmvState(merged)); Iterator(out(key, merged, k)) }
  }

  /** Streaming sketch over `df(groupCol, itemCol)`: emits the changed
    * sketches' (group, n_sketch, kth, est) per micro-batch. Works on
    * batch frames too (one "batch" pass). */
  def kmvStream(df: DataFrame, group: String, itemCol: String,
                k: Int = 64): Dataset[KmvOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(group).cast("string").as("g"),
        Dedup.hash48(col(itemCol).cast("string"), lit("kmv")).as("h"))
      .as[KmvRow]
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update(k))
  }
}
