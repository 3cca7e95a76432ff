package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-epoch replay diff (SURVEY §7.4m): the existing stream↔batch twins
  * prove FINAL-state equality; this spec pins emission TIMING. It drives
  * known epochs through the windowed-count pipeline and diffs each
  * epoch's append-mode emissions against an independent reimplementation
  * of the watermark contract:
  *
  *   - watermark before epoch k = max event time over epochs < k − delay
  *     (a batch never drops rows on the strength of its own maximum);
  *   - an event is accepted iff its window END > that watermark;
  *   - a window emits (once, with its accepted count) in the first epoch
  *     whose post-epoch watermark ≥ window end.
  *
  * If Spark ever emitted early (before the watermark proves the window
  * closed), late (a stuck no-data batch), or re-emitted after accepting
  * a too-late row, the per-epoch diff — not just the final union —
  * would catch it.
  */
class StreamReplayDiffSpec extends SparkSpec {
  import spark.implicits._

  private val winS = 60L
  private val delayS = 120L

  /** Independent watermark-contract replay: expected CUMULATIVE emitted
    * set after each epoch, as (windowStartEpochSec, count). */
  private def expectedCumulative(epochs: Seq[Seq[Long]]): Seq[Map[Long, Long]] = {
    val counts = scala.collection.mutable.Map[Long, Long]()
    val emitted = scala.collection.mutable.Map[Long, Long]()
    var maxTs = Long.MinValue
    epochs.map { es =>
      val wmBefore = if (maxTs == Long.MinValue) Long.MinValue else maxTs - delayS
      es.foreach { ts =>
        val wstart = ts - (ts % winS)
        if (wstart + winS > wmBefore) // accepted: window still open
          counts(wstart) = counts.getOrElse(wstart, 0L) + 1L
      }
      maxTs = math.max(maxTs, if (es.isEmpty) Long.MinValue else es.max)
      val wmAfter = if (maxTs == Long.MinValue) Long.MinValue else maxTs - delayS
      counts.keys.toSeq.filter(w => w + winS <= wmAfter && !emitted.contains(w))
        .foreach(w => emitted(w) = counts(w))
      emitted.toMap
    }
  }

  test("windowed count emits exactly per the watermark-derived schedule, epoch by epoch") {
    implicit val sqlCtx = spark.sqlContext
    val base = 1704103200L // 2024-01-01T10:00:00Z, window-aligned
    val epochs: Seq[Seq[Long]] = Seq(
      Seq(base + 30, base + 70),  // windows 10:00, 10:01 — nothing closes
      Seq(base + 330),            // wm→10:03:30: closes 10:00 and 10:01
      Seq(base + 80),             // LATE for closed 10:01 → dropped
      Seq(base + 600),            // wm→10:08: closes 10:05
      Seq(base + 1800))           // wm→10:28: closes 10:10
    val expect = expectedCumulative(epochs)

    val mem = MemoryStream[Long]
    val agg = mem.toDF().toDF("sec")
      .withColumn("ts", timestamp_seconds($"sec")).drop("sec")
      .withWatermark("ts", s"$delayS seconds")
      .groupBy(window($"ts", s"$winS seconds"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"window.start").as("wstart"), $"n")

    val got = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val q = agg.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized {
          got ++= df.collect().map(r => (r.getLong(0), r.getLong(1)))
        }
        ()
      }.start()
    try {
      epochs.zip(expect).zipWithIndex.foreach { case ((es, exp), i) =>
        mem.addData(es)
        q.processAllAvailable()
        val cum = got.synchronized(got.toMap)
        assert(cum === exp,
          s"after epoch $i: emitted $cum, watermark contract says $exp")
        assert(got.synchronized(got.size) === exp.size,
          s"after epoch $i: a window emitted twice")
      }
    } finally q.stop()
  }
}
