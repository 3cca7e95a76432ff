package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The transformWithState ports of the funnel and CUSUM detectors must
  * reproduce the flatMapGroupsWithState originals batch-for-batch,
  * including cross-batch state carry and late-event greediness; the TTL
  * construction path (ProcessingTime mode + TTLConfig) must not disturb
  * results inside a fast run where nothing expires. */
class TwsDetectorsSpec extends SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def collectStream[I: org.apache.spark.sql.Encoder, O](
      batches: Seq[Seq[I]], name: String)(
      pipe: Dataset[I] => Dataset[O]): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[I]
    val q = pipe(mem.toDS()).toDF().writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  /** For TimeMode.ProcessingTime pipelines: the engine schedules batches
    * CONTINUOUSLY so TTL sweeps and timers can fire without new data, so
    * `processAllAvailable` never settles — poll the sink to a row-count
    * deadline instead. */
  private def collectStreamPolled[I: org.apache.spark.sql.Encoder, O](
      batches: Seq[Seq[I]], name: String, expectRows: Int)(
      pipe: Dataset[I] => Dataset[O]): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[I]
    val q = pipe(mem.toDS()).toDF().writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      batches.foreach(b => mem.addData(b: _*))
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (spark.table(name).count() < expectRows &&
        q.exception.isEmpty && System.nanoTime() < deadline) Thread.sleep(200)
      q.exception.foreach(throw _)
      spark.table(name).collect().toSeq
    } finally q.stop()
  }

  private val steps = Seq("view", "click", "purchase")
  import StreamFunnel.FunnelEvent
  import StreamCusum.Point

  private val funnelBatches = Seq(
    Seq(FunnelEvent(1L, 10L, "view"), FunnelEvent(1L, 20L, "click"),
      FunnelEvent(2L, 5L, "purchase")),
    // late click@25 is a no-op at stage 2; purchase@30 advances cross-batch
    Seq(FunnelEvent(1L, 25L, "click"), FunnelEvent(1L, 30L, "purchase")))

  test("stagesTws matches flatMapGroupsWithState stages across batches") {
    withRocksDb {
      def norm(rows: Seq[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val fmgws = norm(collectStream(funnelBatches, "funnel_fmgws")(
        (ds: Dataset[FunnelEvent]) => StreamFunnel.stages(ds, steps)))
      val tws = norm(collectStream(funnelBatches, "funnel_tws")(
        (ds: Dataset[FunnelEvent]) => StreamFunnel.stagesTws(ds, steps)))
      assert(tws === fmgws)
      assert(tws === Set((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L)))
    }
  }

  test("stagesTws with a TTL that never fires is behavior-identical") {
    withRocksDb {
      val got = collectStreamPolled(funnelBatches, "funnel_tws_ttl", 3)(
        (ds: Dataset[FunnelEvent]) => StreamFunnel.stagesTws(ds, steps,
          Some(java.time.Duration.ofHours(1))))
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got === Set((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L)))
    }
  }

  test("alarmsTws matches flatMapGroupsWithState alarms across batches") {
    withRocksDb {
      // drift 55, +45 per point: s crosses 200 at the 5th point
      val batches = Seq(
        (1L to 3L).map(t => Point("k", t, 100L)),
        (4L to 6L).map(t => Point("k", t, 100L)))
      def norm(rows: Seq[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val fmgws = norm(collectStream(batches, "cusum_fmgws")(
        (ds: Dataset[Point]) => StreamCusum.alarms(ds, 50L, 5L, 200L)))
      val tws = norm(collectStream(batches, "cusum_tws")(
        (ds: Dataset[Point]) => StreamCusum.alarmsTws(ds, 50L, 5L, 200L)))
      assert(tws === fmgws)
      assert(tws.nonEmpty)
    }
  }

  test("alarmsTws emits the exact crossing rows") {
    withRocksDb {
      val batches = Seq(
        (1L to 3L).map(t => Point("k", t, 100L)),
        (4L to 6L).map(t => Point("k", t, 100L)))
      val got = collectStreamPolled(batches, "cusum_tws_exact", 2)(
        (ds: Dataset[Point]) => StreamCusum.alarmsTws(ds, 50L, 5L, 200L,
          Some(java.time.Duration.ofHours(1))))
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set(("k", 5L, 225L), ("k", 6L, 270L)))
    }
  }

  // level 100 for 3 points then 200 for 3, delta=10: u walks -10,-20,-30
  // then +35,+85,+125 against minu=-30 -> ph 0,0,0,65,115,155; alarms
  // (threshold 100) fire at t=5,6. Cross-batch carry is load-bearing:
  // the mean mu=cx/t at t=4 uses the first batch's prefix sum.
  private val phBatches = Seq(
    (1L to 3L).map(t => StreamPageHinkley.Point("k", t, 100L)),
    (4L to 6L).map(t => StreamPageHinkley.Point("k", t, 200L)))

  test("PageHinkley detectTws matches detect across batches") {
    withRocksDb {
      def norm(rows: Seq[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      val fmgws = norm(collectStream(phBatches, "ph_fmgws")(
        (ds: Dataset[StreamPageHinkley.Point]) =>
          StreamPageHinkley.detect(ds, 10L, 100L)))
      val tws = norm(collectStream(phBatches, "ph_tws")(
        (ds: Dataset[StreamPageHinkley.Point]) =>
          StreamPageHinkley.detectTws(ds, 10L, 100L)))
      assert(tws === fmgws)
      assert(tws === Set(("k", 1L, 0L, false), ("k", 2L, 0L, false),
        ("k", 3L, 0L, false), ("k", 4L, 65L, false),
        ("k", 5L, 115L, true), ("k", 6L, 155L, true)))
    }
  }

  test("PageHinkley detectTws with a never-firing TTL is behavior-identical") {
    withRocksDb {
      val got = collectStreamPolled(phBatches, "ph_tws_ttl", 6)(
        (ds: Dataset[StreamPageHinkley.Point]) =>
          StreamPageHinkley.detectTws(ds, 10L, 100L,
            Some(java.time.Duration.ofHours(1))))
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3))).toSet
      assert(got === Set(("k", 1L, 0L, false), ("k", 2L, 0L, false),
        ("k", 3L, 0L, false), ("k", 4L, 65L, false),
        ("k", 5L, 115L, true), ("k", 6L, 155L, true)))
    }
  }
}
