package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class StreamOhlcSpec extends SparkSpec {
  import spark.implicits._
  import StreamOhlc.Tick

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
  private val base = 1704103200L // 2024-01-01T10:00:00Z, minute-aligned

  test("candles emit once per closed window with exact OHLC, in watermark order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Tick]
    val q = StreamOhlc.candles(in.toDS(), "60 seconds", "30 seconds")
      .writeStream.format("memory").queryName("ohlc_stream")
      .outputMode("append").start()
    try {
      // window [10:00,10:01): open=100 (t+1), high=180, low=90, close=90
      // (t+50); out-of-order arrival inside the batch must not matter
      in.addData(
        Tick("A", ts(base + 20), 2L, 180L),
        Tick("A", ts(base + 1), 1L, 100L),
        Tick("A", ts(base + 50), 3L, 90L),
        Tick("B", ts(base + 10), 4L, 500L))
      q.processAllAvailable()
      assert(spark.table("ohlc_stream").count() === 0,
        "no candle may emit before the watermark closes its window")

      // advance the watermark past 10:01 (wm = 10:02:10 - 30s = 10:01:40)
      in.addData(Tick("A", ts(base + 130), 5L, 110L))
      q.processAllAvailable()
      val got = spark.table("ohlc_stream")
        .select(col("sym"), col("open_c"), col("high_c"), col("low_c"),
          col("close_c"), col("volume"), col("amount_c"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === Set(
        ("A", 100L, 180L, 90L, 90L, 3L, 370L),
        ("B", 500L, 500L, 500L, 500L, 1L, 500L)))

      // a late tick for the CLOSED window is dropped, not re-emitted
      in.addData(Tick("A", ts(base + 30), 6L, 999L))
      q.processAllAvailable()
      assert(spark.table("ohlc_stream").count() === 2,
        "closed candles must never re-emit on late data")
    } finally q.stop()
  }

  test("streamed candles equal the rank-window batch twin on the same ticks") {
    implicit val sqlCtx = spark.sqlContext
    val ticks = Seq(
      Tick("A", ts(base + 5), 1L, 300L), Tick("A", ts(base + 5), 2L, 250L),
      Tick("A", ts(base + 40), 3L, 400L), Tick("B", ts(base + 15), 4L, 70L),
      Tick("B", ts(base + 59), 5L, 80L), Tick("A", ts(base + 70), 6L, 350L))
    val in = MemoryStream[Tick]
    val q = StreamOhlc.candles(in.toDS(), "60 seconds", "10 seconds")
      .writeStream.format("memory").queryName("ohlc_twin")
      .outputMode("append").start()
    try {
      in.addData(ticks: _*)
      // push the watermark far past every window
      in.addData(Tick("Z", ts(base + 9999), 99L, 1L))
      q.processAllAvailable()
      val streamed = spark.table("ohlc_twin")
        .filter(col("sym") =!= "Z")
        .select(col("sym"), unix_timestamp(col("wstart")).as("w"),
          col("open_c"), col("high_c"), col("low_c"), col("close_c"),
          col("volume"), col("amount_c"))
      // the q_ohlc_candles formulation (rank windows over the unique
      // (ts, tick_id) order) applied to the same bounded ticks
      val grp = Window.partitionBy(col("sym"), col("w"))
      val batch = ticks.toDS().toDF()
        .select(col("sym"), (unix_seconds(col("ts")) - unix_seconds(col("ts")) % 60).as("w"),
          col("ts"), col("tick_id"), col("cents"))
        .withColumn("ra",
          row_number().over(grp.orderBy(col("ts"), col("tick_id"))))
        .withColumn("rd",
          row_number().over(grp.orderBy(col("ts").desc, col("tick_id").desc)))
        .groupBy(col("sym"), col("w"))
        .agg(max(when(col("ra") === 1, col("cents"))).as("open_c"),
          max(col("cents")).as("high_c"), min(col("cents")).as("low_c"),
          max(when(col("rd") === 1, col("cents"))).as("close_c"),
          count(lit(1)).as("volume"), sum(col("cents")).as("amount_c"))
      assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
        "stream candles diverge from the rank-window batch twin")
      assert(streamed.count() === 3) // A has two windows, B one
    } finally q.stop()
  }
}
