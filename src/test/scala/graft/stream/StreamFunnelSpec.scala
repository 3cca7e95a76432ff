package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamFunnel.{FunnelEvent, StageAdvance}

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("stage advances accumulate across micro-batches, stale events ignored") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamFunnel.stages(in.toDS(), steps)
      .writeStream.format("memory").queryName("sfn").outputMode("append").start()
    try {
      // batch 1: u1 reaches stage 2; u2 stalls at 0 (click before view)
      in.addData(
        FunnelEvent(1L, 10L, "view"), FunnelEvent(1L, 20L, "click"),
        FunnelEvent(2L, 10L, "click"))
      q.processAllAvailable()
      val b1 = spark.table("sfn").as[StageAdvance].collect().toSet
      assert(b1 === Set(StageAdvance(1L, 1, 10L), StageAdvance(1L, 2, 20L)))

      // batch 2: u1 converts; a time-traveling purchase at t=5 for u2 is
      // ignored (stage 0 wants a view); u2 then starts the funnel
      in.addData(
        FunnelEvent(1L, 30L, "purchase"),
        FunnelEvent(2L, 5L, "purchase"), FunnelEvent(2L, 50L, "view"))
      q.processAllAvailable()
      val b2 = spark.table("sfn").as[StageAdvance].collect().toSet
      assert(b2 === b1 ++ Set(StageAdvance(1L, 3, 30L), StageAdvance(2L, 1, 50L)))

      // batch 3: event at exactly the reach time does not advance (strict);
      // a later one does
      in.addData(FunnelEvent(2L, 50L, "click"), FunnelEvent(2L, 60L, "click"))
      q.processAllAvailable()
      val b3 = spark.table("sfn").as[StageAdvance].collect().toSet
      assert(b3 === b2 + StageAdvance(2L, 2, 60L))
    } finally q.stop()
  }

  test("expiring funnel: idle entities emit a closed row and state evicts") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.to_timestamp
    val in = MemoryStream[(Long, String, String)]
    val df = in.toDF().toDF("entity", "ts_s", "et")
      .withColumn("ts", to_timestamp($"ts_s"))
    val q = StreamFunnel.stagesExpiring(df, "entity", "ts", "et",
        steps, idleMinutes = 10)
      .writeStream.format("memory").queryName("sfe").outputMode("append").start()
    try {
      // u1 reaches stage 1 then goes idle; u2 keeps the stream moving
      in.addData((1L, "2024-01-01T10:00:00Z", "view"),
        (2L, "2024-01-01T10:00:00Z", "error"))
      q.processAllAvailable()
      // watermark jumps 30 min past u1's last activity → u1 expires closed
      in.addData((2L, "2024-01-01T10:30:00Z", "error"))
      q.processAllAvailable()
      in.addData((2L, "2024-01-01T10:31:00Z", "error")) // flush timeout batch
      q.processAllAvailable()
      val got = spark.table("sfe").as[StreamFunnel.FunnelOut].collect().toSet
      assert(got.exists(r => r.entity == 1L && r.closed && r.stage == 1),
        s"expected u1 abandonment at stage 1, got $got")
      // a fresh u1 event AFTER eviction starts the funnel from scratch:
      // 'click' alone (stage-2 step) cannot advance a fresh stage-0 funnel
      in.addData((1L, "2024-01-01T10:32:00Z", "click"))
      q.processAllAvailable()
      val after = spark.table("sfe").as[StreamFunnel.FunnelOut].collect().toSet
      assert(!after.exists(r => r.entity == 1L && !r.closed && r.stage == 2),
        s"evicted entity must restart at stage 0, got $after")
    } finally q.stop()
  }

  test("within-batch out-of-order events fold in time order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StreamFunnel.stages(in.toDS(), steps)
      .writeStream.format("memory").queryName("sfn2").outputMode("append").start()
    try {
      in.addData( // arrival order purchase, click, view — time order wins
        FunnelEvent(7L, 30L, "purchase"), FunnelEvent(7L, 20L, "click"),
        FunnelEvent(7L, 10L, "view"))
      q.processAllAvailable()
      val got = spark.table("sfn2").as[StageAdvance].collect().toSet
      assert(got === Set(StageAdvance(7L, 1, 10L), StageAdvance(7L, 2, 20L),
        StageAdvance(7L, 3, 30L)))
    } finally q.stop()
  }
}
