package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamCusum.{Alarm, Point}

class StreamCusumSpec extends SparkSpec {
  import spark.implicits._

  test("running clamped sum persists across batches, alarms on crossings") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Point]
    // target+slack = 100; threshold 250
    val q = StreamCusum.alarms(in.toDS(), 100L, 0L, 250L)
      .writeStream.format("memory").queryName("scu").outputMode("append").start()
    try {
      // batch 1: d = +200, -50 → s = 200, 150: no alarm yet
      in.addData(Point("k", 1L, 300L), Point("k", 2L, 50L))
      q.processAllAvailable()
      assert(spark.table("scu").as[Alarm].collect().isEmpty)

      // batch 2: d = +300 → s = 450 (alarm), then big drop clamps to 0,
      // then +100 → s = 100 (no alarm): state carried 150 from batch 1
      in.addData(Point("k", 3L, 400L), Point("k", 4L, -900L), Point("k", 5L, 200L))
      q.processAllAvailable()
      val got = spark.table("scu").as[Alarm].collect().toSet
      assert(got === Set(Alarm("k", 3L, 450L)))

      // independent key: fresh state
      in.addData(Point("j", 1L, 400L))
      q.processAllAvailable()
      assert(spark.table("scu").as[Alarm].collect().toSet ===
        Set(Alarm("k", 3L, 450L), Alarm("j", 1L, 300L)))
    } finally q.stop()
  }

  test("within-batch rows fold in event-time order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Point]
    val q = StreamCusum.alarms(in.toDS(), 100L, 0L, 250L)
      .writeStream.format("memory").queryName("scu2").outputMode("append").start()
    try {
      // arrival order is reversed; time order gives s = 200, 400 (alarm at t=2)
      in.addData(Point("k", 2L, 300L), Point("k", 1L, 300L))
      q.processAllAvailable()
      assert(spark.table("scu2").as[Alarm].collect().toSet ===
        Set(Alarm("k", 2L, 400L)))
    } finally q.stop()
  }
}
