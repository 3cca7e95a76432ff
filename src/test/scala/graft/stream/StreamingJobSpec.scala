package graft.stream

import graft.SparkSpec
import graft.sink.InMemoryKeyedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingJobSpec extends SparkSpec {
  import spark.implicits._

  private def ev(v: String, lat: Double, lon: Double, ts: String, speed: Double = 10.0): String =
    s"""{"provider":"mbta","vehicleId":"$v","lat":$lat,"lon":$lon,"speedKmh":$speed,"bearing":0,"accuracyM":null,"ts":"$ts"}"""

  test("end-to-end micro-batch flow: window agg + latest with guard + late-data drop") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val tilesSink = new InMemoryKeyedTable(Seq("tileKey"), Nil)
    val latestSink = new InMemoryKeyedTable(Seq("provider", "vehicleId"), Seq("eventTs", "lat", "lon"))
    val job = new StreamingJob(spark, mem.toDF(), tilesSink, latestSink,
      checkpointDir = Some(java.nio.file.Files.createTempDirectory("ckpt").toString))
    val q = job.start()
    try {
      // batch 1: three events, two in the same 5-min window/cell
      mem.addData(
        ev("v1", 42.351, -71.061, "2024-01-01T10:00:30Z", 10.0),
        ev("v2", 42.352, -71.062, "2024-01-01T10:01:30Z", 20.0),
        ev("v3", 60.0, 20.0, "2024-01-01T10:03:00Z", 30.0))
      q.processAllAvailable()
      assert(latestSink.size == 3)
      val tiles1 = tilesSink.snapshot(spark)
      // v1+v2 share a cell+window (same ~100m), v3 elsewhere
      assert(tiles1.agg(sum("cnt")).head().getLong(0) == 3)

      // batch 2: an out-of-order OLDER position for v1 (guard keeps newer),
      // a >10-min-late event (watermark drops it from aggregation state),
      // and a fresh event that advances v2.
      mem.addData(
        ev("v1", 10.0, 10.0, "2024-01-01T09:00:00Z"), // stale: guard rejects
        ev("v2", 42.36, -71.07, "2024-01-01T10:07:00Z"))
      q.processAllAvailable()
      mem.addData(
        ev("v9", 50.0, 8.0, "2024-01-01T09:45:00Z")) // late beyond watermark
      q.processAllAvailable()

      val latest = latestSink.snapshot(spark)
        .select("vehicleId", "lat").as[(String, Double)].collect().toMap
      assert(latest("v1") == 42.351) // old position rejected by guard
      assert(latest("v2") == 42.36)  // newer accepted
      // late event dropped from *aggregation* state: no 09:45 window tile
      val windows = tilesSink.snapshot(spark)
        .select(date_format(col("windowStart"), "HH:mm").as("w"))
        .as[String].collect().toSet
      assert(!windows.contains("09:45"), s"late event leaked into windows $windows")
      // but v9 still lands in positions_latest (reference path has no
      // watermark on the raw leg — heatmap_stream.py:139-143)
      assert(latest.contains("v9"))
    } finally q.stop()
  }

  test("replaying a batch leaves sinks unchanged (at-least-once idempotency)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val tilesSink = new InMemoryKeyedTable(Seq("tileKey"), Nil)
    val latestSink = new InMemoryKeyedTable(Seq("provider", "vehicleId"), Seq("eventTs", "lat", "lon"))
    val job = new StreamingJob(spark, mem.toDF(), tilesSink, latestSink)
    val q = job.start()
    try {
      mem.addData(ev("v1", 42.0, -71.0, "2024-01-01T10:00:00Z"),
                  ev("v2", 43.0, -72.0, "2024-01-01T10:01:00Z"))
      q.processAllAvailable()
      val tilesBefore = tilesSink.snapshot(spark).collect().toSet
      val latestBefore = latestSink.snapshot(spark).collect().toSet
      // replay the same logical batch through the sink layer directly
      job.processBatch(job.plan().isStreaming match {
        case _ =>
          // re-derive the same epoch rows via the batch pipeline
          val raw = Seq(ev("v1", 42.0, -71.0, "2024-01-01T10:00:00Z"),
                        ev("v2", 43.0, -72.0, "2024-01-01T10:01:00Z")).toDF("value")
          val clean = Pipeline.snap(Pipeline.sanitize(Pipeline.parse(raw)), 8)
          Pipeline.multiplex(
            Pipeline.tileKeys(Pipeline.tiles(clean)),
            clean.select("provider", "vehicleId", "eventTs", "lat", "lon"))
      }, epochId = 99L)
      assert(tilesSink.snapshot(spark).collect().toSet == tilesBefore)
      assert(latestSink.snapshot(spark).collect().toSet == latestBefore)
    } finally q.stop()
  }
}
