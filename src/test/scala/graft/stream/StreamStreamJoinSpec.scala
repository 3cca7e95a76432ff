package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked interval join matches within tolerance, prunes state") {
    implicit val sqlCtx = spark.sqlContext
    val pos = MemoryStream[(String, String, Double)]   // vehicleId, ts, lat
    val alerts = MemoryStream[(String, String, String)] // vehicleId, ts, kind

    val left = pos.toDF().toDF("vehicleId", "ts", "lat")
      .withColumn("eventTs", to_timestamp($"ts")).drop("ts")
      .withWatermark("eventTs", "10 minutes")
    val right = alerts.toDF().toDF("vehicleId", "ts", "kind")
      .withColumn("alertTs", to_timestamp($"ts")).drop("ts")
      .withWatermark("alertTs", "10 minutes")

    val joined = StreamJoins.joinWithin(left, right, "vehicleId", "eventTs", "alertTs", "5 minutes")
      .select($"vehicleId", $"lat", $"kind")

    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      pos.addData(("v1", "2024-01-01T10:00:00Z", 1.0), ("v2", "2024-01-01T10:00:00Z", 2.0))
      alerts.addData(
        ("v1", "2024-01-01T10:03:00Z", "speeding"),  // within 5 min of v1 pos → match
        ("v1", "2024-01-01T10:30:00Z", "late"),      // 30 min away → no match
        ("v3", "2024-01-01T10:00:00Z", "orphan"))    // no such vehicle → no match
      q.processAllAvailable()
      // advance both watermarks so the joinable horizon closes and results emit
      pos.addData(("vx", "2024-01-01T11:00:00Z", 0.0))
      alerts.addData(("vx2", "2024-01-01T11:00:00Z", "tick"))
      q.processAllAvailable()
      val rows = spark.table("ssj").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
      assert(rows === Set(("v1", 1.0, "speeding")))
    } finally q.stop()
  }

  test("left-outer interval join null-pads unmatched lefts once the watermark proves absence") {
    implicit val sqlCtx = spark.sqlContext
    val pos = MemoryStream[(String, String, Double)]
    val alerts = MemoryStream[(String, String, String)]

    val left = pos.toDF().toDF("vehicleId", "ts", "lat")
      .withColumn("eventTs", to_timestamp($"ts")).drop("ts")
      .withWatermark("eventTs", "10 minutes")
    val right = alerts.toDF().toDF("vehicleId", "ts", "kind")
      .withColumn("alertTs", to_timestamp($"ts")).drop("ts")
      .withWatermark("alertTs", "10 minutes")

    val joined = StreamJoins.joinLeftOuterWithin(
        left, right, "vehicleId", "eventTs", "alertTs", "5 minutes")
      .select($"vehicleId", $"lat", $"kind")

    val q = joined.writeStream.format("memory").queryName("ssjlo")
      .outputMode("append").start()
    try {
      pos.addData(("v1", "2024-01-01T10:00:00Z", 1.0),
        ("v2", "2024-01-01T10:00:00Z", 2.0))
      alerts.addData(("v1", "2024-01-01T10:03:00Z", "speeding"))
      q.processAllAvailable()
      // v2's match horizon is still open — no outer emission yet: the
      // engine must PROVE absence via the watermark, not observe it.
      val early = spark.table("ssjlo").collect()
        .map(r => r.getString(0)).toSet
      assert(!early.contains("v2"),
        "outer row emitted before the watermark closed its horizon")
      // push both watermarks far past v2's horizon → null-padded emission
      pos.addData(("vx", "2024-01-01T12:00:00Z", 0.0))
      alerts.addData(("vx2", "2024-01-01T12:00:00Z", "tick"))
      q.processAllAvailable()
      pos.addData(("vy", "2024-01-01T13:00:00Z", 0.0))
      alerts.addData(("vy2", "2024-01-01T13:00:00Z", "tick"))
      q.processAllAvailable()
      val rows = spark.table("ssjlo").collect()
        .map(r => (r.getString(0), r.getDouble(1), Option(r.getString(2))))
        .toSet
      assert(rows.contains(("v1", 1.0, Some("speeding"))))
      assert(rows.contains(("v2", 2.0, None)),
        s"missing null-padded outer row for v2; got $rows")
    } finally q.stop()
  }
}
