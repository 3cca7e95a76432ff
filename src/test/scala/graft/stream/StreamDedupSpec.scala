package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked dedup drops near-in-time duplicates, keeps distinct keys") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)] // (msgId, ts)
    val deduped = StreamDedup.withinWatermark(
      in.toDF().toDF("msgId", "ts").withColumn("eventTs", to_timestamp($"ts")),
      Seq("msgId"), "eventTs", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdd")
      .outputMode("append").start()
    try {
      in.addData(
        ("m1", "2024-01-01T10:00:00Z"),
        ("m1", "2024-01-01T10:00:30Z"), // redelivery 30s later → dropped
        ("m2", "2024-01-01T10:01:00Z"))
      q.processAllAvailable()
      in.addData(("m1", "2024-01-01T10:02:00Z")) // still within horizon → dropped
      q.processAllAvailable()
      val seen = spark.table("sdd").select("msgId").as[String].collect().toSeq
      assert(seen.sorted == Seq("m1", "m2"), s"got $seen")

      // advance event time far past the horizon: m1's dedup state expires,
      // a much-later m1 is genuinely new and passes through
      in.addData(("m3", "2024-01-01T11:00:00Z"))
      q.processAllAvailable()
      in.addData(("m1", "2024-01-01T11:00:01Z"))
      q.processAllAvailable()
      val later = spark.table("sdd").select("msgId").as[String].collect().toSeq
      assert(later.count(_ == "m1") == 2,
        s"state must expire with the watermark, got $later")
    } finally q.stop()
  }

  test("first-per-key dedup never re-admits a key") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Int)]
    val q = StreamDedup.firstPerKey(in.toDF().toDF("k", "v"), Seq("k"))
      .writeStream.format("memory").queryName("sfk").outputMode("append").start()
    try {
      in.addData(("a", 1), ("a", 2), ("b", 3)); q.processAllAvailable()
      in.addData(("a", 4), ("c", 5)); q.processAllAvailable()
      val rows = spark.table("sfk").as[(String, Int)].collect().toMap
      assert(rows == Map("a" -> 1, "b" -> 3, "c" -> 5), s"got $rows")
    } finally q.stop()
  }
}
