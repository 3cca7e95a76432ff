package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState latest-positions matches flatMapGroupsWithState deltas") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      // scripted batches with late/stale updates:
      // batch1: v1@10, v2@20 ; batch2: v1@5 (stale, no emit), v2@25 (newer)
      val batches = Seq(
        Seq(("p0", "v1", 10L, 1L, 1.0, 1.0), ("p0", "v2", 20L, 2L, 2.0, 2.0)),
        Seq(("p0", "v1", 5L, 3L, 9.0, 9.0), ("p0", "v2", 25L, 4L, 3.0, 3.0)))

      def run(useTws: Boolean): Seq[(String, Long, Double)] = {
        val mem = MemoryStream[(String, String, Long, Long, Double, Double)]
        val df = mem.toDF().toDF("provider", "vehicleId", "ts_us", "event_id", "lat", "lon")
          .withColumn("eventTs", timestamp_micros($"ts_us")).drop("ts_us")
        val out = if (useTws) StatefulLatest.latestTws(df) else StatefulLatest.latest(df)
        val qn = s"tws_$useTws"
        val q = out.toDF().writeStream.format("memory").queryName(qn)
          .outputMode("update").start()
        try {
          batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
          // all emitted deltas, in emit order per key
          spark.table(qn).collect()
            .map(r => (r.getString(1), r.getLong(2), r.getDouble(4))).sortBy(x => (x._1, x._2)).toSeq
        } finally q.stop()
      }

      val fmgws = run(useTws = false)
      val tws = run(useTws = true)
      assert(tws === fmgws)
      // exact delta expectation: v1 emits once (stale drop), v2 emits twice
      assert(tws === Seq(("v1", 10L, 1.0), ("v2", 20L, 2.0), ("v2", 25L, 3.0)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
