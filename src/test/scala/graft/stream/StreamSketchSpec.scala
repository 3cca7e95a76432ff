package graft.stream

import graft.SparkSpec
import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming CMS counters equal the batch sketch over the same events") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = StreamSketch.cmsStream(in.toDF().toDF("item"), "item")
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val batch1 = Seq.fill(20)("heavy") ++ (1 to 15).map(i => s"k$i")
      val batch2 = Seq.fill(10)("heavy") ++ (16 to 30).map(i => s"k$i")
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()

      val streamed = spark.table("cms_stream")
        .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val batch = Sketches.cmsBuild((batch1 ++ batch2).toDF("item"), "item")
        .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed == batch,
        s"streaming counters must equal the batch sketch; diff=${
          (streamed.toSet diff batch.toSet) ++ (batch.toSet diff streamed.toSet)}")

      // state is bounded: never more than d*w counter rows
      assert(streamed.size <= 3 * 64)

      // estimates from the streamed counters behave like CMS (>= exact)
      val counters = spark.table("cms_stream")
      val est = Sketches.cmsEstimate(Seq("heavy").toDF("item"), counters, "item")
        .as[(String, Long)].collect().head
      assert(est._2 >= 30L, s"heavy appeared 30 times, est=${est._2}")
    } finally q.stop()
  }

  test("streaming histogram sketch: quantiles off the stream match batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Double)]
    val q = StreamSketch.histogramStream(in.toDF().toDF("g", "v"), "g", "v")
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode("complete").start()
    try {
      val vals = (1 to 200).map(i => ("a", i / 2.0))
      in.addData(vals.take(100): _*); q.processAllAvailable()
      in.addData(vals.drop(100): _*); q.processAllAvailable()
      val streamedHist = spark.table("hist_stream")
      val batchHist = graft.ops.Quantiles.histogram(vals.toDF("g", "v"), "g", "v")
      val sq = graft.ops.Quantiles.fromHistogram(streamedHist, "g", Seq(0.5))
        .as[(String, Double, Double)].collect().head
      val bq = graft.ops.Quantiles.fromHistogram(batchHist, "g", Seq(0.5))
        .as[(String, Double, Double)].collect().head
      assert(sq == bq, s"stream $sq vs batch $bq")
      assert(math.abs(sq._3 - 50.0) <= 2.0, s"p50 of 0.5..100 ≈ 50, got ${sq._3}")
    } finally q.stop()
  }
}
