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
}
