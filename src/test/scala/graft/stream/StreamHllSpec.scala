package graft.stream

import graft.SparkSpec
import graft.ops.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamHllSpec extends SparkSpec {
  import spark.implicits._

  test("streaming HLL registers equal the batch sketch; state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = StreamHll.hllStream(in.toDF().toDF("g", "item"), "g", "item")
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val batch1 = (1 to 300).map(i => ("a", s"u$i")) ++
        (1 to 40).map(i => ("b", s"v${i % 20}")) // b: 20 distinct, repeated
      val batch2 = (200 to 500).map(i => ("a", s"u$i")) ++
        (1 to 10).map(i => ("b", s"v$i")) // all already seen for b
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()

      val streamed = spark.table("hll_stream")
        .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      val batch = StreamHll.hllStream(
        (batch1 ++ batch2).toDF("g", "item"), "g", "item")
        .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(streamed == batch,
        s"streaming registers must equal the batch build; diff=${
          (streamed.toSet diff batch.toSet) ++ (batch.toSet diff streamed.toSet)}")

      // state bounded by construction: ≤ groups × m register rows
      assert(streamed.size <= 2 * Sketches.hllM)

      // estimates off the streamed snapshot are sane ('a' saw 500
      // distinct; loose bounds — the raw α₆₄ estimator has no
      // small-range LinearCounting correction, matching Sketches.hll)
      val est = StreamHll.estimate(spark.table("hll_stream"), "g")
        .select(col("g"), col("est")).as[(String, Long)].collect().toMap
      assert(est("a") > 300 && est("a") < 800, s"a: 500 distinct, est=${est("a")}")

      // the real pin: each group's estimate EQUALS the single-group
      // batch op on the same items (same hash, same registers, same
      // closed form — zero-filled grid there, folded term here)
      Seq("a", "b").foreach { g =>
        val items = (batch1 ++ batch2).filter(_._1 == g).map(_._2)
        val batchEst = Sketches.hll(items.toDF("item"), "item")
          .select(col("est")).as[Long].collect().head
        assert(est(g) == batchEst,
          s"group $g: streamed estimate ${est(g)} != batch Sketches.hll $batchEst")
      }
    } finally q.stop()
  }
}
