package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamKmvSpec extends SparkSpec {
  import spark.implicits._

  test("streaming KMV sketch equals the batch build; delta emission; state bounded") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = StreamKmv.kmvStream(in.toDF().toDF("g", "item"), "g", "item", k = 16)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("update").start()
    try {
      val batch1 = (1 to 100).map(i => ("a", s"u$i")) ++
        (1 to 5).map(i => ("b", s"v$i"))
      in.addData(batch1: _*); q.processAllAvailable()
      // duplicates of already-seen items: sketches must NOT change
      in.addData(("b", "v1"), ("b", "v2")); q.processAllAvailable()
      val afterDup = spark.table("kmv_stream").count()
      val batch3 = (90 to 160).map(i => ("a", s"u$i")) ++
        (6 to 12).map(i => ("b", s"v$i"))
      in.addData(batch3: _*); q.processAllAvailable()

      // delta semantics: the duplicate-only batch emitted nothing
      val afterAll = spark.table("kmv_stream")
      assert(afterAll.count() >= afterDup,
        "update sink only appends; sanity")

      // latest row per group = the final sketch state
      val fin = afterAll
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
            .orderBy(col("n_sketch").desc, col("est").desc)))
        .filter(col("rn") === 1)
        .select(col("g"), col("n_sketch"), col("kth"), col("est"))
        .as[(String, Int, Long, Long)].collect().map(r => r._1 -> r).toMap

      // batch twin: same hash, k smallest distinct, same estimator
      val all = (batch1 ++ Seq(("b", "v1"), ("b", "v2")) ++ batch3)
      def batchSketch(g: String): (Int, Long, Long) = {
        val hvals = all.filter(_._1 == g).map(_._2).distinct
          .toDF("item")
          .select(graft.ops.Dedup.hash48(col("item"), lit("kmv")).as("h"))
          .as[Long].collect().sorted.distinct.take(16).toVector
        val est = if (hvals.size < 16) hvals.size.toLong
          else 15L * StreamKmv.maxH48 / hvals.last
        (hvals.size, if (hvals.size < 16) 0L else hvals.last, est)
      }
      Seq("a", "b").foreach { g =>
        val (n, kth, est) = batchSketch(g)
        assert(fin(g)._2 == n && fin(g)._3 == kth && fin(g)._4 == est,
          s"group $g: streamed ${fin(g)} != batch ($n, $kth, $est)")
      }

      // 'b' saw 12 distinct (< k) → exact count; 'a' saw 160 → estimate
      assert(fin("b")._4 == 12L, s"b exact-count regime, got ${fin("b")._4}")
      assert(fin("a")._4 > 80 && fin("a")._4 < 320,
        s"a: 160 distinct, KMV(k=16) est=${fin("a")._4}")
      // state bounded: never more than k hashes per key
      assert(fin("a")._2 <= 16 && fin("b")._2 <= 16)
    } finally q.stop()
  }
}
