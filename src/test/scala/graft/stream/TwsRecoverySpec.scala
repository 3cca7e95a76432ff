package graft.stream

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.sources.Replayer
import org.apache.spark.sql.functions._

class TwsRecoverySpec extends SparkSpec {

  test("transformWithState state survives a checkpointed restart") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val watch = Files.createTempDirectory("tws-watch").toString
      val ckpt = Files.createTempDirectory("tws-ckpt").toString

      // memory sink cannot recover from a checkpoint; collect emitted rows
      // driver-side via foreachBatch instead
      val collected = scala.collection.mutable.ArrayBuffer.empty[String]
      def start() = {
        val clean = Pipeline.sanitize(Pipeline.parse(StreamingJob.fileSource(spark, watch)))
        StatefulLatest.latestTws(clean).toDF()
          .writeStream.outputMode("update")
          .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         _: scala.Long) => {
            val rows = df.select("vehicleId").collect().map(_.getString(0))
            collected.synchronized { collected ++= rows }: Unit
          })
          .option("checkpointLocation", ckpt).start()
      }

      val q1 = start()
      Replayer.emitChunk(spark, sf(), watch, 0, 3)
      q1.processAllAvailable(); q1.stop()
      assert(collected.nonEmpty)
      collected.clear()

      val q2 = start()
      try {
        Replayer.emitChunk(spark, sf(), watch, 1, 3)
        q2.processAllAvailable()
        val emitted2 = collected.synchronized { collected.toSet }

        // ground truth from batch: keys whose per-key max second-truncated
        // ts in chunk 1 strictly exceeds their chunk-0 max (state survived
        // the restart ⇒ ONLY those keys emit; lost state would re-emit all)
        def maxTs(chunk: Int) = Tables.positions(spark, sf())
          .filter(col("event_id") % 3 === chunk)
          .groupBy(col("vehicleId"))
          .agg(max(date_trunc("second", col("eventTs"))).as(s"t$chunk"))
        val expected = maxTs(0).join(maxTs(1), Seq("vehicleId"), "right")
          .filter(col("t0").isNull || col("t1") > col("t0"))
          .select("vehicleId").collect().map(_.getString(0)).toSet
        assert(emitted2 === expected,
          s"emitted ${emitted2.size} keys, expected ${expected.size}")
      } finally q2.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
