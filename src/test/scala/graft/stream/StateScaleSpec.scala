package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming state at 100 TB scale — two capabilities the default
  * in-memory (HDFS-backed) state store cannot give a large deployment:
  *
  *  1. RocksDBStateStoreProvider: state spills to local disk instead of
  *     executor heap, so keyed state can exceed memory (the provider is
  *     bundled — rocksdbjni ships in /opt/spark/jars). The spec proves
  *     the SAME query produces the SAME result under both providers —
  *     switching is a conf line, not a semantics change.
  *  2. The `statestore` batch data source: offline inspection of a
  *     checkpoint's state (debugging a stuck aggregation, auditing
  *     what a job would re-process) without touching the running query.
  */
class StateScaleSpec extends SparkSpec {
  import spark.implicits._

  private def runCount(provider: Option[String], ckpt: String): Map[String, Long] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    provider.foreach(p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    try {
      val mem = MemoryStream[(String, Long)]
      val agg = mem.toDF().toDF("k", "v")
        .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val name = s"ssc_${math.abs(ckpt.hashCode)}"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").option("checkpointLocation", ckpt).start()
      try {
        mem.addData(("a", 1L), ("a", 2L), ("b", 5L))
        q.processAllAvailable()
        mem.addData(("b", 7L), ("c", 9L))
        q.processAllAvailable()
        spark.table(name).collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      } finally q.stop()
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      prev.foreach(p =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    }
  }

  test("RocksDB state store provider: identical results, state on disk not heap") {
    val ckptDefault = Files.createTempDirectory("ckpt_hdfs").toString
    val ckptRocks = Files.createTempDirectory("ckpt_rocks").toString
    val viaDefault = runCount(None, ckptDefault)
    val viaRocks = runCount(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      ckptRocks)
    assert(viaDefault === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    assert(viaRocks === viaDefault,
      "provider swap must be invisible to query semantics")
  }

  test("statestore batch source reads a checkpoint's keyed state offline") {
    val ckpt = Files.createTempDirectory("ckpt_inspect").toString
    runCount(None, ckpt)
    val state = spark.read.format("statestore").load(ckpt)
    // schema: key struct, value struct (the PHYSICAL agg buffer — fields
    // carry the buffer names `count`/`sum`, not the query's aliases)
    val rows = state.selectExpr("key.k AS k", "value.count AS n", "value.sum AS s")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows === Map("a" -> ((2L, 3L)), "b" -> ((2L, 12L)), "c" -> ((1L, 9L))),
      s"state snapshot mismatch: $rows")
  }
}
