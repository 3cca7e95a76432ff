package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sink.InMemoryKeyedTable
import graft.stream.StreamingJob

/** Single-node streaming throughput: pushes synthetic position-event JSON
  * through the full pipeline (parse → sanitize → snap → windowed agg →
  * multiplex → foreachBatch → both sinks) via MemoryStream and reports
  * events/sec. The reference's operating envelope is ≤200 events per 3 s
  * poll (~67 events/s); this records our single-JVM headroom.
  *
  * Env: SPARK_GRAFT_EVENTS (default 200000), SPARK_GRAFT_BATCHES (20).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "200000").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "20").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Stateful micro-batches pay per-partition state-store overhead every
    // epoch (load/commit/snapshot × partitions), so stream shuffle width
    // follows STATE size, not core count: 32 partitions of tiny state run
    // 3.7x SLOWER than 4 (measured — BASELINE.md). Cores still serve the
    // narrow parse/snap stages; only the stateful exchange is pinned down.
    val streamShuffle = sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "4")
    // State-store backend: "memory" (HDFSBackedStateStore, default) or
    // "rocksdb". RocksDB bounds executor heap by spilling state to local
    // disk — the production choice once state outgrows memory; measured
    // slower on tiny state (BASELINE.md), which is why it is a knob.
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", streamShuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "memory") == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def ev(i: Int): String = {
      val lat = -80.0 + (i % 16000) / 100.0
      val lon = -170.0 + (i % 34000) / 100.0
      // monotonic event time (1 s per event): a wrapping clock would let the
      // watermark drop most events, silently skipping the aggregation leg
      val day = 1 + i / 86400; val hh = (i / 3600) % 24
      val mm = (i / 60) % 60; val ss = i % 60
      f"""{"provider":"p${i % 3}","vehicleId":"v${i % 5000}","lat":$lat%.2f,"lon":$lon%.2f,"speedKmh":${(i % 120)}.5,"bearing":${i % 360},"accuracyM":null,"ts":"2024-01-$day%02dT$hh%02d:$mm%02d:$ss%02dZ"}"""
    }

    val mem = MemoryStream[String]
    val tilesSink = new InMemoryKeyedTable(Seq("tileKey"), Nil)
    val latestSink = new InMemoryKeyedTable(Seq("provider", "vehicleId"), Seq("eventTs", "lat", "lon"))
    val job = new StreamingJob(spark, mem.toDF(), tilesSink, latestSink)
    val q = job.start()
    // warm one batch before timing
    mem.addData(ev(0)); q.processAllAvailable()

    val batchSize = nEvents / nBatches
    val sent = batchSize * nBatches
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { b =>
      mem.addData((0 until batchSize).map(i => ev(b * batchSize + i)): _*)
      q.processAllAvailable()
    }
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    println(s"""{"metric":"stream_events_per_sec","value":${(sent / sec).round},"unit":"events/sec","events":$sent,"batches":$nBatches,"sec":$sec,"tiles":${tilesSink.size},"latest":${latestSink.size}}""")
    spark.stop()
  }
}
