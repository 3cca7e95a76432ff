package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sink.InMemoryKeyedTable
import graft.stream.StreamingJob

/** State-rebalancing experiment: sweep stream shuffle width × state-key
  * cardinality and measure end-to-end throughput of the full pipeline.
  *
  * BASELINE.md's round-2 finding is that width must track STATE VOLUME,
  * not core count: on tiny state (5k vehicle keys), 4 partitions beat 32
  * by ~7× because every micro-batch pays per-partition state-store
  * load/commit/snapshot. The prediction it records — that the trade
  * REVERSES once per-partition state is large enough for commit work to
  * dominate and parallelize — is what this main demonstrates, by scaling
  * the vehicle-key cardinality (the latest-positions state) and the cell
  * diversity (the window-aggregate state) while holding event volume
  * fixed.
  *
  * Output: one JSON line per (cardinality, width) cell plus a summary
  * line naming the best width per cardinality.
  *
  * Env: SPARK_GRAFT_EVENTS (default 120000), SPARK_GRAFT_BATCHES (6),
  * SPARK_GRAFT_CPUS (32).
  */
object StateBench {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_EVENTS", "120000").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "6").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Same backend knob as StreamBench: memory (default) or rocksdb —
    // rocksdb adds changelog checkpointing so epoch commits ship deltas,
    // not snapshots (the production pairing once state is large).
    val backend = sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "memory")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (backend == "rocksdb")
      builder
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    /** Synthetic position JSON with `card` distinct vehicles/coordinates.
      * The LIVE stateful-aggregate state is (open windows × distinct cells
      * touched), so it is controlled by two knobs: coordinate diversity
      * (coprime strides over the full lat/lon range) and the event clock —
      * `clockDiv` events share each second, so one 5-min window holds up
      * to 300·clockDiv events' worth of distinct cells. */
    def ev(i: Int, card: Int, clockDiv: Int): String = {
      val cell = i % card
      val lat = -80.0 + ((cell * 13) % 15900) / 100.0
      val lon = -170.0 + ((cell * 101) % 33900) / 100.0
      val t = i / clockDiv
      val day = 1 + t / 86400; val hh = (t / 3600) % 24
      val mm = (t / 60) % 60; val ss = t % 60
      f"""{"provider":"p${i % 3}","vehicleId":"v$cell","lat":$lat%.2f,"lon":$lon%.2f,"speedKmh":${(i % 120)}.5,"bearing":${i % 360},"accuracyM":null,"ts":"2024-01-$day%02dT$hh%02d:$mm%02d:$ss%02dZ"}"""
    }

    def run(card: Int, clockDiv: Int, width: Int): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", width.toString)
      val mem = MemoryStream[String]
      val tilesSink = new InMemoryKeyedTable(Seq("tileKey"), Nil)
      val latestSink = new InMemoryKeyedTable(Seq("provider", "vehicleId"),
        Seq("eventTs", "lat", "lon"))
      val job = new StreamingJob(spark, mem.toDF(), tilesSink, latestSink)
      val q = job.start()
      mem.addData(ev(0, card, clockDiv)); q.processAllAvailable() // warm
      val batchSize = nEvents / nBatches
      val t0 = System.nanoTime()
      (0 until nBatches).foreach { b =>
        mem.addData((0 until batchSize).map(i => ev(b * batchSize + i, card, clockDiv)): _*)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      val rate = batchSize * nBatches / sec
      println(s"""{"metric":"state_sweep","backend":"$backend","card":$card,"clock_div":$clockDiv,"width":$width,"events_per_sec":${rate.round},"latest_keys":${latestSink.size},"tile_keys":${tilesSink.size}}""")
      rate
    }

    val widths = Seq(4, 16, 32)
    // (cardinality, clockDiv): tiny state (reference-like) vs large live
    // window state (~100k cells per open window).
    val configs = Seq((5000, 1), (200000, 200))
    val best = configs.map { case (c, cd) =>
      val rates = widths.map(w => w -> run(c, cd, w))
      s"$c/$cd" -> rates.maxBy(_._2)._1
    }
    spark.stop()
    println(s"""{"metric":"state_sweep_best","best_width":${best.map { case (c, w) => s""""$c":$w""" }.mkString("{", ",", "}")}}""")
  }
}
