package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sink.InMemoryKeyedTable
import graft.sources.Replayer
import graft.stream.{Pipeline, StreamingJob}
import graft.serve.Serving

/** End-to-end demonstration of the reference pipeline on this engine:
  * replay the shared events table as producer JSON chunks → file-drop
  * streaming source → parse/sanitize/snap → windowed tiles + guarded
  * latest-positions sinks → serving-path GeoJSON. One `runMain graft.Demo`
  * shows every reference stage live (SURVEY.md §3 trace).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.Graft.install(spark)

    val watch = Files.createTempDirectory("graft-demo-watch").toString
    val tilesSink = new InMemoryKeyedTable(Seq("tileKey"), Nil)
    val latestSink = new InMemoryKeyedTable(Seq("provider", "vehicleId"),
      Seq("eventTs", "lat", "lon"))
    val job = new StreamingJob(spark, StreamingJob.fileSource(spark, watch),
      tilesSink, latestSink,
      checkpointDir = Some(Files.createTempDirectory("graft-demo-ckpt").toString))
    val q = job.start()

    (0 until 3).foreach { c =>
      Replayer.emitChunk(spark, sfDir, watch, c, 3)
      q.processAllAvailable()
      val total = q.recentProgress.map(_.numInputRows).sum
      println(s"[demo] after chunk $c: $total events ingested total; " +
        s"tiles=${tilesSink.size} latest=${latestSink.size}")
    }
    q.stop()

    val tiles = tilesSink.snapshot(spark)
    println(s"[demo] tiles table: ${tiles.count()} rows; latest window:")
    Serving.tilesLatest(tiles).orderBy(desc("cnt")).show(5, false)

    val fc = Serving.featureCollectionJson(
      Serving.tileFeatures(Serving.tilesLatest(tiles)))
    println(s"[demo] FeatureCollection: ${fc.length} chars; head: ${fc.take(160)}…")

    val latest = latestSink.snapshot(spark)
    println(s"[demo] positions_latest: ${latest.count()} vehicles")
    Serving.positionFeatures(latest).show(3, false)

    // SQL surface via the installed extension functions
    latest.createOrReplaceTempView("latest_positions")
    spark.sql(
      """SELECT hex_cell_id(lat, lon, 8) AS cell, count(*) AS vehicles
        |FROM latest_positions GROUP BY 1 ORDER BY vehicles DESC LIMIT 3""".stripMargin)
      .show(false)

    spark.stop()
  }
}
