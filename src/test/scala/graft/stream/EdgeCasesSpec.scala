package graft.stream

import graft.{SparkSpec, Tables}
import graft.ops.{Dedup, Similarity}
import graft.sink.InMemoryKeyedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Empty/degenerate inputs must flow through every operator without
  * crashing — at 100 TB some partition or some day's input is always
  * empty. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyPositions = Pipeline.sanitize(
    Tables.positions(spark, sf()).filter(col("event_id") < -1))

  test("pipeline stages on empty input yield empty, schema-correct frames") {
    val snapped = Pipeline.snap(emptyPositions, 8)
    assert(snapped.count() == 0)
    val tiles = Pipeline.tiles(snapped)
    assert(tiles.count() == 0)
    assert(tiles.columns.contains("cnt") && tiles.columns.contains("windowStart"))
    assert(Pipeline.latestByKeyMaxBy(emptyPositions, Seq("lat", "lon")).count() == 0)
    assert(Pipeline.latestByKeyJoin(emptyPositions).count() == 0)
  }

  test("dedup/similarity ops on empty and single-row corpora") {
    val emptyDocs = Tables.documents(spark, sf()).filter(col("doc_id") < 0)
      .select(col("doc_id"), col("text"))
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.candidates(Dedup.minhash(Dedup.shingles(emptyDocs))).count() == 0)
    assert(Dedup.simhash(emptyDocs).count() == 0)
    assert(Dedup.jaccardPairs(emptyDocs).count() == 0)
    val one = Seq((1L, "just one tiny doc here")).toDF("doc_id", "text")
    assert(Dedup.candidates(Dedup.minhash(Dedup.shingles(one))).count() == 0) // no pair
    val emptyVecs = Similarity.cast(Tables.embeddings(spark, sf()))
      .filter(col("vec_id") < 0).select(col("vec_id"), col("ev"))
    val q = Similarity.cast(Tables.embeddings(spark, sf()))
      .filter(col("vec_id") === 0).select(col("ev").as("qv"))
    assert(Similarity.topK(emptyVecs, q, 5).count() == 0)
  }

  test("streaming job survives an all-invalid micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val tilesSink = new InMemoryKeyedTable(Seq("tileKey"), Nil)
    val latestSink = new InMemoryKeyedTable(Seq("provider", "vehicleId"), Seq("eventTs", "lat", "lon"))
    val job = new StreamingJob(spark, mem.toDF(), tilesSink, latestSink)
    val q = job.start()
    try {
      mem.addData("not json", """{"provider":null,"vehicleId":null}""", """{"lat":999.0}""")
      q.processAllAvailable() // all rows invalid → sinks stay empty, no crash
      assert(latestSink.size == 0)
      mem.addData("""{"provider":"p","vehicleId":"v","lat":1.0,"lon":2.0,"speedKmh":null,"bearing":0,"accuracyM":null,"ts":"2024-01-01T00:00:00Z"}""")
      q.processAllAvailable() // and recovers on the next good batch
      assert(latestSink.size == 1)
    } finally q.stop()
  }

  test("streaming job runs on the RocksDB state store provider (scale backend)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val tilesSink = new InMemoryKeyedTable(Seq("tileKey"), Nil)
    val latestSink = new InMemoryKeyedTable(Seq("provider", "vehicleId"), Seq("eventTs", "lat", "lon"))
    val job = new StreamingJob(spark, mem.toDF(), tilesSink, latestSink)
    val q = job.start()
    try {
      mem.addData(
        """{"provider":"p","vehicleId":"v1","lat":42.0,"lon":-71.0,"speedKmh":10.0,"bearing":0,"accuracyM":null,"ts":"2024-01-01T10:00:00Z"}""",
        """{"provider":"p","vehicleId":"v2","lat":42.0,"lon":-71.0,"speedKmh":20.0,"bearing":0,"accuracyM":null,"ts":"2024-01-01T10:01:00Z"}""")
      q.processAllAvailable()
      assert(tilesSink.snapshot(spark).agg(sum("cnt")).head().getLong(0) == 2)
      assert(latestSink.size == 2)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
