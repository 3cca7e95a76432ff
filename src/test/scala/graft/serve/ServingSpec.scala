package graft.serve

import graft.{SparkSpec, Tables}
import graft.model.Model
import graft.stream.Pipeline
import org.apache.spark.sql.functions._

class ServingSpec extends SparkSpec {
  import spark.implicits._

  private def tiles = Pipeline.tileKeys(Pipeline.tiles(
    Pipeline.snap(Pipeline.sanitize(Tables.positions(spark, sf())), 8)))

  test("model-derived schema matches the reference's declared StructType") {
    val fields = Model.positionSchema.fields.map(f => (f.name, f.dataType.typeName))
    assert(fields.toSeq == Seq(
      "provider" -> "string", "vehicleId" -> "string", "lat" -> "double",
      "lon" -> "double", "speedKmh" -> "double", "bearing" -> "integer",
      "accuracyM" -> "integer", "ts" -> "string"))
    assert(Model.positionSchema.fields.forall(_.nullable))
  }

  test("tilesLatest returns exactly the max-window tiles (Q1/A4/F6)") {
    val t = tiles
    val latest = Serving.tilesLatest(t)
    val mx = t.agg(max("windowStart")).head().getTimestamp(0)
    assert(latest.count() > 0)
    assert(latest.select("windowStart").distinct().head().getTimestamp(0) == mx)
  }

  test("featureCollectionJson emits valid GeoJSON with closed Polygon rings") {
    val fc = Serving.featureCollectionJson(Serving.tileFeatures(Serving.tilesLatest(tiles)))
    assert(fc.startsWith("""{"type":"FeatureCollection","features":["""))
    assert(fc.contains(""""type":"Polygon""""))
    // parse back through Spark's JSON reader to prove well-formedness
    val parsed = spark.read.json(Seq(fc).toDS())
    assert(parsed.columns.contains("features"))
    val nFeatures = parsed.select(size(col("features"))).head().getInt(0)
    assert(nFeatures == Serving.tilesLatest(tiles).count())
  }

  test("featureCollectionJson streams partition-at-a-time (no full collect)") {
    // Exchange-free 4-partition plan: toLocalIterator runs ONE JOB PER
    // PARTITION, a full collect() would be exactly one job. (AQE is not
    // in play — no exchange — so job count is a faithful materialization
    // probe.)
    val rows = (1 to 8).map(i =>
      ("p", s"v$i", i.toDouble, -i.toDouble, s"2024-01-01T00:00:0$i"))
    val df = spark.sparkContext.parallelize(rows, 4)
      .toDF("provider", "vehicleId", "lat", "lon", "eventTs")
    val features = Serving.positionFeatures(df)
    val group = "fc-envelope-stream"
    spark.sparkContext.setJobGroup(group, "featureCollectionJson", false)
    val fc = try Serving.featureCollectionJson(features)
             finally spark.sparkContext.clearJobGroup()
    assert(fc.contains(""""v1"""") && fc.contains(""""v8""""))
    assert(spark.read.json(Seq(fc).toDS()).columns.contains("features"))
    // status tracker fills from the async listener bus — poll briefly
    var jobs = 0; var waited = 0
    while (jobs < 2 && waited < 5000) {
      jobs = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      if (jobs < 2) { Thread.sleep(100); waited += 100 }
    }
    assert(jobs >= 2,
      s"expected >=2 per-partition jobs (streamed envelope), got $jobs — full collect?")
  }

  test("positionFeatures emits Point features for the latest positions (Q2)") {
    val latest = Pipeline.latestByKeyMaxBy(
      Pipeline.sanitize(Tables.positions(spark, sf())), Seq("lat", "lon"))
    val f = Serving.positionFeatures(latest)
    val one = f.select(col("feature.geometry.type"),
      size(col("feature.geometry.coordinates"))).head()
    assert(one.getString(0) == "Point" && one.getInt(1) == 2)
    assert(f.count() == latest.count())
  }

  test("parseAudited routes malformed JSON to the dead-letter leg") {
    val raw = Seq(
      """{"provider":"p","vehicleId":"v","lat":1.0,"lon":2.0,"speedKmh":null,"bearing":1,"accuracyM":null,"ts":"2024-01-01T00:00:00Z"}""",
      """{"broken json""",
      """[1,2,3]"""
    ).toDF("value")
    val parsed = Pipeline.parseAudited(raw)
    assert(Pipeline.deadLetters(parsed).count() == 2)
    val ok = Pipeline.wellFormed(parsed)
    assert(ok.count() == 1 && ok.head().getAs[String]("provider") == "p")
    assert(!ok.columns.contains("_corrupt"))
  }
}
