package graft.stream

import graft.{SparkSpec, Tables}
import graft.sink.Upsert
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("parse: PERMISSIVE from_json nulls type-mismatched fields (reference heatmap_stream.py:90)") {
    val raw = Seq(
      """{"provider":"mbta","vehicleId":"v1","lat":42.3,"lon":-71.0,"speedKmh":12.5,"bearing":90,"accuracyM":null,"ts":"2024-01-01T00:00:05Z"}""",
      """{"provider":"mbta","vehicleId":"v2","lat":1.0,"lon":2.0,"speedKmh":null,"bearing":45.7,"accuracyM":3,"ts":"2024-01-01T00:00:06Z"}""",
      """not json at all"""
    ).toDF("value")
    val parsed = Pipeline.parse(raw).collect()
    assert(parsed.length == 3)
    val r0 = parsed(0)
    assert(r0.getAs[String]("provider") == "mbta")
    assert(r0.getAs[Double]("lat") == 42.3)
    assert(!r0.isNullAt(r0.fieldIndex("eventTs")))
    // float bearing against IntegerType nulls out just that field (PERMISSIVE)
    val r1 = parsed(1)
    assert(r1.isNullAt(r1.fieldIndex("bearing")))
    assert(r1.getAs[String]("vehicleId") == "v2")
    // garbage row → all-null struct
    val r2 = parsed(2)
    assert(r2.isNullAt(r2.fieldIndex("provider")))
  }

  test("sanitize drops null keys and out-of-range coords (F1/F2)") {
    val df = Seq(
      ("p", "v", 42.0, -71.0, "2024-01-01T00:00:00Z"),
      (null, "v", 42.0, -71.0, "2024-01-01T00:00:00Z"),
      ("p", "v", 91.0, -71.0, "2024-01-01T00:00:00Z"),
      ("p", "v", 42.0, -181.0, "2024-01-01T00:00:00Z"),
      ("p", "v", 42.0, -71.0, null)
    ).toDF("provider", "vehicleId", "lat", "lon", "ts")
      .withColumn("eventTs", to_timestamp(col("ts")))
    assert(Pipeline.sanitize(df).count() == 1)
  }

  test("tiles: count includes null-speed rows, avg skips them (A1 semantics)") {
    val df = Seq(
      ("p", "v1", 42.0, -71.0, Some(10.0), "2024-01-01T00:01:00Z"),
      ("p", "v2", 42.0, -71.0, None: Option[Double], "2024-01-01T00:02:00Z"),
      ("p", "v3", 42.0, -71.0, Some(20.0), "2024-01-01T00:03:00Z")
    ).toDF("provider", "vehicleId", "lat", "lon", "speedKmh", "ts")
      .withColumn("eventTs", to_timestamp(col("ts")))
    val t = Pipeline.tiles(Pipeline.snap(df, 8)).collect()
    assert(t.length == 1)
    assert(t(0).getAs[Long]("cnt") == 3)       // null speed still counted
    assert(t(0).getAs[Double]("avgSpeedKmh") == 15.0) // null skipped in avg
  }

  test("argmax three ways agree when keys are unique (A2/A3 ≡ max_by ≡ row_number)") {
    val pos = Pipeline.sanitize(Tables.positions(spark, sf("sf0.001")))
    val viaJoin = Pipeline.latestByKeyJoin(pos)
      .select("provider", "vehicleId", "eventTs", "lat", "lon").distinct()
    val viaMaxBy = Pipeline.latestByKeyMaxBy(pos, Seq("event_id", "lat", "lon"))
      .select("provider", "vehicleId", "eventTs", "lat", "lon")
    assert(viaJoin.exceptAll(viaMaxBy).isEmpty && viaMaxBy.exceptAll(viaJoin).isEmpty)
  }

  test("multiplex/route: union by name null-fills and splits back (SO1/F4)") {
    val a = Seq(("c1", 5L)).toDF("cellId", "cnt")
    val b = Seq(("p", "v", 1.0, 2.0)).toDF("provider", "vehicleId", "lat", "lon")
    val mux = Pipeline.multiplex(a, b)
    assert(mux.count() == 2)
    val tilesLeg = Pipeline.route(mux, "tiles")
    val latestLeg = Pipeline.route(mux, "latest")
    assert(tilesLeg.count() == 1 && latestLeg.count() == 1)
    assert(tilesLeg.select("provider").head().isNullAt(0)) // null-filled
    assert(!mux.columns.contains("__part") || mux.columns.contains("__part"))
    assert(!tilesLeg.columns.contains("__part")) // dropped after routing
  }

  test("upsert merge is idempotent and honors the monotonic guard (W5)") {
    val t0 = Seq(("p", "v1", "2024-01-01T00:05:00Z", 1L),
                 ("p", "v2", "2024-01-01T00:06:00Z", 2L))
      .toDF("provider", "vehicleId", "ts", "event_id")
      .withColumn("eventTs", to_timestamp(col("ts"))).drop("ts")
    // batch has an OLDER record for v1 (guard must keep t0's) and a newer for v2
    val batch = Seq(("p", "v1", "2024-01-01T00:01:00Z", 3L),
                    ("p", "v2", "2024-01-01T00:09:00Z", 4L))
      .toDF("provider", "vehicleId", "ts", "event_id")
      .withColumn("eventTs", to_timestamp(col("ts"))).drop("ts")
    val keys = Seq("provider", "vehicleId")
    val once = Upsert.merge(t0, batch, keys, Seq("eventTs"), Seq("event_id"))
    val twice = Upsert.merge(once, batch, keys, Seq("eventTs"), Seq("event_id"))
    val m = twice.collect().map(r => r.getString(1) -> r.getAs[Long]("event_id")).toMap
    assert(m == Map("v1" -> 1L, "v2" -> 4L))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
