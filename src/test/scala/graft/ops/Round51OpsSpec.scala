package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class Round51OpsSpec extends SparkSpec {
  import spark.implicits._

  private def pos(veh: String, lat: Double, lon: Double, hour: Long) =
    (veh, lat, lon, hour)

  test("convoys: a sustained pair qualifies, a chance contact does not") {
    // a+b share the same point for hours 0,1,2 (run of 3); c joins only
    // at hour 1 (runs of 1 with each — under minLen).
    val rows =
      (0L to 2L).flatMap(h => Seq(pos("a", 10.0, 10.0, h), pos("b", 10.0, 10.0, h))) :+
        pos("c", 10.0, 10.0, 1L)
    val df = rows.toDF("vehicleId", "lat", "lon", "h")
      .withColumn("eventTs", timestamp_micros(col("h") * 3600000000L))
      .withColumn("speedKmh", lit(0.0))
      .withColumn("event_id", col("h"))
      .withColumn("event_type", lit("ping"))
    val r = Mobility.convoys(df, 3, 3600000000L, 3).collect()
    assert(r.length === 1)
    val Row(a: String, b: String, nc: Long, ml: Long, tb: Long) = r.head
    assert((a, b) === (("a", "b")))
    assert((nc, ml, tb) === ((1L, 3L, 3L)))
  }

  test("convoys: a gap splits the run; two cells in one hour count once") {
    // pair shares hours 0,1 then 3,4,5 — only the second run (len 3)
    // qualifies; hour 4 is shared at TWO points (still one bucket).
    val hours = Seq(0L, 1L, 3L, 4L, 5L)
    val rows = hours.flatMap(h =>
      Seq(pos("a", 10.0, 10.0, h), pos("b", 10.0, 10.0, h))) ++
      Seq(pos("a", 20.0, 20.0, 4L), pos("b", 20.0, 20.0, 4L))
    val df = rows.toDF("vehicleId", "lat", "lon", "h")
      .withColumn("eventTs", timestamp_micros(col("h") * 3600000000L))
      .withColumn("speedKmh", lit(0.0))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("event_type", lit("ping"))
    val Row(_, _, nc: Long, ml: Long, tb: Long) =
      Mobility.convoys(df, 3, 3600000000L, 3).collect().head
    assert((nc, ml, tb) === ((1L, 3L, 3L)))
  }

  test("mixReweight: uniform buckets get weight 1e6 and ESS 1e6") {
    val df = Seq.tabulate(40)(i => i.toLong % 4).toDF("bucket")
    val r = Curation.mixReweight(df, 4).collect()
    assert(r.length === 4)
    r.foreach { row =>
      assert(row.getLong(2) === 250000L) // share 1/4
      assert(row.getLong(3) === 1000000L) // weight 1
      assert(row.getLong(4) === 1000000L) // ESS = N
    }
  }

  test("mixReweight: a starved bucket inflates its weight and shrinks ESS") {
    val df = (Seq.fill(30)(0L) ++ Seq.fill(30)(1L) ++ Seq.fill(2)(2L))
      .toDF("bucket")
    val byB = Curation.mixReweight(df, 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byB(2L).getLong(3) > byB(0L).getLong(3) * 10) // rare bucket upweighted
    assert(byB(0L).getLong(4) < 500000L) // ESS well under N
  }

  test("mde: tighter segments (lower variance) see smaller effects") {
    val tight = Seq.tabulate(200)(i => ("t", 1000L + (i % 3))).toDF("seg", "c")
    val wide = Seq.tabulate(200)(i => ("w", 1000L + (i % 100) * 37)).toDF("seg", "c")
    val r = Experiment.mde(tight.unionByName(wide), "seg", "c").collect()
      .map(x => x.getString(0) -> x.getLong(3)).toMap
    assert(r("t") < r("w")) // 0-cent MDE on the ±1-cent segment is exact
    assert(r("w") > 100L) // ~1000-cent spread needs a visible effect
  }

  test("mde: zero-variance segment yields NULL") {
    val df = Seq.fill(10)(("z", 500L)).toDF("seg", "c")
    val row = Experiment.mde(df, "seg", "c").collect().head
    assert(row.isNullAt(3) && row.isNullAt(4))
  }
}
