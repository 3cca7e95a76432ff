package graft.plans

import graft.SparkSpec
import graft.geo.HexGrid
import graft.geo.hexfunctions._
import graft.functions.ShingleGenerator
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("Graft.install registers SQL functions on a live session") {
    Graft.install(spark)
    val got = spark.sql("SELECT hex_cell_id(42.35, -71.06, 8) AS c").head().getString(0)
    assert(got == HexGrid.cellId(42.35, -71.06, 8))
    val ring = spark.sql("SELECT hex_boundary(hex_cell_id(42.35, -71.06, 8)) AS r")
      .head().getSeq[scala.collection.Seq[Double]](0)
    assert(ring.length == 7 && ring.head == ring.last)
  }

  test("sketch aggregates are callable from SQL") {
    Graft.install(spark)
    graft.Tables.events(spark, sf()).createOrReplaceTempView("ev_sql")
    val r = spark.sql(
      """SELECT kmv_distinct(user_id) AS kmv, exact_distinct_sketch(user_id) AS ex,
        |       count(DISTINCT user_id) AS exact
        |FROM ev_sql""".stripMargin).head()
    assert(r.getLong(1) === r.getLong(2))          // exact sketch == exact
    assert(r.getLong(0) === r.getLong(2))          // 15 distinct < k=64 → KMV exact
  }

  test("SimplifyHexExpressions fuses center(cell_id(..)) and preserves results") {
    Graft.install(spark)
    // parquet-backed frame: a literal-backed one collapses to LocalRelation
    // (ConvertToLocalRelation) before custom rules can be observed
    val df = graft.Tables.positions(spark, sf()).select(col("lat"), col("lon")).limit(20)
    val q = df.select(col("lat"), col("lon"),
      hex_center_lat(hex_cell_id(col("lat"), col("lon"), 8)).as("clat"),
      hex_center_lon(hex_cell_id(col("lat"), col("lon"), 8)).as("clon"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("hex_center_lat_direct"), optimized)
    assert(!optimized.contains("hex_center_lat(hex_cell_id"), optimized)
    // results identical to the unfused math
    q.collect().foreach { r =>
      val (res, qq, rr) = HexGrid.parse(HexGrid.cellId(r.getDouble(0), r.getDouble(1), 8))
      assert(r.getDouble(2) == HexGrid.centerLat(qq, rr, res))
      assert(r.getDouble(3) == HexGrid.centerLon(qq, rr, res))
    }
  }

  test("fused center preserves NULL for out-of-range coordinates (rule is semantics-preserving)") {
    Graft.install(spark)
    // parquet-backed with injected out-of-range lat so the rule fires and
    // the guard must survive the fusion
    val df = graft.Tables.positions(spark, sf()).select(col("lat"), col("lon")).limit(5)
      .withColumn("lat", when(col("lon") > -1000, lit(95.0)).otherwise(col("lat")))
    val q = df.select(hex_center_lat(hex_cell_id(col("lat"), col("lon"), 8)).as("clat"))
    assert(q.queryExecution.optimizedPlan.toString.contains("hex_center_lat_direct"))
    assert(q.collect().forall(_.isNullAt(0)), "out-of-range lat must fuse to NULL")
  }

  test("fresh session via withExtensions gets the rule and functions") {
    val fresh = spark.newSession()
    // newSession shares extensions only if built with them; install runtime-side
    Graft.install(fresh)
    assert(fresh.sql("SELECT hex_cell_id(0.0, 0.0, 8) AS c").head().getString(0)
      == HexGrid.cellId(0.0, 0.0, 8))
  }

  test("ShingleGenerator streams k-shingles as a Generate node") {
    val df = Seq((1L, "a b c d"), (2L, "x y"), (3L, null: String)).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), ShingleGenerator.shingles(col("text"), 3))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a b c"), (1L, "b c d"))) // short + null docs emit nothing
    val plan = df.select(ShingleGenerator.shingles(col("text"), 3))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
  }

  test("ShingleGenerator agrees with the declarative shingle pipeline") {
    val docs = graft.Tables.documents(spark, sf()).select(col("doc_id"), col("text")).limit(100)
    val viaGen = docs.select(col("doc_id"), ShingleGenerator.shingles(col("text"), 3))
    val viaSql = graft.ops.Dedup.shingles(docs, 3)
    assert(viaGen.exceptAll(viaSql).isEmpty && viaSql.exceptAll(viaGen).isEmpty)
  }
}
