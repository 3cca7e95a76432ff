package graft.sink

import java.nio.file.Files
import graft.{SparkSpec, Tables}
import graft.stream.Pipeline
import org.apache.spark.sql.functions._

class TileLayoutSpec extends SparkSpec {

  test("tiles materialize date-partitioned and the serving filter prunes partitions") {
    val dir = Files.createTempDirectory("tiles-layout").toString
    val tiles = Pipeline.tileKeys(Pipeline.tiles(
      Pipeline.snap(Pipeline.sanitize(Tables.positions(spark, sf())), 8)))
    TileLayout.write(tiles, dir)

    // directory layout: one dir per window date
    val dateDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("window_date="))
    assert(dateDirs.nonEmpty)

    // a windowStart-day point query prunes to one partition
    val back = TileLayout.read(spark, dir)
    val day = back.select(min(col("window_date"))).head().getDate(0)
    val q = back.filter(col("window_date") === lit(day))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("window_date"), plan)
    assert(q.count() > 0)

    // round-trip completeness
    assert(back.count() == tiles.count())
  }
}
