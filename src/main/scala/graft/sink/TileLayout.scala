package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout for materialized tiles — the Spark equivalent of the
  * reference store's compound indexes (`README.md:143-150`: (city, grid,
  * windowStart desc), (cellId, windowStart desc); SURVEY.md §2.8):
  *
  *  - directory partitioning by window date → partition PRUNING for the
  *    serving path's windowStart point/range queries (scan touches one
  *    date dir out of years of history);
  *  - `sortWithinPartitions(cellId)` → parquet row-group min/max statistics
  *    give cellId locality, so tile point-lookups skip row groups the way
  *    a secondary index skips pages.
  *
  * At 100 TB this layout decision — not an index structure — is what keeps
  * the serving queries interactive.
  */
object TileLayout {

  def write(tiles: DataFrame, path: String): Unit =
    tiles.withColumn("window_date", to_date(col("windowStart")))
      .repartition(col("window_date"))
      // window_date leads so the sort satisfies the writer's required
      // ordering (otherwise FileFormatWriter re-sorts on the partition col
      // alone and the cellId clustering is lost)
      .sortWithinPartitions(col("window_date"), col("cellId"), col("windowStart"))
      .write.mode("overwrite").partitionBy("window_date").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
