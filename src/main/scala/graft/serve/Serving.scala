package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.geo.hexfunctions._

/** The read path (`app.py` routes) as batch DataFrame functions over the
  * materialized keyed tables (SURVEY.md §3.3 — an HTTP layer is out of
  * scope; these produce exactly the payload shapes the Flask app emits).
  */
object Serving {

  /** Q3/A4: the single most recent windowStart. */
  def latestWindowStart(tiles: DataFrame): DataFrame =
    tiles.agg(max(col("windowStart")).as("windowStart"))

  /** Q1: all tiles of the latest window (broadcast the 1-row max — no
    * second scan-wide shuffle). */
  def tilesLatest(tiles: DataFrame): DataFrame =
    tiles.join(broadcast(latestWindowStart(tiles).withColumnRenamed("windowStart", "mw")),
        col("windowStart") === col("mw"))
      .drop("mw")

  /** Q1 projection: GeoJSON Feature rows — Polygon geometry from the U2
    * boundary ring (`app.py:58-67`), properties carried as a struct. */
  def tileFeatures(tilesOfWindow: DataFrame): DataFrame =
    tilesOfWindow.select(struct(
      lit("Feature").as("type"),
      struct(lit("Polygon").as("type"),
        array(hex_boundary(col("cellId"))).as("coordinates")).as("geometry"),
      struct(col("cellId"), col("cnt"), col("avgSpeedKmh"),
        col("windowStart"), col("windowEnd")).as("properties")).as("feature"))

  /** Q2: latest positions as GeoJSON Point features (`app.py:71-88`). */
  def positionFeatures(latest: DataFrame): DataFrame =
    latest.select(struct(
      lit("Feature").as("type"),
      struct(lit("Point").as("type"),
        array(col("lon"), col("lat")).as("coordinates")).as("geometry"),
      struct(col("provider"), col("vehicleId"), col("eventTs")).as("properties")).as("feature"))

  /** The FeatureCollection envelope (`app.py:69`) — a serving-path
    * emission for an API handler. The per-feature JSON is computed
    * distributed by `to_json`; the driver STREAMS the feature lines via
    * `toLocalIterator` (one partition in memory at a time) instead of
    * `collect()`, so a hot window whose feature set outgrows driver
    * memory at 100× still serializes — the envelope is O(1) driver
    * state plus the output stream. */
  def featureCollectionJson(features: DataFrame): String = {
    val sb = new java.lang.StringBuilder("""{"type":"FeatureCollection","features":[""")
    val it = features.select(to_json(col("feature")).as("j")).toLocalIterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(',')
      sb.append(it.next().getString(0))
      first = false
    }
    sb.append("]}").toString
  }
}
