package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType

/** GeoJSON Point value (`heatmap_stream.py:185,225`). */
case class GeoPoint(`type`: String, coordinates: Seq[Double])

/** The declared input event — field-for-field the reference's explicit
  * stream schema (`heatmap_stream.py:52-61`, README example :195-204).
  * Option[_] for every nullable field; the derived encoder schema IS the
  * `from_json` schema (single source of truth — see Pipeline). */
case class PositionEvent(
    provider: String,
    vehicleId: String,
    lat: Option[Double],
    lon: Option[Double],
    speedKmh: Option[Double],
    bearing: Option[Int],
    accuracyM: Option[Int],
    ts: String)

/** One aggregated tile row (`heatmap_stream.py:176-187`, FIXTURES.md §2). */
case class Tile(
    tileKey: String,
    city: String,
    grid: String,
    cellId: String,
    windowStart: Timestamp,
    windowEnd: Timestamp,
    cnt: Long,
    avgSpeedKmh: Option[Double],
    centroid: GeoPoint,
    staleAt: Timestamp)

/** One latest-position row (`heatmap_stream.py:217-228`). */
case class LatestPosition(
    provider: String,
    vehicleId: String,
    ts: Timestamp,
    loc: GeoPoint)

object Model {
  /** The canonical input StructType, derived from the case class. */
  val positionSchema: StructType = Encoders.product[PositionEvent].schema
}
