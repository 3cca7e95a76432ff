package graft.ops

import graft.SparkSpec
import graft.geo.HexGrid
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class MobilitySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)
  // two coordinates far enough apart to land in different res-3 cells
  private val pA = (10.0, 10.0)
  private val pB = (40.0, 40.0)

  private def pos(rows: Seq[(String, Long, Double, Double)]) =
    rows.map { case (v, t, la, lo) => (v, ts(t), t, la, lo) }
      .toDF("vehicleId", "eventTs", "event_id", "lat", "lon")

  test("odMatrix: first and last cell per bucket, argmin/max by time") {
    val cA = HexGrid.cellId(pA._1, pA._2, 3)
    val cB = HexGrid.cellId(pB._1, pB._2, 3)
    assert(cA !== cB)
    // v1 moves A → B within one day; v2 stays at A.
    val df = pos(Seq(("v1", 100L, pA._1, pA._2), ("v1", 200L, pB._1, pB._2),
      ("v2", 150L, pA._1, pA._2)))
    val r = Mobility.odMatrix(df, 3, 86400000000L)
      .as[(String, String, Long)].collect().toSet
    assert(r === Set((cA, cB, 1L), (cA, cA, 1L)))
  }

  test("odMatrix: bucket boundaries split journeys") {
    val cA = HexGrid.cellId(pA._1, pA._2, 3)
    val cB = HexGrid.cellId(pB._1, pB._2, 3)
    val day = 86400L
    val df = pos(Seq(("v1", 100L, pA._1, pA._2),
      ("v1", day + 100L, pB._1, pB._2)))
    val r = Mobility.odMatrix(df, 3, 86400000000L)
      .as[(String, String, Long)].collect().toSet
    assert(r === Set((cA, cA, 1L), (cB, cB, 1L)))
  }

  test("hexSmooth: isolated cell averages only itself over the disk") {
    val df = pos(Seq.fill(7)(("v1", 100L, pA._1, pA._2))
      .zipWithIndex.map { case ((v, t, la, lo), i) => (v, t + i, la, lo) })
    val r = Mobility.hexSmooth(df, 3)
      .as[(String, Long, Long)].collect()
    assert(r.length === 1)
    assert(r.head._2 === 7L)
    assert(r.head._3 === 1000000L) // 7·1e6 div 7
  }

  test("hexSmooth: occupied neighbors add into the disk total") {
    // Build a neighbor pair via axial centers: cell (q,r) and (q+1,r).
    val c0 = HexGrid.cellId(pA._1, pA._2, 3)
    val (rs, q0, r0) = HexGrid.parse(c0)
    val nbLat = HexGrid.centerLat(q0 + 1, r0, rs)
    val nbLon = HexGrid.centerLon(q0 + 1, r0, rs)
    val df = pos(Seq(("v1", 1L, pA._1, pA._2), ("v2", 2L, nbLat, nbLon),
      ("v3", 3L, nbLat, nbLon)))
    val r = Mobility.hexSmooth(df, 3)
      .as[(String, Long, Long)].collect().map(x => x._1 -> x._3).toMap
    // disk(c0) = 1 + 2 = 3 → 428571; disk(nb) = 2 + 1 = 3 → 428571
    assert(r.values.toSet === Set(428571L))
    assert(r.size === 2)
  }

  test("dwellTime: lead gaps accrue to the occupied cell, capped") {
    val cA = HexGrid.cellId(pA._1, pA._2, 3)
    val cB = HexGrid.cellId(pB._1, pB._2, 3)
    // v1: at A for 10s, then at B (last point → 0 dwell).
    // v2: at A, next point 2h later → capped at 3600s.
    val df = pos(Seq(("v1", 100L, pA._1, pA._2), ("v1", 110L, pB._1, pB._2),
      ("v2", 0L, pA._1, pA._2), ("v2", 7200L, pA._1, pA._2)))
    val r = Mobility.dwellTime(df, 3, 3600000000L)
      .as[(String, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3)))
      .toMap
    assert(r(cB) === ((1L, 0L)))
    assert(r(cA) === ((3L, 10L + 3600L)))
  }
}
