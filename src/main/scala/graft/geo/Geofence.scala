package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Convex-polygon geofencing over integer coordinates (e.g. centidegree
  * lat/lon): a point is inside a convex polygon with counter-clockwise
  * vertices iff it lies left-of-or-on every directed edge — one integer
  * cross product per edge, AND'd.
  *
  * The test compiles to a pure codegen'd predicate (no join, no UDF, no
  * shuffle): at 100 TB the plan is scan → filter → aggregate with the
  * predicate pushed into the scan where the source supports it. All
  * arithmetic is exact 64-bit integer (edge deltas × coordinate offsets
  * — microdegree-scale inputs keep every product far below 2⁶³), so
  * results are bit-identical in any engine, which is what lets a plain
  * SQL oracle replay it. Reference analogue: the bbox filtering of
  * `heatmap_stream.py` generalized from axis-aligned boxes to arbitrary
  * convex fences.
  */
object Geofence {

  private def requireConvexCcw(verts: Seq[(Long, Long)]): Unit = {
    require(verts.size >= 3, "polygon needs >= 3 vertices")
    val n = verts.size
    val crosses = verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % n)
      val (x3, y3) = verts((i + 2) % n)
      (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
    }
    require(crosses.forall(_ > 0),
      "vertices must be strictly convex in counter-clockwise order")
  }

  /** Predicate: (x, y) inside-or-on the convex CCW polygon `verts`. */
  def insideConvex(x: Column, y: Column, verts: Seq[(Long, Long)]): Column = {
    requireConvexCcw(verts)
    verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % verts.size)
      (lit(x2 - x1) * (y - lit(y1)) - lit(y2 - y1) * (x - lit(x1))) >= 0
    }.reduce(_ && _)
  }

  /** SQL twin of [[insideConvex]] for the DuckDB oracle. */
  def insideConvexSql(x: String, y: String, verts: Seq[(Long, Long)]): String = {
    requireConvexCcw(verts)
    verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % verts.size)
      s"((${x2 - x1}) * ($y - ($y1)) - (${y2 - y1}) * ($x - ($x1)) >= 0)"
    }.mkString("(", " AND ", ")")
  }
}
