package graft.geo

/** Deterministic pointy-top axial hex grid over (lat, lon) degrees.
  *
  * Plays the role of the H3 cell snap in the reference
  * (`/root/reference/heatmap_stream.py:65-75`, resolution config `:26`) and
  * its inverse boundary ring (`/root/reference/app.py:19-41`). True H3 is an
  * icosahedral projection backed by a native library that is not available
  * offline; per SURVEY.md §7.3 we preserve the *semantics* — a stable,
  * resolution-parameterized `(lat, lon) -> cellId` snap with an invertible
  * closed boundary ring — using pure floor/abs double math so the exact same
  * formula is expressible in ANSI SQL for the DuckDB oracle.
  *
  * All arithmetic is IEEE-754 double ops (`* / + - floor abs`) which evaluate
  * bit-identically on the JVM and in DuckDB, so the Catalyst expression and
  * the generated oracle SQL (see [[HexSql]]) agree exactly.
  *
  * Geometry: axial coordinates (q, r), pointy-top orientation, cell edge
  * length in degrees `edgeDeg(res) = 360 / (3 * 2^res)` (res 8 ≈ 0.469°;
  * every value is k/2^n so the decimal literal round-trips exactly).
  */
object HexGrid {
  /** sqrt(3), sqrt(3)/3, 1/3, 2/3 as exact double literals — keep in sync
    * with [[HexSql]] which embeds the same decimal strings. */
  final val Sqrt3: Double = 1.7320508075688772
  final val Sqrt3Div3: Double = 0.5773502691896257
  final val OneThird: Double = 0.3333333333333333
  final val TwoThirds: Double = 0.6666666666666666

  /** Cell edge length in degrees at `res`; halves with each resolution. */
  def edgeDeg(res: Int): Double = 360.0 / (3.0 * (1L << res).toDouble)

  /** Fractional axial q coordinate (pointy-top pixel->hex transform). */
  def fracQ(lat: Double, lon: Double, res: Int): Double =
    (Sqrt3Div3 * lon - OneThird * lat) / edgeDeg(res)

  /** Fractional axial r coordinate. */
  def fracR(lat: Double, res: Int): Double =
    (TwoThirds * lat) / edgeDeg(res)

  /** Round fractional axial coords to the containing cell (cube rounding).
    * Uses floor(x + 0.5) — NOT Math.round/rint — because floor(x + 0.5) is
    * what the SQL formulation uses and the two differ on exact .5 ties. */
  def roundQ(q: Double, r: Double): Long = {
    val y = -q - r
    val rx = math.floor(q + 0.5); val ry = math.floor(y + 0.5); val rz = math.floor(r + 0.5)
    val dx = math.abs(rx - q); val dy = math.abs(ry - y); val dz = math.abs(rz - r)
    if (dx > dy && dx > dz) (-ry - rz).toLong else rx.toLong
  }

  def roundR(q: Double, r: Double): Long = {
    val y = -q - r
    val rx = math.floor(q + 0.5); val ry = math.floor(y + 0.5); val rz = math.floor(r + 0.5)
    val dx = math.abs(rx - q); val dy = math.abs(ry - y); val dz = math.abs(rz - r)
    if (dx > dy && dx > dz) rz.toLong
    else if (dy > dz) rz.toLong
    else (-rx - ry).toLong
  }

  def axialQ(lat: Double, lon: Double, res: Int): Long =
    roundQ(fracQ(lat, lon, res), fracR(lat, res))

  def axialR(lat: Double, lon: Double, res: Int): Long =
    roundR(fracQ(lat, lon, res), fracR(lat, res))

  /** Stable opaque cell id, e.g. `h8:-12:407`. Null-safety and the
    * [-90,90]/[-180,180] range guard live in the Catalyst expression /
    * pipeline filters (reference duplicates them inside the UDF,
    * `heatmap_stream.py:67-69`). */
  def cellId(lat: Double, lon: Double, res: Int): String =
    "h" + res + ":" + axialQ(lat, lon, res) + ":" + axialR(lat, lon, res)

  /** Range-guarded variant mirroring `heatmap_stream.py:66-69`: returns null
    * outside valid lat/lon instead of snapping. */
  def cellIdOrNull(lat: Double, lon: Double, res: Int): String =
    if (lat < -90.0 || lat > 90.0 || lon < -180.0 || lon > 180.0) null
    else cellId(lat, lon, res)

  /** Parse `h{res}:{q}:{r}`; throws on malformed input. */
  def parse(cell: String): (Int, Long, Long) = {
    require(cell != null && cell.length > 1 && cell.charAt(0) == 'h', s"bad cell id: $cell")
    val parts = cell.substring(1).split(":", -1)
    require(parts.length == 3, s"bad cell id: $cell")
    (parts(0).toInt, parts(1).toLong, parts(2).toLong)
  }

  /** Cell center (axial->pixel transform). */
  def centerLon(q: Long, r: Long, res: Int): Double =
    edgeDeg(res) * (Sqrt3 * q.toDouble + Sqrt3 * 0.5 * r.toDouble)

  def centerLat(q: Long, r: Long, res: Int): Double =
    edgeDeg(res) * (1.5 * r.toDouble)

  /** Pointy-top corner unit offsets at angles 30°,90°,…,330° (cos, sin) —
    * exact constants, no trig at runtime. Index 6 repeats index 0 so the
    * ring is closed, matching the reference invariant `app.py:39-41`. */
  final val CornerLonUnit: Array[Double] =
    Array(0.8660254037844386, 0.0, -0.8660254037844386, -0.8660254037844386, 0.0, 0.8660254037844386, 0.8660254037844386)
  final val CornerLatUnit: Array[Double] =
    Array(0.5, 1.0, 0.5, -0.5, -1.0, -0.5, 0.5)

  def cornerLon(q: Long, r: Long, res: Int, i: Int): Double =
    centerLon(q, r, res) + edgeDeg(res) * CornerLonUnit(i)

  def cornerLat(q: Long, r: Long, res: Int, i: Int): Double =
    centerLat(q, r, res) + edgeDeg(res) * CornerLatUnit(i)

  /** Closed boundary ring as [lon, lat] pairs (GeoJSON coordinate order),
    * 7 points with first == last — the U2 inverse (`app.py:19-41`). */
  def boundary(cell: String): Array[Array[Double]] = {
    val (res, q, r) = parse(cell)
    Array.tabulate(7)(i => Array(cornerLon(q, r, res, i), cornerLat(q, r, res, i)))
  }

  /** Catalyst-shaped boundary (called from generated code — see
    * HexBoundary.doGenCode). */
  def boundaryArrayData(cell: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val (res, q, r) = parse(cell)
    val pts = new Array[Any](7)
    var i = 0
    while (i < 7) {
      pts(i) = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](cornerLon(q, r, res, i), cornerLat(q, r, res, i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(pts)
  }
}
