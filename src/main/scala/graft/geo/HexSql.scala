package graft.geo

/** Generates ANSI-SQL formulations of [[HexGrid]] math, kept in 1:1
  * correspondence with the Scala/Catalyst implementation so the DuckDB
  * oracle and the Spark pipeline agree bit-for-bit on cell assignment.
  *
  * Every constant is embedded as `CAST('<decimal>' AS DOUBLE)` — a string
  * parse is correctly rounded in both engines, whereas a bare decimal
  * literal becomes DECIMAL in DuckDB and its implicit conversion to double
  * is not guaranteed to round identically.
  *
  * Only `+ - * / floor abs CASE` over doubles are used; these are IEEE-754
  * deterministic and identical across the JVM, Spark SQL, and DuckDB.
  */
object HexSql {

  private def d(v: Double): String = s"CAST('${java.lang.Double.toString(v)}' AS DOUBLE)"

  private def strCast(e: String, dialect: String): String =
    if (dialect == "spark") s"CAST($e AS STRING)" else s"CAST($e AS VARCHAR)"

  /** Wraps `from` (a table name or parenthesized subquery) in a subquery
    * chain that computes `cell_id` (and axial `g_qi`,`g_ri`) from
    * `latExpr`/`lonExpr`. All original columns are passed through via
    * SELECT *; intermediate columns are prefixed g_.
    *
    * Mirrors HexGrid.fracQ/fracR/roundQ/roundR/cellId exactly.
    */
  def withCellId(from: String, latExpr: String, lonExpr: String, res: Int,
                 dialect: String = "duckdb"): String = {
    val edge = d(HexGrid.edgeDeg(res))
    val s3d3 = d(HexGrid.Sqrt3Div3)
    val third = d(HexGrid.OneThird)
    val twoThirds = d(HexGrid.TwoThirds)
    val half = d(0.5)
    val cellStr = s"concat('h$res:', ${strCast("g_qi", dialect)}, ':', ${strCast("g_ri", dialect)})"
    s"""(SELECT *, $cellStr AS cell_id FROM
       |(SELECT *,
       |  CASE WHEN g_dx > g_dy AND g_dx > g_dz THEN CAST(0.0 - g_ry - g_rz AS BIGINT) ELSE CAST(g_rx AS BIGINT) END AS g_qi,
       |  CASE WHEN g_dx > g_dy AND g_dx > g_dz THEN CAST(g_rz AS BIGINT)
       |       WHEN g_dy > g_dz THEN CAST(g_rz AS BIGINT)
       |       ELSE CAST(0.0 - g_rx - g_ry AS BIGINT) END AS g_ri
       | FROM
       |(SELECT *, abs(g_rx - g_q) AS g_dx, abs(g_ry - (0.0 - g_q - g_r)) AS g_dy, abs(g_rz - g_r) AS g_dz FROM
       |(SELECT *, floor(g_q + $half) AS g_rx, floor((0.0 - g_q - g_r) + $half) AS g_ry, floor(g_r + $half) AS g_rz FROM
       |(SELECT *, ($s3d3 * g_lon - $third * g_lat) / $edge AS g_q, ($twoThirds * g_lat) / $edge AS g_r FROM
       |(SELECT *, CAST(($latExpr) AS DOUBLE) AS g_lat, CAST(($lonExpr) AS DOUBLE) AS g_lon FROM $from)
       |)))))""".stripMargin
  }

  /** Deterministic synthetic lat/lon for the `events` table (the shared
    * testdata carries no coordinates — SURVEY.md §7.2): integer-exact
    * modular arithmetic then one double division, so both engines agree.
    * lat ∈ [-85, 85), lon ∈ [-175, 175). */
  val eventLatSql = "CAST((user_id * 37) % 17000 AS DOUBLE) / CAST('100.0' AS DOUBLE) - CAST('85.0' AS DOUBLE)"
  val eventLonSql = "CAST((event_id * 91) % 35000 AS DOUBLE) / CAST('100.0' AS DOUBLE) - CAST('175.0' AS DOUBLE)"

  /** Corner lon/lat CASE expressions over a 0..6 corner index column.
    * Mirrors HexGrid.cornerLon/cornerLat: edge*(sqrt3*q + sqrt3*0.5*r) +
    * edge*unitLon[i] and edge*(1.5*r) + edge*unitLat[i]. */
  def cornerLonSql(qiCol: String, riCol: String, idxCol: String, res: Int): String = {
    val edge = d(HexGrid.edgeDeg(res)); val s3 = d(HexGrid.Sqrt3)
    val center = s"$edge * ($s3 * CAST($qiCol AS DOUBLE) + $s3 * ${d(0.5)} * CAST($riCol AS DOUBLE))"
    val cases = HexGrid.CornerLonUnit.zipWithIndex.map { case (u, i) =>
      s"WHEN $idxCol = $i THEN $center + $edge * ${d(u)}"
    }.mkString(" ")
    s"(CASE $cases END)"
  }

  def cornerLatSql(qiCol: String, riCol: String, idxCol: String, res: Int): String = {
    val edge = d(HexGrid.edgeDeg(res))
    val center = s"$edge * (${d(1.5)} * CAST($riCol AS DOUBLE))"
    val cases = HexGrid.CornerLatUnit.zipWithIndex.map { case (u, i) =>
      s"WHEN $idxCol = $i THEN $center + $edge * ${d(u)}"
    }.mkString(" ")
    s"(CASE $cases END)"
  }
}
