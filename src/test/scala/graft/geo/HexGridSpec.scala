package graft.geo

import graft.SparkSpec

class HexGridSpec extends SparkSpec {

  /** Seeded property-style loop (scalatestplus bridge unavailable offline). */
  def forAll(n: Int = 500)(f: (Double, Double) => Unit): Unit = {
    val rnd = new scala.util.Random(1234)
    (0 until n).foreach { _ =>
      f(rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
    }
    // include exact boundaries and .5-tie-prone points
    Seq((-90.0, -180.0), (90.0, 180.0), (0.0, 0.0), (45.0, 0.46875), (0.46875, 0.0))
      .foreach { case (la, lo) => f(la, lo) }
  }

  test("cellId is deterministic and parses back") {
    forAll() { (lat, lon) =>
      val c = HexGrid.cellId(lat, lon, 8)
      assert(c == HexGrid.cellId(lat, lon, 8))
      val (res, q, r) = HexGrid.parse(c)
      assert(res == 8)
      assert(c == s"h8:$q:$r")
    }
  }

  test("out-of-range coordinates yield null (mirrors reference UDF guard)") {
    assert(HexGrid.cellIdOrNull(91.0, 0.0, 8) == null)
    assert(HexGrid.cellIdOrNull(-91.0, 0.0, 8) == null)
    assert(HexGrid.cellIdOrNull(0.0, 180.5, 8) == null)
    assert(HexGrid.cellIdOrNull(0.0, -180.5, 8) == null)
    assert(HexGrid.cellIdOrNull(90.0, 180.0, 8) != null)
  }

  test("cell center snaps to its own cell (idempotent snap)") {
    forAll() { (lat, lon) =>
      val c = HexGrid.cellId(lat, lon, 6)
      val (res, q, r) = HexGrid.parse(c)
      val backLat = HexGrid.centerLat(q, r, res)
      val backLon = HexGrid.centerLon(q, r, res)
      // Centers of on-earth cells can exceed poles only at extreme lat; skip those
      if (math.abs(backLat) <= 90 && math.abs(backLon) <= 180) {
        assert(HexGrid.cellId(backLat, backLon, res) == c)
      }
    }
  }

  test("snapped point is within one edge-diameter of cell center") {
    forAll() { (lat, lon) =>
      val c = HexGrid.cellId(lat, lon, 8)
      val (res, q, r) = HexGrid.parse(c)
      val dLat = lat - HexGrid.centerLat(q, r, res)
      val dLon = lon - HexGrid.centerLon(q, r, res)
      val dist = math.sqrt(dLat * dLat + dLon * dLon)
      assert(dist <= 2.0 * HexGrid.edgeDeg(res) + 1e-9)
    }
  }

  test("boundary ring is closed with 7 points (reference invariant app.py:39-41)") {
    val ring = HexGrid.boundary(HexGrid.cellId(42.35, -71.06, 8))
    assert(ring.length == 7)
    assert(ring.head.sameElements(ring.last))
    assert(ring.forall(_.length == 2))
  }

  test("resolution halves edge length and refines cells") {
    assert(HexGrid.edgeDeg(9) == HexGrid.edgeDeg(8) / 2)
    // finer resolution produces at least as many distinct cells
    val pts = (0 until 500).map(i => (-80.0 + i * 0.31, -170.0 + i * 0.67))
    val coarse = pts.map { case (la, lo) => HexGrid.cellId(la, lo, 4) }.distinct.size
    val fine = pts.map { case (la, lo) => HexGrid.cellId(la, lo, 8) }.distinct.size
    assert(fine >= coarse)
  }

  test("HexCellId expression: null inputs and out-of-range → null; matches scala impl") {
    import spark.implicits._
    import graft.geo.hexfunctions._
    val df = Seq(
      (Some(42.35), Some(-71.06)),
      (None: Option[Double], Some(1.0)),
      (Some(1.0), None: Option[Double]),
      (Some(95.0), Some(0.0))
    ).toDF("lat", "lon")
    val out = df.select(hex_cell_id($"lat", $"lon", 8)).collect().map(r => Option(r.getString(0)))
    assert(out(0).contains(HexGrid.cellId(42.35, -71.06, 8)))
    assert(out(1).isEmpty && out(2).isEmpty && out(3).isEmpty)
  }

  test("HexCellId expression matches scala impl over random points (codegen path)") {
    import spark.implicits._
    import graft.geo.hexfunctions._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(2000)((rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180))
    val df = pts.toDF("lat", "lon")
    val got = df.select($"lat", $"lon", hex_cell_id($"lat", $"lon", 8).as("c")).collect()
    got.foreach { r =>
      assert(r.getString(2) == HexGrid.cellId(r.getDouble(0), r.getDouble(1), 8))
    }
  }

  test("HexSql generated SQL (spark dialect) agrees with the expression") {
    import spark.implicits._
    import graft.geo.hexfunctions._
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(2000)((rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180))
    pts.toDF("lat", "lon").createOrReplaceTempView("hex_pts")
    val sql = s"SELECT g_lat, g_lon, cell_id FROM ${HexSql.withCellId("hex_pts", "lat", "lon", 8, dialect = "spark")} t"
    val viaSql = spark.sql(sql).collect()
    viaSql.foreach { r =>
      assert(r.getString(2) == HexGrid.cellId(r.getDouble(0), r.getDouble(1), 8), s"at ${r.getDouble(0)},${r.getDouble(1)}")
    }
  }

  test("HexSql corner CASE agrees with HexGrid corner math") {
    val cells = Seq((8, 10L, -7L), (8, 0L, 0L), (6, -3L, 12L))
    cells.foreach { case (res, q, r) =>
      val rows = spark.sql(
        s"""SELECT i, ${HexSql.cornerLonSql("q", "r", "i", res)} AS clon,
           |          ${HexSql.cornerLatSql("q", "r", "i", res)} AS clat
           |FROM (SELECT $q AS q, $r AS r), (SELECT explode(sequence(0, 6)) AS i)""".stripMargin).collect()
      rows.foreach { row =>
        val i = row.getInt(0)
        assert(row.getDouble(1) == HexGrid.cornerLon(q, r, res, i))
        assert(row.getDouble(2) == HexGrid.cornerLat(q, r, res, i))
      }
    }
  }

  test("hex_boundary expression returns closed ring") {
    import spark.implicits._
    import graft.geo.hexfunctions._
    val df = Seq(HexGrid.cellId(42.35, -71.06, 8)).toDF("cell")
    val ring = df.select(hex_boundary($"cell")).collect()(0)
      .getSeq[scala.collection.Seq[Double]](0)
    assert(ring.length == 7)
    assert(ring.head == ring.last)
  }
}
