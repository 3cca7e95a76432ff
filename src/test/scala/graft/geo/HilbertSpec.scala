package graft.geo

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Reference scalar xy2d (Wikipedia's canonical loop) — an independent
    * implementation the column version must match cell-for-cell. */
  private def xy2d(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  private def fullGrid(bits: Int): Map[(Long, Long), Long] = {
    val n = 1 << bits
    val off = 1L << (bits - 1)
    val grid = spark.range(n.toLong * n)
      .select((col("id") % n - off).as("q"), (expr(s"id div $n") - off).as("r"))
    Hilbert.withHilbert(grid, col("q"), col("r"), "d", bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("bits=4: matches the canonical scalar xy2d on every cell") {
    val got = fullGrid(4)
    val off = 8
    got.foreach { case ((q, r), d) =>
      assert(d === xy2d(16, (q + off).toInt, (r + off).toInt),
        s"mismatch at ($q,$r)")
    }
  }

  test("bits=4: d is a bijection onto 0..255") {
    val got = fullGrid(4)
    assert(got.values.toSet === (0L until 256L).toSet)
  }

  test("bits=4: consecutive d are ALWAYS grid-adjacent — the locality property z-order lacks") {
    val got = fullGrid(4)
    val byD = got.map(_.swap)
    (0L until 255L).foreach { d =>
      val (q1, r1) = byD(d); val (q2, r2) = byD(d + 1)
      assert(math.abs(q1 - q2) + math.abs(r1 - r2) === 1,
        s"jump between d=$d ($q1,$r1) and d=${d + 1} ($q2,$r2)")
    }
  }

  test("out-of-domain coordinates clamp to the edge (no wraparound)") {
    val df = Seq((1000L, -1000L), (7L, -8L)).toDF("q", "r")
    val d = Hilbert.withHilbert(df, col("q"), col("r"), "d", 4)
      .collect().map(_.getLong(2))
    assert(d(0) === d(1), "clamped coords must collide with the edge cell")
  }

  test("oracle CTE chain produces identical d (DuckDB-dialect text, run through Spark SQL)") {
    // the generated per-level SQL is dialect-shared; running the CTE in
    // Spark cross-checks the chain against the withColumn fold
    val n = 16
    spark.range(n.toLong * n)
      .select((col("id") % n - 8).as("q"), (expr(s"id div $n") - 8).as("r"))
      .createOrReplaceTempView("hgrid")
    // the generated text has no dialect-divergent operator (only
    // +,-,*,&,CASE,GREATEST/LEAST) — usable verbatim by either engine
    val sql = "WITH " + Hilbert.cteSql("hgrid", "q", "r", Seq("q", "r"), 4) +
      " SELECT q, r, d FROM hf"
    val viaSql = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(viaSql === fullGrid(4))
  }
}
