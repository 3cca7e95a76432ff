package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve linearization of the axial hex grid — [[ZOrder]]'s
  * sibling with strictly better locality: consecutive Hilbert indexes
  * are ALWAYS grid-adjacent (|Δq|+|Δr| = 1), so a d-range of cells is
  * one connected blob with no Morton "seams" (z-order jumps across the
  * map each time a high bit flips). For range-partitioned file layout
  * that means a viewport scan touches fewer files at the same bucket
  * width — the reason Delta/Iceberg added Hilbert alongside Z-ordering.
  *
  * Implementation: the classic per-level rotate+reflect recurrence
  * (Hamilton's compact form; see Wikipedia "Hilbert curve", xy2d),
  * unrolled over `bits` levels. Each level is pure integer CASE/`&`
  * arithmetic on (x, y, d) — the quadrant term `3·rx XOR ry` is
  * rewritten arithmetically as `3·rx + ry − 2·rx·ry` (identical on
  * {0,1}²) so the SAME generated SQL text runs in Spark AND DuckDB
  * (no dialect-divergent xor). Levels materialize as chained
  * projections (Spark: withColumn chain; oracle: CTE chain) — textual
  * substitution would blow up exponentially in `bits`.
  */
object Hilbert {

  /** Per-level update expressions over free column names; returns
    * (newX, newY, newD) SQL snippets — dialect-portable. */
  private def step(s: Long, x: String, y: String, d: String)
      : (String, String, String) = {
    val rx = s"(CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END)"
    val quad = s"(3 * $rx + $ry - 2 * $rx * $ry)"
    val newD = s"($d + ${s * s} * $quad)"
    val newX = s"(CASE WHEN $ry = 0 THEN " +
      s"(CASE WHEN $rx = 1 THEN ${s - 1} - $y ELSE $y END) ELSE $x END)"
    val newY = s"(CASE WHEN $ry = 0 THEN " +
      s"(CASE WHEN $rx = 1 THEN ${s - 1} - $x ELSE $x END) ELSE $y END)"
    (newX, newY, newD)
  }

  /** Append column `dCol` = Hilbert index of the signed grid coords
    * (clamped to the 2^bits × 2^bits domain exactly like
    * [[ZOrder.zvalue]] — out-of-range cells pile at the edge rather
    * than wrapping across the map). Internal `__hx/__hy/__hd*` columns
    * are dropped before returning. */
  def withHilbert(df: DataFrame, q: Column, r: Column, dCol: String,
                  bits: Int = 8): DataFrame = {
    val off = 1L << (bits - 1)
    val base = df
      .withColumn("__hx0", greatest(lit(-off), least(lit(off - 1), q)) + lit(off))
      .withColumn("__hy0", greatest(lit(-off), least(lit(off - 1), r)) + lit(off))
      .withColumn("__hd0", lit(0L))
    val levels = (bits - 1) to 0 by -1
    val folded = levels.zipWithIndex.foldLeft(base) { case (acc, (lvl, i)) =>
      val (nx, ny, nd) = step(1L << lvl, s"__hx$i", s"__hy$i", s"__hd$i")
      acc.withColumn(s"__hx${i + 1}", expr(nx))
        .withColumn(s"__hy${i + 1}", expr(ny))
        .withColumn(s"__hd${i + 1}", expr(nd))
        .drop(s"__hx$i", s"__hy$i", s"__hd$i")
    }
    folded.withColumn(dCol, col(s"__hd$bits"))
      .drop(s"__hx$bits", s"__hy$bits", s"__hd$bits")
  }

  /** Oracle twin: CTE chain computing the same levels over the same
    * generated snippets. `src` is a relation producing `qCol`,`rCol`
    * plus `keepCols`; result exposes keepCols + `d`. */
  def cteSql(src: String, qCol: String, rCol: String, keepCols: Seq[String],
             bits: Int = 8): String = {
    val off = 1L << (bits - 1)
    val keep = keepCols.mkString(", ")
    val keepPfx = if (keepCols.isEmpty) "" else keep + ", "
    val base = s"SELECT $keepPfx" +
      s"GREATEST(-$off, LEAST(${off - 1}, $qCol)) + $off AS hx0, " +
      s"GREATEST(-$off, LEAST(${off - 1}, $rCol)) + $off AS hy0, " +
      s"CAST(0 AS BIGINT) AS hd0 FROM $src"
    val levels = (bits - 1) to 0 by -1
    val ctes = levels.zipWithIndex.map { case (lvl, i) =>
      val (nx, ny, nd) = step(1L << lvl, s"hx$i", s"hy$i", s"hd$i")
      s"h${i + 1} AS (SELECT $keepPfx$nx AS hx${i + 1}, $ny AS hy${i + 1}, " +
        s"$nd AS hd${i + 1} FROM h$i)"
    }
    (s"h0 AS ($base)" +: ctes).mkString(",\n") +
      s",\nhf AS (SELECT $keepPfx" + s"hd$bits AS d FROM h$bits)"
  }
}
