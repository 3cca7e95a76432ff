package graft.geo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distance-threshold (radius) self-join over planar integer coordinates
  * — the batch form of "which vehicles are within R of each other", the
  * proximity question a fleet heatmap (reference's tile density,
  * `heatmap_stream.py:112-133`) cannot answer because tiles erase
  * pairwise structure.
  *
  * Blocking: snap each point to an R×R grid cell; any pair within R lies
  * in the same or an adjacent cell, so candidates come from 9 cell-offset
  * equi-joins (expressed as ONE equi-join on the exploded 3×3 neighbor
  * stamp of the left side — shuffle stays hash-partitioned on cell).
  * Exact filter: integer squared distance dx²+dy² ≤ R², so the result is
  * bit-exact in any engine — no trig, no doubles. Each unordered pair is
  * kept once via id ordering.
  *
  * Scale: candidate volume is Σ per-cell (9·n_cell·n̄_neighbor) — local
  * density, not n². At 100 TB the grid inherits AQE skew splitting on
  * hot cells; R controls the block granularity exactly like LSH band
  * width controls dedup candidate volume.
  */
object RadiusJoin {

  /** Pairs (id_a < id_b) with squared distance ≤ r². `df(idCol, xCol,
    * yCol)` must carry unique ids and NON-NEGATIVE integer coordinates
    * (integer `div` truncates toward zero, so grid cells would misalign
    * below zero — shift first if needed). Each qualifying pair joins in
    * exactly one (stamp, home) cell, so no dedup pass is needed. */
  def selfJoin(df: DataFrame, idCol: String, xCol: String, yCol: String,
               r: Long): DataFrame = {
    require(r >= 1, "radius must be >= 1")
    val pts = df.select(col(idCol).as("id"), col(xCol).as("x"), col(yCol).as("y"))
    val stamped = pts.select(col("id"), col("x"), col("y"),
        explode(sequence(lit(-1L), lit(1L))).as("ox"))
      .select(col("id"), col("x"), col("y"),
        (expr(s"x div $r") + col("ox")).as("cx"),
        explode(sequence(lit(-1L), lit(1L))).as("oy"))
      .select(col("id"), col("x"), col("y"), col("cx"),
        (expr(s"y div $r") + col("oy")).as("cy"))
    val homed = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), expr(s"x div $r").as("cx"), expr(s"y div $r").as("cy"))
    val dsq = (col("x") - col("xb")) * (col("x") - col("xb")) +
      (col("y") - col("yb")) * (col("y") - col("yb"))
    stamped.join(homed, Seq("cx", "cy"))
      .filter(col("id") < col("id_b") && dsq <= lit(r * r))
      .select(col("id").as("id_a"), col("id_b"), dsq.as("dist_sq"))
  }
}
