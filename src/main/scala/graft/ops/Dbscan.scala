package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-level DBSCAN classification (core / border / noise) under the
  * L∞ (Chebyshev) metric on an integer grid — the per-point complement
  * of [[GridCluster]]'s cell-level clustering. L∞ makes the ε-ball a
  * square, so the neighbourhood query is EXACTLY a 3×3 ε-cell equi-join
  * plus a coordinate filter: the classic scalable DBSCAN shape (no
  * distance cross-join anywhere).
  *
  * Scale: points are bucketed once into ε-cells; candidate pairs only
  * ever form between a point and the ≤9 adjacent cells, so the join is
  * equi-keyed and shuffle-partitioned by cell. At 100 TB a pathological
  * hot cell would be salted; the shape stays one exchange + two keyed
  * aggregates.
  */
object Dbscan {

  /** Classify each point of `pts` (id, grp, x, y — integer coords).
    * Core: ≥ `minPts` points (self included) within Chebyshev `eps`.
    * Border: non-core with a core point within `eps`. Else noise.
    * Coordinates must be ≥ 0 (shift before calling) so `div` bucketing
    * truncates identically in Spark and DuckDB. Output per `grp`:
    * (grp, core_pts, border_pts, noise_pts). */
  def classify(pts: DataFrame, eps: Long, minPts: Long): DataFrame = {
    // Small inputs often arrive as ONE split (a single parquet file);
    // spread to the session shuffle width so the 9× scatter and both join
    // sides parallelize — at cluster scale the file layout provides this.
    val width = pts.sparkSession.sessionState.conf.numShufflePartitions
    val p = pts.select(col("id"), col("grp"), col("x"), col("y"),
        expr(s"x div ${eps}L").as("cx"), expr(s"y div ${eps}L").as("cy"))
      .repartition(width)
      .localCheckpoint(false) // one raw scan; feeds both join sides
    // Candidate pairs: left side scatters to its 3×3 ε-cell neighborhood,
    // right side sits in its home cell — equi-join on the cell key only.
    val scat = p.select(col("id").as("ida"), col("x").as("xa"),
        col("y").as("ya"), col("cx"), col("cy"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("ida"), col("xa"), col("ya"),
        (col("cx") + col("dx")).as("ncx"), (col("cy") + col("dy")).as("ncy"))
    val pairs = scat.join(
        p.select(col("id").as("idb"), col("x").as("xb"), col("y").as("yb"),
          col("cx").as("ncx"), col("cy").as("ncy")), Seq("ncx", "ncy"))
      .filter(greatest(abs(col("xa") - col("xb")),
        abs(col("ya") - col("yb"))) <= eps)
      .select(col("ida"), col("idb"))
      .localCheckpoint(false) // reused for the core-neighbour pass
    val ncount = pairs.groupBy(col("ida")).agg(count(lit(1)).as("n"))
    val core = ncount.filter(col("n") >= minPts)
      .select(col("ida").as("idc")).localCheckpoint(false)
    // Border = non-core with ≥1 core neighbour: semi-join the pair list
    // against the core set (pairs include self, so cores trivially pass —
    // filtered to non-core below).
    val hasCore = pairs.join(core.withColumnRenamed("idc", "idb"), Seq("idb"),
        "leftsemi")
      .select(col("ida")).distinct()
    p.join(core.withColumnRenamed("idc", "id").withColumn("is_core", lit(1L)),
        Seq("id"), "left")
      .join(hasCore.withColumnRenamed("ida", "id")
        .withColumn("has_core", lit(1L)), Seq("id"), "left")
      .groupBy(col("grp"))
      .agg(sum(when(col("is_core") === 1L, 1L).otherwise(0L)).as("core_pts"),
        sum(when(col("is_core").isNull && col("has_core") === 1L, 1L)
          .otherwise(0L)).as("border_pts"),
        sum(when(col("is_core").isNull && col("has_core").isNull, 1L)
          .otherwise(0L)).as("noise_pts"))
  }
}
