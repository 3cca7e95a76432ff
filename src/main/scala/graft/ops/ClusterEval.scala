package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering-quality evaluation over an embedding table — the audit a
  * training-data pipeline runs after k-means/IVF assignment to decide
  * whether label granularity is right before sharding by cluster.
  *
  * Simplified (centroid) silhouette: per point, a = d²(x, own-label
  * centroid), b = min over other labels of d²(x, centroid). The score
  * (b−a)/max(a,b) ∈ [−1,1] is computed on SQUARED distances (monotone in
  * the classic score, no sqrt — keeps everything integer-exact) in e6
  * fixed point via integer cross-division, so the DuckDB oracle
  * hash-matches bit-for-bit.
  *
  * Scale: centroids are k·dim rows (tiny — broadcast); the per-point
  * score is ONE component-exploded join against that broadcast plus two
  * keyed aggregates. Nothing is quadratic in points — contrast with true
  * pairwise silhouette, which is O(n²) and needs sampling at 100 TB.
  */
object ClusterEval {

  /** Per-label silhouette audit of `emb` (vec_id, embedding, label).
    * Embeddings quantize to e6 ints; centroid components are
    * floor(sum/count) — exact (see below) and reproducible cross-engine.
    * Output: (label, n_vecs, sum_sil_e6, n_neg) — sum (not mean) keeps
    * the result BIGINT without negative-division floor/truncate skew.
    */
  def centroidSilhouette(emb: DataFrame): DataFrame = {
    val q = emb.select(col("vec_id"), col("label").cast("long").as("label"),
      expr("""transform(CAST(embedding AS ARRAY<DOUBLE>),
             |          x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))"""
        .stripMargin).as("qv"))
    // (vec, own label, component index, value); dim·n rows, one scan.
    val comp = q.select(col("vec_id"), col("label"),
        posexplode(col("qv")).as(Seq("i", "v")))
      .localCheckpoint(false) // feeds centroids AND the distance join
    // Centroid component = floor(sum/count) over doubles: sums are ≤
    // n·1e6 ≈ 2e9 ≪ 2^53 so the division is correctly rounded, and the
    // true rational is ≥ 1/n away from any other integer — floor is
    // EXACT, hence identical in Spark and DuckDB.
    val cent = comp.groupBy(col("label").as("cl"), col("i"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
        .cast("long").as("c"))
    // d²(point, every centroid): equi-join on component index against the
    // broadcast k·dim centroid frame, then one (vec, label) keyed sum.
    val d2 = comp.join(broadcast(cent), Seq("i"))
      .groupBy(col("vec_id"), col("label"), col("cl"))
      .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d2"))
    val ab = d2.groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("cl") === col("label"), col("d2"))).as("a"),
        min(when(col("cl") =!= col("label"), col("d2"))).as("b"))
    // s_e6 = 1e6·(b−a)/max(a,b) by integer cross-division; the 1e6·d²
    // product overflows int64 (d² ≤ dim·(2e6)² ≈ 2.6e14 → 2.6e20), so it
    // rides DECIMAL(38,0) (HUGEINT in the oracle). Both operands are
    // non-negative, so div truncation == floor in both engines.
    val s = ab.selectExpr("label",
      """CASE WHEN a = b THEN 0L
        |     WHEN b > a THEN 1000000L -
        |       CAST(CAST(1000000 AS DECIMAL(38,0)) * CAST(a AS DECIMAL(38,0))
        |            div CAST(b AS DECIMAL(38,0)) AS BIGINT)
        |     ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0))
        |            div CAST(a AS DECIMAL(38,0)) AS BIGINT) - 1000000L
        |END AS s_e6""".stripMargin)
    s.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("s_e6")).as("sum_sil_e6"),
        sum(when(col("s_e6") < 0, 1L).otherwise(0L)).as("n_neg"))
  }

  /** Embedding drift monitor: per label, the squared L2 distance between
    * the centroid of the `probeFold` slice (vec_id mod 5 = fold) and the
    * centroid of the rest — the "did this batch's embeddings move" alarm
    * a production embedding pipeline keeps per class. Same quantize +
    * floor-exact integer centroids as [[centroidSilhouette]]; d² is in
    * e12 units (e6 coords squared). Output:
    * (label, n_probe, n_ref, drift_d2_e12).
    *
    * Scale: two tiny centroid aggregates off one component-exploded
    * scan; the comparison joins k·dim against k·dim. */
  def centroidDrift(emb: DataFrame, probeFold: Long = 0L): DataFrame = {
    val comp = emb.select(col("vec_id"),
        col("label").cast("long").as("label"),
        posexplode(expr(
          """transform(CAST(embedding AS ARRAY<DOUBLE>),
            |          x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))"""
            .stripMargin)).as(Seq("i", "v")))
      .withColumn("probe", (col("vec_id") % 5 === probeFold).cast("int"))
      .localCheckpoint(false)
    def cent(df: DataFrame) = df.groupBy(col("label"), col("i"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
        .cast("long").as("c"),
        count(lit(1)).as("nd")) // rows per (label, i) = n_vecs
    val p = cent(comp.filter(col("probe") === 1))
      .select(col("label"), col("i"), col("c").as("cp"), col("nd").as("np"))
    val r = cent(comp.filter(col("probe") === 0))
      .select(col("label"), col("i"), col("c").as("cr"), col("nd").as("nr"))
    p.join(r, Seq("label", "i"))
      .groupBy(col("label"))
      .agg(max(col("np")).cast("long").as("n_probe"),
        max(col("nr")).cast("long").as("n_ref"),
        sum((col("cp") - col("cr")) * (col("cp") - col("cr")))
          .as("drift_d2_e12"))
  }

  /** Inter-centroid squared-L2 distance matrix: per-label centroids
    * (the [[centroidDrift]] e6 fixed-point contract — floor(sum/count)
    * per coordinate on exact integer sums), then every unordered label
    * pair's Σ(c_a − c_b)² in e12, flagged when it is a's nearest other
    * centroid (symmetrically b's). The cluster-geometry report behind
    * silhouette: which classes sit dangerously close. Output per pair
    * (a < b): (label_a, label_b, d2_e12, is_nn).
    *
    * Scale: one (label, dim) aggregate off the vector scan; the pair
    * join and the nearest-neighbor window live on the LABEL axis
    * (|labels|² rows, broadcast-sized). */
  def centroidMatrix(emb: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = emb.select(col("label").cast("long").as("label"),
        posexplode(expr(
          """transform(CAST(embedding AS ARRAY<DOUBLE>),
            |          x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))"""
            .stripMargin)).as(Seq("i", "v")))
      .groupBy(col("label"), col("i"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
        .cast("long").as("c"))
      .localCheckpoint(false) // label×dim axis: tiny; ONE vector scan
    val a = cent.select(col("label").as("la"), col("i"), col("c").as("ca"))
    val b = cent.select(col("label").as("lb"), col("i"), col("c").as("cb"))
    val d2 = a.join(b, "i").filter(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(sum((col("ca") - col("cb")) * (col("ca") - col("cb")))
        .as("d2_e12"))
    val sym = d2.unionByName(d2.select(col("lb").as("la"),
      col("la").as("lb"), col("d2_e12")))
    val mins = sym.groupBy(col("la")).agg(min(col("d2_e12")).as("mn"))
    d2.join(mins.select(col("la"), col("mn").as("mn_a")), "la")
      .join(mins.select(col("la").as("lb"), col("mn").as("mn_b")), "lb")
      .select(col("la").as("label_a"), col("lb").as("label_b"), col("d2_e12"),
        (col("d2_e12") === col("mn_a") || col("d2_e12") === col("mn_b"))
          .as("is_nn"))
  }
}
