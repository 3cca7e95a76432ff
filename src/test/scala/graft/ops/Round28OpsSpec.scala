package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round28OpsSpec extends SparkSpec {
  import spark.implicits._

  // ── ClusterEval.centroidSilhouette ───────────────────────────────────

  test("centroidSilhouette: tight separated clusters score near +1") {
    // Two clusters far apart on one axis; dim 2, 3 points each.
    val emb = Seq(
      (0L, Array(0.00f, 0.0f), 0), (1L, Array(0.01f, 0.0f), 0),
      (2L, Array(-0.01f, 0.0f), 0),
      (3L, Array(0.50f, 0.0f), 1), (4L, Array(0.51f, 0.0f), 1),
      (5L, Array(0.49f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val byLabel = ClusterEval.centroidSilhouette(emb)
      .select("label", "n_vecs", "sum_sil_e6", "n_neg")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // Every point: a = 1e8·(0.01)²-scale, b ≈ (0.5e6)² — s_e6 ≈ 1e6.
    Seq(0L, 1L).foreach { l =>
      val (_, n, s, neg) = byLabel(l)
      assert(n === 3L)
      assert(s > 2900000L, s"label $l sum_sil_e6=$s") // ≥ 0.9667e6 each
      assert(neg === 0L)
    }
  }

  test("centroidSilhouette: shuffled labels score ≤ 0") {
    // Same two blobs but labels assigned ACROSS blobs: centroids collapse
    // to the midpoint; own/other centroid distances tie → score 0, and
    // any asymmetry goes negative.
    val emb = Seq(
      (0L, Array(0.00f, 0.0f), 0), (1L, Array(0.50f, 0.0f), 0),
      (2L, Array(0.01f, 0.0f), 1), (3L, Array(0.51f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val sums = ClusterEval.centroidSilhouette(emb)
      .select(sum(col("sum_sil_e6"))).as[Long].first()
    assert(sums <= 0L, s"mixed labels should not score positive: $sums")
  }

  // ── Dbscan.classify ──────────────────────────────────────────────────

  test("dbscan: dense blob is core, fringe is border, isolate is noise") {
    // eps=10, minPts=4. Blob: 4 points within Chebyshev 10 of each other
    // (each sees all 4 ⇒ core). Fringe point at distance 10 from one blob
    // corner only (sees 2 < 4 ⇒ not core, but core neighbour ⇒ border).
    // Isolate far away ⇒ noise.
    val pts = Seq(
      (1L, "g", 100L, 100L), (2L, "g", 105L, 100L),
      (3L, "g", 100L, 105L), (4L, "g", 105L, 105L), // blob (all core)
      (5L, "g", 115L, 100L),                        // border via pt 2
      (6L, "g", 500L, 500L)                         // noise
    ).toDF("id", "grp", "x", "y")
    val got = Dbscan.classify(pts, eps = 10L, minPts = 4L)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("g", 4L, 1L, 1L)))
  }

  test("dbscan: neighbour counts include the point itself") {
    // Two coincident points, minPts=2 → both core even with no other
    // neighbours (self + twin).
    val pts = Seq((1L, "g", 50L, 50L), (2L, "g", 50L, 50L))
      .toDF("id", "grp", "x", "y")
    val got = Dbscan.classify(pts, eps = 5L, minPts = 2L)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("g", 2L, 0L, 0L)))
  }

  test("dbscan: cross-cell neighbours are found (3×3 scatter)") {
    // Points straddling an ε-cell boundary (cells of width 10: 9 vs 11)
    // must still see each other.
    val pts = Seq(
      (1L, "g", 9L, 9L), (2L, "g", 11L, 11L), (3L, "g", 11L, 9L)
    ).toDF("id", "grp", "x", "y")
    val got = Dbscan.classify(pts, eps = 10L, minPts = 3L)
      .as[(String, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("g", 3L, 0L, 0L)))
  }

  // ── Mobility.pathLength ──────────────────────────────────────────────

  test("pathLength: 3-4-5 polyline sums exactly") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // Route r: (0,0) → (0.03,0.04) → (0.06,0.08): two 3-4-5 segments of
    // floored length 5 each in e2 units.
    val pos = Seq(
      ("r", ts(1), 1L, 0.00, 0.00), ("r", ts(2), 2L, 0.03, 0.04),
      ("r", ts(3), 3L, 0.06, 0.08),
      ("q", ts(1), 4L, 0.0, 0.0) // single-point route: 0 segments
    ).toDF("route", "eventTs", "event_id", "lat", "lon")
    val got = Mobility.pathLength(pos, "route")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("r", 3L, 2L, 10L, 5L), ("q", 1L, 0L, 0L, 0L)))
  }

  test("pathLength: ordering is by (ts, tie) — out-of-order input") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // Rows arrive shuffled; same-ts rows break ties by event_id: the
    // path is 1→2→3 regardless of input order.
    val pos = Seq(
      ("r", ts(2), 3L, 0.10, 0.00), ("r", ts(1), 1L, 0.00, 0.00),
      ("r", ts(1), 2L, 0.05, 0.00)
    ).toDF("route", "eventTs", "event_id", "lat", "lon")
    val got = Mobility.pathLength(pos, "route")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("r", 3L, 2L, 10L, 5L)))
  }
}
