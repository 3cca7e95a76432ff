package graft.ops

import graft.SparkSpec

class Round34OpsSpec extends SparkSpec {
  import spark.implicits._

  // ── ClusterEval.centroidDrift ────────────────────────────────────────

  test("centroidDrift: identical folds drift zero") {
    // Folds 0 and 1+ hold the same two vectors per label → centroids
    // coincide exactly.
    val emb = Seq(
      (0L, Array(0.1f, 0.2f), 7), (5L, Array(0.3f, 0.4f), 7), // probe
      (1L, Array(0.1f, 0.2f), 7), (6L, Array(0.3f, 0.4f), 7)  // ref
    ).toDF("vec_id", "embedding", "label")
    val got = ClusterEval.centroidDrift(emb, 0L)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((7L, 2L, 2L, 0L)))
  }

  test("centroidDrift: known shift is measured exactly") {
    // Probe at (0, 0); ref at (0.001, 0) → centroid delta 1000 e6-units
    // on dim 1 → d² = 1e6 (in e12 units).
    val emb = Seq(
      (0L, Array(0.0f, 0.0f), 1),
      (1L, Array(0.001f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = ClusterEval.centroidDrift(emb, 0L)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 1L, 1L, 1000000L)))
  }

  // ── TextAnalysis.uncertaintySample ───────────────────────────────────

  test("uncertaintySample: picks the smallest |margin| first") {
    val docs = Seq((1L, "a"), (2L, "a a"), (3L, "a a a")).toDF("doc_id", "text")
    val got = TextAnalysis.uncertaintySample(docs, 256, 2)
      .select("doc_id").as[Long].collect()
    // |margin| scales with repetition count → single-token doc is most
    // uncertain (unless the weight is 0, when ties break by id: 1, 2).
    assert(got.toSeq === Seq(1L, 2L))
  }
}
