package graft.ops

import graft.SparkSpec

class Round58OpsSpec extends SparkSpec {
  import spark.implicits._

  test("powerIterationDeflated: axis-aligned 2-d data splits into the two axes") {
    // Vectors along e1 dominate variance; e2 carries the rest. The top
    // eigenvector must load on dim 0, the deflated one on dim 1 —
    // near-zero cross loading (fixed-point residue only).
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0L), (1L, Array(-1.0f, 0.0f), 0L),
      (2L, Array(0.9f, 0.0f), 0L), (3L, Array(-0.9f, 0.0f), 0L),
      (4L, Array(0.0f, 0.3f), 0L), (5L, Array(0.0f, -0.3f), 0L))
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.powerIterationDeflated(
        Similarity.gramMatrix(emb, 2), 2, 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    // first component: all mass on dim 0
    assert(math.abs(r(0L)._1) === 10000L)
    assert(math.abs(r(1L)._1) < 100L)
    // deflated component: all mass on dim 1
    assert(math.abs(r(1L)._2) === 10000L)
    assert(math.abs(r(0L)._2) < 100L)
  }
}
