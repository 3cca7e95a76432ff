package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PowerIterationSpec extends SparkSpec {
  import spark.implicits._

  test("powerIteration: dominant axis of an anisotropic cloud wins") {
    // 40 vectors along dim0 (+/-1), 4 along dim1 (+/-0.1): the top
    // eigenvector must align with dim0.
    val rows =
      (0 until 40).map(i => (i.toLong, Array(if (i % 2 == 0) 1.0f else -1.0f, 0.0f), 0)) ++
      (40 until 44).map(i => (i.toLong, Array(0.0f, if (i % 2 == 0) 0.1f else -0.1f), 0))
    val gram = Similarity.gramMatrix(rows.toDF("vec_id", "embedding", "label"), 2)
    val x = Similarity.powerIteration(gram, 2, 3)
      .as[(Long, Long)].collect().toMap
    assert(math.abs(x(0L)) === 10000L, "dominant coordinate saturates the e4 scale")
    assert(math.abs(x(1L)) < 100L, s"minor coordinate should collapse, got ${x(1L)}")
  }

  test("powerIteration: identity-like gram keeps the start direction") {
    // two orthogonal unit vectors, equal mass: G ~ diag, start (1,1)
    // stays (1,1) up to scale
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.0f, 1.0f), 0))
    val gram = Similarity.gramMatrix(rows.toDF("vec_id", "embedding", "label"), 2)
    val x = Similarity.powerIteration(gram, 2, 2)
      .as[(Long, Long)].collect().toMap
    assert(x(0L) === 10000L && x(1L) === 10000L)
  }
}
