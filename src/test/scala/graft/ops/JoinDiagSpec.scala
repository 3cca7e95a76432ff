package graft.ops

import graft.SparkSpec

class JoinDiagSpec extends SparkSpec {
  import spark.implicits._

  test("topJoinKeys predicts per-key products, inner semantics, tie-break") {
    val left = Seq(1L, 1L, 1L, 2L, 2L, 3L, 9L).toDF("lk")
    val right = Seq(1L, 1L, 2L, 2L, 2L, 3L, 8L).toDF("rk")
    val got = JoinDiag.topJoinKeys(left, "lk", right, "rk", 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // products: k1 = 3·2 = 6, k2 = 2·3 = 6, k3 = 1; keys 8/9 one-sided
    assert(got === Seq((1L, 3L, 2L, 6L), (2L, 2L, 3L, 6L), (3L, 1L, 1L, 1L)))
  }

  test("predicted total equals the actual join size") {
    val left = Seq(1L, 1L, 2L, 5L, 5L, 5L).toDF("lk")
    val right = Seq(1L, 2L, 2L, 5L).toDF("rk")
    val predicted = JoinDiag.topJoinKeys(left, "lk", right, "rk", 100)
      .agg(org.apache.spark.sql.functions.sum("out_rows")).as[Long].head()
    val actual = left.join(right, left("lk") === right("rk")).count()
    assert(predicted === actual)
  }
}
