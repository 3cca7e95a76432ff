package graft.ops

import graft.SparkSpec

class Round55OpsSpec extends SparkSpec {
  import spark.implicits._

  test("evaluateGreedy: IPS/DM/DR all recover the best arm's value") {
    // One context, two actions logged 50/50: arm "a" pays 100, arm "b"
    // pays 200. Greedy target picks "b"; true value 200.
    //   v_log = (100+200)/2 = 150;  K = 2
    //   IPS  = K/n * sum_match r = 2/4 * 400 = 200
    //   DM   = mu(best) = 200;  DR = 200 (residuals vanish)
    val log = Seq((0L, "a", 100L), (0L, "a", 100L),
      (0L, "b", 200L), (0L, "b", 200L)).toDF("ctx", "act", "r")
    val r = OffPolicy.evaluateGreedy(log, "ctx", "act", "r")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r === ((4L, 2L, 150000000L, 200000000L, 200000000L, 200000000L)))
  }

  test("evaluateGreedy: per-context argmax is context-local") {
    // ctx 0 prefers "a", ctx 1 prefers "b" -> DM averages the two bests.
    val log = Seq((0L, "a", 300L), (0L, "b", 100L),
      (1L, "a", 100L), (1L, "b", 500L)).toDF("ctx", "act", "r")
    val r = OffPolicy.evaluateGreedy(log, "ctx", "act", "r")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // DM = (300 + 300 + 500 + 500)/4 = 400
    assert(r._5 === 400000000L)
    // matched rows: (0,a,300) and (1,b,500) -> IPS = 2/4 * 800 = 400
    assert(r._4 === 400000000L)
  }

  test("dyadCensus: mutual, asymmetric and null dyads counted exactly") {
    // Nodes {1,2,3}: 1<->2 mutual, 1->3 asymmetric, (2,3) null.
    // Self-loop and duplicate edges must not count.
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (2L, 2L))
      .toDF("src", "dst")
    val r = Graph.dyadCensus(edges)
      .as[(Long, Long, Long, Long, Long, Option[Long])].head()
    // reciprocity = 2*1/(2*1+1) = 2/3
    assert(r === ((3L, 3L, 1L, 1L, 1L, Some(666666L))))
  }
}
