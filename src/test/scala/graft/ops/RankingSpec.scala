package graft.ops

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("rrf: consensus mid-ranks beat a single #1") {
    // doc A: #1 in list 1 only; doc B: #2 in both lists
    val l1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val l2 = Seq((20L, 2L), (30L, 1L)).toDF("id", "rank")
    val got = Ranking.rrf(Seq(l1, l2), 60L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // 10: 1e6/61 = 16393; 20: 1e6/62 * 2 = 32258; 30: 1e6/63 + 1e6/61 = 32266
    assert(got === Map(10L -> ((16393L, 1L)), 20L -> ((32258L, 2L)),
      30L -> ((32266L, 2L))))
    assert(got(20L)._1 > got(10L)._1) // consensus #2 beats lone #1
  }

  test("rrf: k = 0 reduces to plain reciprocal rank") {
    val l1 = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val got = Ranking.rrf(Seq(l1), 0L)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got === Map(1L -> 1000000L, 2L -> 500000L))
  }
}
