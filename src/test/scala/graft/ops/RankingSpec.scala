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

  test("ndcgAtK: perfect ranking scores 1.0 exactly") {
    // rel already descending with rank -> predicted ≡ ideal
    val df = Seq(("q", 1L, 3L), ("q", 2L, 2L), ("q", 3L, 1L))
      .toDF("g", "rank", "rel")
    val got = Ranking.ndcgAtK(df, "g", "rank", "rel", 10)
      .as[(String, Long, Long, Long)].collect().head
    assert(got._2 === got._3)        // dcg == idcg
    assert(got._4 === 1000000L)      // ndcg_e6 = 1.0
  }

  test("ndcgAtK: swapping the top two drops the score below 1.0") {
    val df = Seq(("q", 1L, 0L), ("q", 2L, 3L), ("q", 3L, 1L))
      .toDF("g", "rank", "rel")
    val got = Ranking.ndcgAtK(df, "g", "rank", "rel", 10)
      .as[(String, Long, Long, Long)].collect().head
    assert(got._4 < 1000000L && got._4 > 0L)
  }

  test("ndcgAtK: cutoff excludes deep items from both sides") {
    // rel-3 item at rank 5 is outside k=2 for DCG; ideal puts it first
    val df = Seq(("q", 1L, 1L), ("q", 2L, 1L), ("q", 5L, 3L))
      .toDF("g", "rank", "rel")
    val got = Ranking.ndcgAtK(df, "g", "rank", "rel", 2)
      .as[(String, Long, Long, Long)].collect().head
    // dcg: 1/log2(2) + 1/log2(3) -> 1e6 + 630929; idcg: 3/log2(2) + 1/log2(3)
    assert(got._2 < got._3)
    assert(got._4 < 1000000L)
  }

  test("ndcgAtK: all-zero relevance yields NULL ndcg, not a crash") {
    val df = Seq(("q", 1L, 0L), ("q", 2L, 0L)).toDF("g", "rank", "rel")
    val got = Ranking.ndcgAtK(df, "g", "rank", "rel", 10)
      .select("ndcg_e6").as[Option[Long]].collect().head
    assert(got.isEmpty)
  }
}
