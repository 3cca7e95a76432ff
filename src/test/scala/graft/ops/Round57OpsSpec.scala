package graft.ops

import graft.SparkSpec

class Round57OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bowCosinePairs: identical docs score 1, disjoint docs never pair") {
    val docs = Seq((1L, "a b b c"), (2L, "a b b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bowCosinePairs(docs)
      .as[(Long, Long, Long, Double)].collect()
    assert(r.toSeq === Seq((1L, 2L, 6L, 1.0)))
  }

  test("bowCosinePairs: counts weigh — repetition raises cos over set overlap") {
    // doc 1 = "a a a b", doc 2 = "a a a c": dot = 9, norms = 10 each
    // -> cos = 0.9; the SET jaccard of {a,b} vs {a,c} would be 1/3.
    val docs = Seq((1L, "a a a b"), (2L, "a a a c")).toDF("doc_id", "text")
    val r = TextAnalysis.bowCosinePairs(docs)
      .as[(Long, Long, Long, Double)].head()
    assert(r === ((1L, 2L, 9L, 0.9)))
  }
}
