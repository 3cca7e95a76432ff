package graft.ops

import graft.SparkSpec

class Round8cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedJaccardPairs: term frequency separates what sets cannot") {
    // doc1 and doc2 share the full vocabulary {x, y} (set-Jaccard 1.0)
    // but doc2 is x-heavy: wmin = min(3,1) + min(1,3) = 2, wuni = 8-2 = 6
    val docs = Seq((1L, "x x x y"), (2L, "x y y y")).toDF("doc_id", "text")
    val got = Dedup.weightedJaccardPairs(docs, 300000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 2L, 6L)))
    // at tau = 0.5 the pair falls below threshold (2/6 < 0.5)
    assert(Dedup.weightedJaccardPairs(docs, 500000L).isEmpty)
  }

  test("weightedJaccardPairs: identical multisets score 1.0") {
    val docs = Seq((1L, "a a b"), (2L, "a b a")).toDF("doc_id", "text")
    val got = Dedup.weightedJaccardPairs(docs, 1000000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 3L, 3L)))
  }

  test("madProfile: robust to the outlier that wrecks the mean") {
    // 9 values at 10 ± 2 and one at 1000: med 10, MAD 1,
    // only the wild point exceeds 3 * MAD
    val vals = Seq(8L, 9L, 9L, 10L, 10L, 10L, 11L, 11L, 12L, 1000L)
    val df = vals.map(("a", _)).toDF("g", "v")
    val got = Anomaly.madProfile(df, "g", "v", 3L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 10L, 1L, 10L, 1L)))
  }

  test("madProfile: constant group has MAD 0 and flags any deviation") {
    val df = (Seq.fill(5)(("c", 7L)) :+ (("c", 8L))).toDF("g", "v")
    val got = Anomaly.madProfile(df, "g", "v", 3L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // med 7, MAD 0; the single 8 deviates 1 > 0
    assert(got === Set(("c", 7L, 0L, 6L, 1L)))
  }

  test("kCore: chain tails peel away, cycles survive with core degrees") {
    // triangle 1-2-3 plus tail 3-4-5: 2-core is exactly the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = Graph.kCore(edges, 2, 10).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: too-high k empties the graph without diverging") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.kCore(edges, 3, 10).isEmpty)
  }
}
