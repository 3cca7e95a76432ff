package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round99OpsSpec extends SparkSpec {
  import spark.implicits._

  test("globalExactPercentiles picks the nearest-rank value with one range layout") {
    // values 1..100 shuffled: type-1 percentile of p is exactly p
    val df = scala.util.Random.shuffle((1 to 100).toList)
      .toDF("v").withColumn("id", col("v") * 7 % 101)
    val got = Ranks.globalExactPercentiles(df, col("v"), Seq(col("id")),
        Seq(1, 25, 50, 75, 99), valueName = "value", parts = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 1, 25L -> 25, 50L -> 50, 75L -> 75, 99L -> 99))
  }

  test("globalExactPercentiles rank targets: ceil semantics on tiny n") {
    // n=4, p50 → ceil(2.0)=rank 2; p51 → ceil(2.04)=rank 3
    val df = Seq(10, 20, 30, 40).toDF("v").withColumn("id", col("v"))
    val got = Ranks.globalExactPercentiles(df, col("v"), Seq(col("id")),
        Seq(50, 51), valueName = "value", parts = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(50L -> 20, 51L -> 30))
  }

  test("goodTuring: unseen mass and smoothed counts on a known corpus (unigrams)") {
    // words: a×3 b×2 c,d,e ×1  →  N=8, N1=3, N2=1, N3=1
    val docs = Seq("a a a b b", "c d e").toDF("text")
    val got = TextAnalysis.goodTuring(docs, n = 1, maxR = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) === ((3L, 375000L)))      // N1/N = 3/8
    assert(got(1L) === ((3L, 666666L)))      // 2·N2/N1 = 2/3
    assert(got(2L) === ((1L, 3000000L)))     // 3·N3/N2 = 3
    assert(got(3L) === ((1L, 0L)))           // N4 = 0
  }

  test("goodTuring: trigram species stay within docs; short docs contribute none") {
    // doc1: "x y z y z" → trigrams {x y z, y z y, z y z}; doc2: "x y z w"
    // → {x y z, y z w}; doc3 too short → none.
    // Counts: "x y z"×2 and three singletons → N=5, N1=3, N2=1.
    val docs = Seq("x y z y z", "x y z w", "x y").toDF("text")
    val got = TextAnalysis.goodTuring(docs, n = 3, maxR = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) === ((3L, 600000L)))      // N1/N = 3/5
    assert(got(1L) === ((3L, 666666L)))      // 2·N2/N1 = 2/3
    assert(got(2L) === ((1L, 0L)))           // N3 = 0
  }

  test("distinctBigrams: ratio per source, no cross-doc bigrams") {
    val docs = Seq(("s1", "x y x y"), ("s1", "x y"), ("s2", "p q"))
      .toDF("source", "text")
    // s1: "x y","y x","x y" + "x y" → 4 bigrams, 2 distinct; s2: 1/1
    val got = TextAnalysis.distinctBigrams(docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("s1") === ((4L, 2L, 500000L)))
    assert(got("s2") === ((1L, 1L, 1000000L)))
  }

  test("distinctBigrams: single-token and empty docs contribute nothing") {
    val docs = Seq(("s", "solo"), ("s", ""), ("s", "a b")).toDF("source", "text")
    val got = TextAnalysis.distinctBigrams(docs).collect()
    assert(got.length === 1 && got.head.getLong(1) === 1L)
  }
}
