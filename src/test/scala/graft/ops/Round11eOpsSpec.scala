package graft.ops

import graft.SparkSpec

class Round11eOpsSpec extends SparkSpec {
  import spark.implicits._

  test("winsorizedMean: clamping tames the outlier, n stays stable") {
    val df = Seq(1L, 2L, 3L, 4L, 100L).map(("g", _)).toDF("g", "v")
    // p20 -> k=1 -> 1; p80 -> k=4 -> 4; clamped = [1,2,3,4,4]
    val got = Quantiles.winsorizedMean(df, "g", "v", 200000L, 800000L)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(got === (("g", 5L, 1L, 4L, 22L, 2L)))
  }

  test("winsorizedMean: clamp-free data leaves the mean unchanged") {
    val df = Seq(10L, 10L, 10L).map(("g", _)).toDF("g", "v")
    val got = Quantiles.winsorizedMean(df, "g", "v", 100000L, 900000L)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(got === (("g", 3L, 10L, 10L, 10L, 10L)))
  }

  test("advisor: hot key share and salt factor per candidate column") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("b", 5L))
      .toDF("k1", "k2")
    val got = Skew.advisor(df, Seq("k1", "k2"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("k1", 5L, 2L, 4L, 800000L, 2L),  // salt 2: hot key is 2x the mean
      ("k2", 5L, 5L, 1L, 200000L, 1L))) // uniform: no salting needed
  }
}
