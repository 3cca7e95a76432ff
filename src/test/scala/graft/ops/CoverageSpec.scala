package graft.ops

import graft.SparkSpec

class CoverageSpec extends SparkSpec {
  import spark.implicits._

  test("coverage: overlap and touch merge; gaps split") {
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 15L),   // overlap -> [0,15)
      ("a", 15L, 20L),                  // touch -> extends to [0,20)
      ("a", 30L, 40L),                  // gap -> own segment
      ("b", 0L, 1L)
    ).toDF("k", "s0", "e0")
    val got = IntervalJoin.coverage(iv, "k", "s0", "e0")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 2L, 4L, 30L), ("b", 1L, 1L, 1L)))
  }

  test("coverage: contained and duplicate intervals count but add nothing") {
    val iv = Seq(
      ("a", 0L, 100L), ("a", 10L, 20L), ("a", 10L, 20L), ("a", 0L, 100L)
    ).toDF("k", "s0", "e0")
    val got = IntervalJoin.coverage(iv, "k", "s0", "e0")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 4L, 100L)))
  }

  test("coverage: later interval ending before the running max stays merged") {
    // [0,50) then [10,20) then [30,60): 30 < 50 -> all one segment
    val iv = Seq(("a", 0L, 50L), ("a", 10L, 20L), ("a", 30L, 60L))
      .toDF("k", "s0", "e0")
    val got = IntervalJoin.coverage(iv, "k", "s0", "e0")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 3L, 60L)))
  }
}
