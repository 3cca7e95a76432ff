package graft.ops

import graft.SparkSpec

class Round11dOpsSpec extends SparkSpec {
  import spark.implicits._

  test("psi: identical cohorts score exactly 0") {
    val df = Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L))
      .map { case (h, b) => ("g", h, b) }.toDF("g", "h", "b")
    val got = Drift.psi(df, "g", "h", "b", 1)
      .as[(String, Long, Long)].head()
    assert(got === (("g", 0L, 2L)))
  }

  test("psi: a full distribution flip matches the hand computation") {
    // half 0: 3 rows in bucket 0; half 1: 3 rows in bucket 1.
    // smoothed shares 800000/200000 each side; log2 gap is exactly 2.0
    // -> psi = 2 * 600000*2000000 / 1e6 = 2400000 (2.4 in log2 units)
    val df = (Seq.fill(3)((0L, 0L)) ++ Seq.fill(3)((1L, 1L)))
      .map { case (h, b) => ("g", h, b) }.toDF("g", "h", "b")
    val got = Drift.psi(df, "g", "h", "b", 1)
      .as[(String, Long, Long)].head()
    assert(got === (("g", 2400000L, 2L)))
  }

  test("topKWithOther: head keeps identity, tail collapses") {
    val df = Seq(("A", 1L, 50L), ("A", 2L, 40L), ("A", 3L, 30L),
      ("A", 4L, 20L), ("A", 5L, 10L), ("B", 9L, 7L))
      .toDF("g", "m", "v")
    val got = Ranking.topKWithOther(df, "g", "m", "v", 3)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("A", "1", 50L, 1L), ("A", "2", 40L, 1L),
      ("A", "3", 30L, 1L), ("A", "other", 30L, 2L), ("B", "9", 7L, 1L)))
  }

  test("topKWithOther: rank ties break on member id") {
    val df = Seq(("A", 2L, 10L), ("A", 1L, 10L), ("A", 3L, 10L))
      .toDF("g", "m", "v")
    val got = Ranking.topKWithOther(df, "g", "m", "v", 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(("A", "1", 10L, 1L), ("A", "2", 10L, 1L),
      ("A", "other", 10L, 1L)))
  }

  test("groupedPercentileBands: k-th order statistics for every p at once") {
    val df = (1L to 10L).map(("g", _)).toDF("g", "v")
    val got = Quantiles.groupedPercentileBands(df, "g", "v",
        Seq(250000L, 500000L, 750000L))
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("g", 250000L, 3L, 10L, 3L),
      ("g", 500000L, 5L, 10L, 5L), ("g", 750000L, 8L, 10L, 8L)))
  }

  test("groupedPercentileBands agrees with single groupedPercentile") {
    val df = Seq(("a", 5L), ("a", 1L), ("a", 9L), ("a", 9L), ("a", 2L),
      ("b", 100L), ("b", 200L)).toDF("g", "v")
    val single = Quantiles.groupedPercentile(df, "g", "v", 500000L)
      .select("g", "value").as[(String, Long)].collect().toSet
    val bands = Quantiles.groupedPercentileBands(df, "g", "v", Seq(500000L))
      .select("g", "value").as[(String, Long)].collect().toSet
    assert(bands === single)
  }
}
