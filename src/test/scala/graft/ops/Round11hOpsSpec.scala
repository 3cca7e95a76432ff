package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round11hOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mergeLogBuckets: sharded-then-merged lands like the one-shot sketch") {
    val all = Seq(1L, 2L, 3L, 4L, 100L, 900L).map(("g", _)).toDF("g", "v")
    val (s1, s2) = (all.filter(col("v") <= 3), all.filter(col("v") > 3))
    val direct = Sketches.logBucketQuantile(all, "g", "v", 1000000L,
      Seq(500000L, 990000L))
    val merged = Sketches.logBucketLanding(
      Sketches.mergeLogBuckets(
        Sketches.logBucketSketch(s1, "g", "v", 1000000L)
          .unionByName(Sketches.logBucketSketch(s2, "g", "v", 1000000L))),
      Seq(500000L, 990000L))
    assert(merged.collect().toSet === direct.collect().toSet)
  }

  test("gini: uniform is 0, single-owner approaches (n-1)/n") {
    val df = (Seq.fill(4)(7L).map(("even", _)) ++
      Seq(0L, 0L, 10L).map(("solo", _))).toDF("g", "v")
    val rows = Quantiles.gini(df, "g", "v")
      .as[(String, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows("even") === ((4L, Some(0L))))
    assert(rows("solo") === ((3L, Some(666666L)))) // (n-1)/n = 2/3
  }

  test("gini: zero-total group emits NULL") {
    val df = Seq(("z", 0L), ("z", 0L)).toDF("g", "v")
    val got = Quantiles.gini(df, "g", "v")
      .as[(String, Long, Option[Long])].head()
    assert(got === (("z", 2L, None)))
  }

  test("benford: digit shares and deviations against the e6 table") {
    val df = (1L to 9L).map(("g", _)).toDF("g", "v")
    val got = Audit.benford(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> r).toMap
    assert(got.size === 9)
    assert(got(1L) === (("g", 1L, 1L, 111111L, 301030L, 189919L)))
    assert(got(9L) === (("g", 9L, 1L, 111111L, 45757L, 65354L)))
  }

  test("benford: non-positive values are excluded") {
    val df = Seq(("g", 0L), ("g", -12L), ("g", 555L)).toDF("g", "v")
    val got = Audit.benford(df, "g", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1 && got.head._2 === 5L && got.head._4 === 1000000L)
  }
}
