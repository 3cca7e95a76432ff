package graft.ops

import graft.SparkSpec

class Round11fOpsSpec extends SparkSpec {
  import spark.implicits._

  test("logBucketQuantile: gamma=2 buckets are floor(log2 v)") {
    val df = Seq(1L, 100L, 10000L).map(("g", _)).toDF("g", "v")
    // buckets 0, 6, 13; p50 -> k=2 lands in bucket 6
    val got = Sketches.logBucketQuantile(df, "g", "v", 1000000L, Seq(500000L))
      .as[(String, Long, Long, Long, Long)].head()
    assert(got === (("g", 500000L, 6L, 2L, 3L)))
  }

  test("logBucketQuantile: sub-1 values clamp into bucket 0") {
    val df = Seq(0L, -5L, 1L, 2L).map(("g", _)).toDF("g", "v")
    val got = Sketches.logBucketQuantile(df, "g", "v", 1000000L, Seq(500000L))
      .as[(String, Long, Long, Long, Long)].head()
    assert(got === (("g", 500000L, 0L, 2L, 4L))) // 3 of 4 in bucket 0
  }

  test("cuped: perfectly correlated covariate equalizes adjusted means") {
    val df = Seq((0L, 10L, 10L), (0L, 20L, 20L), (1L, 30L, 30L),
      (1L, 40L, 40L)).toDF("variant", "x", "y")
    val got = Experiment.cuped(df, "variant", "x", "y")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].head()
    assert(got._1 === 2L && got._2 === 2L)
    assert(got._3 === 15.0 && got._4 === 35.0)     // raw means differ
    assert(got._5 === Some(1.0))                   // theta
    assert(got._6 === Some(25.0) && got._7 === Some(25.0)) // adjusted equal
    assert(got._8 === Some(1.0))                   // r2
  }

  test("cuped: constant covariate yields NULL theta and adjustments") {
    val df = Seq((0L, 5L, 10L), (0L, 5L, 20L), (1L, 5L, 30L), (1L, 5L, 40L))
      .toDF("variant", "x", "y")
    val got = Experiment.cuped(df, "variant", "x", "y")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].head()
    assert(got._5 === None && got._6 === None && got._8 === None)
  }
}
