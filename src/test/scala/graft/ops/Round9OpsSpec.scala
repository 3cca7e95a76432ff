package graft.ops

import graft.SparkSpec

class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("trendSlope: exact slope on a clean line, per key") {
    val us = 1000000L
    // key a: y = 5t + 100 (cents per second) -> slope_e6 = 5e6
    // key b: flat -> 0; key c: one point / zero spread -> NULL
    val events = Seq(
      ("a", 0L * us, 100L), ("a", 1L * us, 105L), ("a", 2L * us, 110L),
      ("b", 0L * us, 7L), ("b", 10L * us, 7L),
      ("c", 3L * us, 9L)
    ).toDF("event_type", "t_us", "cents")
    val got = TimeSeries.trendSlope(events, "event_type", "t_us", "cents")
      .as[(String, Long, Option[Double])].collect()
      .map { case (k, n, s) => k -> ((n, s)) }.toMap
    assert(got === Map("a" -> ((3L, Some(5.0))),
      "b" -> ((2L, Some(0.0))), "c" -> ((1L, None))))
  }

  test("trendSlope: centering keeps epoch-scale timestamps exact") {
    val t0 = 1704103200L * 1000000L // 2024 epoch micros — t² would overflow
    val events = Seq(("a", t0, 0L), ("a", t0 + 1000000L, 3L))
      .toDF("event_type", "t_us", "cents")
    val got = TimeSeries.trendSlope(events, "event_type", "t_us", "cents")
      .as[(String, Long, Option[Double])].collect().head
    assert(got === (("a", 2L, Some(3.0))))
  }

  test("maintainAgg: inserts, deletes, new groups, vanishing groups") {
    val base = Seq(("x", 2L, 100L), ("y", 1L, 50L)).toDF("g", "cnt", "total")
    val changes = Seq(
      ("x", 30L, 1L),  // insert into existing
      ("y", 50L, -1L), // delete the only y row -> y vanishes
      ("z", 9L, 1L)    // brand-new group
    ).toDF("g", "v", "op")
    val got = Incremental.maintainAgg(base, changes)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("x", 3L, 130L), ("z", 1L, 9L)))
  }

  test("maintainAgg: empty delta returns base unchanged") {
    val base = Seq(("x", 2L, 100L)).toDF("g", "cnt", "total")
    val changes = Seq.empty[(String, Long, Long)].toDF("g", "v", "op")
    val got = Incremental.maintainAgg(base, changes)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("x", 2L, 100L)))
  }

  test("changepoint: finds the obvious level shift") {
    // 10,10,10 then 90,90 -> best split after rn=3 (t=3), means 10 vs 90
    val events = Seq(
      ("a", 1L, 1L, 10L), ("a", 2L, 2L, 10L), ("a", 3L, 3L, 10L),
      ("a", 4L, 4L, 90L), ("a", 5L, 5L, 90L)
    ).toDF("event_type", "t_us", "event_id", "cents")
    val got = Anomaly.changepoint(events, "event_type", "t_us", "event_id",
        "cents")
      .as[(String, Long, Long, Long)].collect().head
    assert(got === (("a", 3L, 80000000L, 5L))) // |10-90| = 80 cents -> 80e6
  }

  test("changepoint: ties break to the earliest split") {
    // symmetric series: splits 1 and 3 score equally; rn=1 must win
    val events = Seq(
      ("a", 1L, 1L, 0L), ("a", 2L, 2L, 10L), ("a", 3L, 3L, 10L),
      ("a", 4L, 4L, 20L)
    ).toDF("event_type", "t_us", "event_id", "cents")
    val got = Anomaly.changepoint(events, "event_type", "t_us", "event_id",
        "cents")
      .as[(String, Long, Long, Long)].collect().head
    // split@1: |0/1 - 40/3| = 13.33 -> 13333333; split@3: |20/3 - 20/1|
    // = 13.33 equal; earliest (t=1) wins
    assert(got === (("a", 1L, 13333333L, 4L)))
  }
}
