package graft.ops

import graft.SparkSpec

class EngagementSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)

  test("stickiness: WAU covers the trailing 7 days, DAU only the day") {
    // u1 active day 0 and day 3; u2 active day 3 only.
    val ev = Seq((1L, ts(0)), (1L, ts(3)), (2L, ts(3)))
      .toDF("user_id", "etime")
    val got = Engagement.stickiness(ev, "user_id", "etime")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // day 0: dau 1, wau 1 → 1e6. day 3: dau 2, wau {u1 (day0 & 3), u2} = 2.
    assert(got(0L) === (0L, 1L, 1L, 1000000L))
    assert(got(3L) === (3L, 2L, 2L, 1000000L))
    assert(got.size === 2) // only observed days emit
  }

  test("stickiness: returning user lifts WAU above DAU") {
    // u1 on day 0; u2 on day 2 → day 2: dau 1, wau 2 → 500000.
    val ev = Seq((1L, ts(0)), (2L, ts(2))).toDF("user_id", "etime")
    val got = Engagement.stickiness(ev, "user_id", "etime")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(2L) === (2L, 1L, 2L, 500000L))
  }

  test("stickiness: day 8 does not see day 0 (window is 7 days)") {
    val ev = Seq((1L, ts(0)), (2L, ts(8))).toDF("user_id", "etime")
    val got = Engagement.stickiness(ev, "user_id", "etime")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(8L) === (8L, 1L, 1L, 1000000L))
  }

  test("trigrams: counts sliding 3-windows per entity in (ts, tie) order") {
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"), (1L, ts(2), 3L, "c"),
      (1L, ts(3), 4L, "a"), // windows: abc, bca
      (2L, ts(0), 5L, "a"), (2L, ts(1), 6L, "b"), (2L, ts(2), 7L, "c")
    ).toDF("user_id", "etime", "event_id", "event_type")
    val got = Engagement.trigrams(ev, "user_id", "etime", "event_id",
        "event_type", 10)
      .as[(String, String, String, Long)].collect().toSet
    assert(got === Set(("a", "b", "c", 2L), ("b", "c", "a", 1L)))
  }
}
