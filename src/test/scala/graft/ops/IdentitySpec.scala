package graft.ops

import graft.SparkSpec

class IdentitySpec extends SparkSpec {
  import spark.implicits._

  private val min30 = 30L * 60 * 1000000

  test("stitchSessions: linked devices merge their interleaved visits") {
    val m = 60L * 1000000 // one minute in micros
    val events = Seq(
      // devices 10 and 11 linked: alternating events 10 min apart form
      // ONE stitched session; per-device they'd be two sessions each
      (10L, 0L * m), (11L, 10L * m), (10L, 20L * m), (11L, 30L * m),
      // device 99 alone: two events 2h apart -> 2 sessions
      (99L, 0L * m), (99L, 120L * m)
    ).toDF("user_id", "t_us")
    val links = Seq((10L, 11L)).toDF("a", "b")
    val got = Identity.stitchSessions(events, "user_id", "t_us", links, min30)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 2L, 4L, 1L), (99L, 1L, 2L, 2L)))
  }

  test("stitchSessions: chains of links resolve transitively") {
    val events = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("user_id", "t_us")
    val links = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Identity.stitchSessions(events, "user_id", "t_us", links, min30)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 3L, 1L)))
  }

  test("stitchFunnel: cross-device conversion completes the funnel") {
    val events = Seq(
      (10L, 1L, "view"), (11L, 2L, "click"), (10L, 3L, "purchase"),
      (99L, 1L, "view") // unlinked device stalls at stage 1
    ).toDF("user_id", "t_us", "event_type")
    val links = Seq((10L, 11L)).toDF("a", "b")
    val got = Identity.stitchFunnel(events, "user_id", "t_us", "event_type",
        links, Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(10L -> 3, 99L -> 1))
  }

  test("stitchSessions: no links degenerates to per-device sessionization") {
    val events = Seq((7L, 0L), (8L, 0L)).toDF("user_id", "t_us")
    val links = Seq.empty[(Long, Long)].toDF("a", "b")
    val got = Identity.stitchSessions(events, "user_id", "t_us", links, min30)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((7L, 1L, 1L, 1L), (8L, 1L, 1L, 1L)))
  }
}
