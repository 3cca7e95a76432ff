package graft.ops

import graft.SparkSpec

class AlignClockSpec extends SparkSpec {
  import spark.implicits._

  test("alignClock: forward fill onto the shared grid, NULL before start") {
    val obs = Seq(
      ("a", 5L, 1L, 10L), ("a", 25L, 2L, 20L), // a starts early
      ("b", 22L, 3L, 99L)                      // b starts late
    ).toDF("series", "t_s", "event_id", "cents")
    val got = TimeSeries.alignClock(obs, "series", "t_s", "event_id",
        "cents", 10L)
      .as[(String, Long, Option[Long])].collect().toSet
    // clock: 0, 10, 20 (min 5 -> floor to 0; max 25)
    assert(got === Set(
      ("a", 0L, None), ("a", 10L, Some(10L)), ("a", 20L, Some(10L)),
      ("b", 0L, None), ("b", 10L, None), ("b", 20L, None)))
  }

  test("alignClock: same-second duplicates collapse latest-writer-wins") {
    val obs = Seq(("a", 10L, 1L, 7L), ("a", 10L, 2L, 8L))
      .toDF("series", "t_s", "event_id", "cents")
    val got = TimeSeries.alignClock(obs, "series", "t_s", "event_id",
        "cents", 10L)
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got === Set(("a", 10L, Some(8L))))
  }

  test("alignClock: an observation ON a tick is visible at that tick") {
    val obs = Seq(("a", 20L, 1L, 5L), ("a", 33L, 2L, 6L))
      .toDF("series", "t_s", "event_id", "cents")
    val got = TimeSeries.alignClock(obs, "series", "t_s", "event_id",
        "cents", 10L)
      .as[(String, Long, Option[Long])].collect().toSet
    assert(got === Set(("a", 20L, Some(5L)), ("a", 30L, Some(5L))))
  }
}
