package graft.ops

import graft.SparkSpec

class NearestEventSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(String, Long, Long)],
                  right: Seq[(String, Long, Long)]) = {
    val l = left.toDF("k", "t", "id")
    val r = right.toDF("k", "t", "id")
    TimeSeries.nearestEvent(l, r, "k", "t", "id")
      .as[(String, Long, Option[Long], Option[Long])].collect().toSet
  }

  test("nearestEvent: picks the closer side; equidistant prefers earlier") {
    val got = run(
      left = Seq(("a", 10L, 1L), ("a", 100L, 2L)),
      right = Seq(("a", 7L, 50L), ("a", 12L, 51L), ("a", 90L, 52L),
        ("a", 110L, 53L)))
    // left 1: prev@7 gap 3 vs next@12 gap 2 -> 51
    // left 2: prev@90 gap 10 vs next@110 gap 10 -> tie -> earlier (52)
    assert(got === Set(("a", 1L, Some(51L), Some(2L)),
      ("a", 2L, Some(52L), Some(10L))))
  }

  test("nearestEvent: same-instant right matches at gap 0") {
    val got = run(left = Seq(("a", 5L, 1L)),
      right = Seq(("a", 5L, 9L), ("a", 6L, 8L)))
    assert(got === Set(("a", 1L, Some(9L), Some(0L))))
  }

  test("nearestEvent: same-t rights tie to the smallest id, both directions") {
    val prevTie = run(left = Seq(("a", 10L, 1L)),
      right = Seq(("a", 8L, 30L), ("a", 8L, 20L)))
    assert(prevTie === Set(("a", 1L, Some(20L), Some(2L))))
    val nextTie = run(left = Seq(("a", 10L, 1L)),
      right = Seq(("a", 13L, 44L), ("a", 13L, 33L)))
    assert(nextTie === Set(("a", 1L, Some(33L), Some(3L))))
  }

  test("nearestEvent: keys without rights emit NULL match") {
    val got = run(left = Seq(("lonely", 1L, 7L)),
      right = Seq(("other", 1L, 8L)))
    assert(got === Set(("lonely", 7L, None, None)))
  }
}
