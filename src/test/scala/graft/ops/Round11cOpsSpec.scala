package graft.ops

import graft.SparkSpec

class Round11cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("markovStationary: mass drains from states with no inbound edges") {
    // A -> B, B -> B: all mass ends on B (A keeps nothing)
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "B"), (1L, 4L, "B"))
      .toDF("u", "t", "et")
    val got = Behavior.markovStationary(ev, "u", "t", "et", 2)
      .as[(String, Long)].collect().toMap
    assert(got("A") === 0L)
    assert(got("B") === 2000000L) // A's initial 1e6 moved over in round 1
  }

  test("markovStationary: a deterministic 2-cycle is already stationary") {
    val ev = Seq((1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (1L, 5L, "A")).toDF("u", "t", "et")
    val got = Behavior.markovStationary(ev, "u", "t", "et", 3)
      .as[(String, Long)].collect().toMap
    assert(got === Map("A" -> 1000000L, "B" -> 1000000L))
  }

  test("clampedBalance: Lindley windows match the direct recursion") {
    // deltas 3, -5, 4, -1 -> W = 3, 0 (clamped), 4, 3
    val df = Seq((1L, 3L), (2L, -5L), (3L, 4L), (4L, -1L))
      .map { case (t, d) => ("k", t, t, d) }.toDF("g", "t", "tie", "d")
    val got = TimeSeries.clampedBalance(df, "g", "t", "tie", "d")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got === (("k", 3L, 4L, 1L, 4L)))
  }

  test("clampedBalance: never-negative sequence reduces to prefix sums") {
    val df = Seq((1L, 2L), (2L, 3L), (3L, -1L))
      .map { case (t, d) => ("k", t, t, d) }.toDF("g", "t", "tie", "d")
    val got = TimeSeries.clampedBalance(df, "g", "t", "tie", "d")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got === (("k", 4L, 5L, 0L, 3L)))
  }

  test("clampedBalance: demand beyond stock is lost, not backordered") {
    // sell 10 from stock 2: clamp to 0; restock 5 -> final 5, one clamp
    val df = Seq((1L, 2L), (2L, -10L), (3L, 5L))
      .map { case (t, d) => ("k", t, t, d) }.toDF("g", "t", "tie", "d")
    val got = TimeSeries.clampedBalance(df, "g", "t", "tie", "d")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got === (("k", 5L, 5L, 1L, 3L)))
  }

  test("entryExit: sessions split on the gap; bounces are 1-event sessions") {
    val ev = Seq(
      (1L, 0L, "a"), (1L, 10L, "b"),      // session 1: entry a, exit b
      (1L, 2000L, "c"),                   // session 2: bounce on c
      (2L, 5L, "b")                       // u2: bounce on b
    ).toDF("u", "t", "et")
    val got = Behavior.entryExit(ev, "u", "t", "et", 100L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 1L, 0L, 0L), ("b", 1L, 2L, 1L),
      ("c", 1L, 1L, 1L)))
  }
}
