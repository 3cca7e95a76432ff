package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round25OpsSpec extends SparkSpec {
  import spark.implicits._

  test("shapleyAttribution: lone decisive channel takes the whole value") {
    // Only {a}→conv observed: v({a}) = 1e6, all other sets 0 (the
    // documented unobserved-set convention).
    // phi(a) = [1·(v({a})−v(∅)) + 1·(v({a,b})−v({b}))]/2 = 1e6/2.
    // phi(b) = [1·(v({b})−v(∅)) + 1·(v({a,b})−v({a}))]/2 = −1e6/2 —
    // the unobserved full set makes b look harmful, by construction.
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "purchase"),
      (2L, 1L, 3L, "a"), (2L, 2L, 4L, "purchase"))
      .toDF("u", "t", "tie", "et")
    val r = Behavior.shapleyAttribution(ev, "u", "t", "tie", "et",
        "purchase", Seq("a", "b"))
      .as[(String, Long)].collect().toMap
    assert(r("a") === 500000L)
    assert(r("b") === -500000L)
  }

  test("shapleyAttribution: symmetric channels split equally") {
    // {a,b} always together → v({a,b}) = 1e6, singles unobserved.
    // phi(a) = [1!·0!·(v(ab)−v(b)) + 0!·1!·(v(a)−v(∅))]/2 = 1e6/2; same b.
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "purchase"),
      (2L, 1L, 4L, "b"), (2L, 2L, 5L, "a"), (2L, 3L, 6L, "purchase"))
      .toDF("u", "t", "tie", "et")
    val r = Behavior.shapleyAttribution(ev, "u", "t", "tie", "et",
        "purchase", Seq("a", "b"))
      .as[(String, Long)].collect().toMap
    assert(r("a") === 500000L && r("b") === 500000L)
  }

  test("shapleyAttribution: harmful channel goes negative") {
    // {a} converts (2/2); {a,b} never converts (0/2) → b's marginal on
    // {a} is −1e6; phi(b) = (1·0 + 1·(v(ab)−v(a)))/2 = −5e5.
    val ev = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "purchase"),
      (2L, 1L, 3L, "a"), (2L, 2L, 4L, "purchase"),
      (3L, 1L, 5L, "a"), (3L, 2L, 6L, "b"),
      (4L, 1L, 7L, "b"), (4L, 2L, 8L, "a"))
      .toDF("u", "t", "tie", "et")
    val r = Behavior.shapleyAttribution(ev, "u", "t", "tie", "et",
        "purchase", Seq("a", "b"))
      .as[(String, Long)].collect().toMap
    assert(r("b") === -500000L)
  }

  test("acf: a perfectly alternating series has r1 = -1, r2 = +1 shape") {
    // counts 1,3,1,3,... over 8 days (one event per count unit).
    val rows = (0L until 8L).flatMap(d =>
      Seq.fill(if (d % 2 == 0) 1 else 3)(("k", d)))
    val r = TimeSeries.acf(rows.toDF("k", "day"), "k", "day", 2)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(x => x._2 -> x._4.get).toMap
    // classic estimator damps toward 0 with lag but signs must hold
    assert(r(1L) < -0.8 && r(2L) > 0.7)
  }

  test("acf: denominator zero (constant series) yields NULL") {
    val rows = (0L until 5L).map(d => ("k", d))
    val r = TimeSeries.acf(rows.toDF("k", "day"), "k", "day", 1)
      .as[(String, Long, Long, Option[Double])].head()
    assert(r._4.isEmpty)
  }

  test("recallAtK: hit iff a basket partner is in the top-k recs") {
    // train: items 1,2 co-occur twice (recs each other); 3 isolated.
    val train = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 3L))
      .toDF("b", "i")
    // test basket {1,2}: both evaluable, both hit. {1,3}: both
    // evaluable, neither hit (3 unknown; 1's recs don't contain 3).
    val test = Seq((100L, 1L), (100L, 2L), (200L, 1L), (200L, 3L))
      .toDF("b", "i")
    val r = Recsys.recallAtK(train, test, "b", "i", 2L, 5)
      .as[(Long, Long, Long)].head()
    assert(r === ((4L, 2L, 500000L)))
  }
}
