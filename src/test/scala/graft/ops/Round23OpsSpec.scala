package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round23OpsSpec extends SparkSpec {
  import spark.implicits._

  test("nelsonAalen: textbook risk-set walk") {
    // t=1: 5 at risk, 1 event → 200000; t=2: 3 at risk (one censored
    // left at t=1), 1 event → 333333; t=3: 2 at risk, 0 events (no row);
    // subjects: (1,ev), (1,cens), (2,ev), (3,cens), (3,cens).
    val df = Seq((1L, 1L), (1L, 0L), (2L, 1L), (3L, 0L), (3L, 0L))
      .toDF("t", "ev")
    val r = Stats.nelsonAalen(df, "t", "ev")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length === 2)
    assert(r(0) === ((1L, 5L, 1L, 200000L, 200000L)))
    assert(r(1) === ((2L, 3L, 1L, 333333L, 533333L)))
  }

  test("nelsonAalen: hazard is cumulative and monotone") {
    val df = (1L to 10L).map(t => (t, 1L)).toDF("t", "ev")
    val r = Stats.nelsonAalen(df, "t", "ev")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length === 10)
    assert(r.map(_._5).toSeq === r.map(_._5).sorted.toSeq)
    assert(r.head._2 === 10L && r.last._2 === 1L)
    assert(r.last._4 === 1000000L) // last subject: d/n = 1
  }

  test("lorenz: perfect equality puts d/10 of value at each decile") {
    val df = (1L to 10L).map(_ => ("g", 100L)).toDF("g", "cents")
    val r = Quantiles.lorenz(df, "g", "cents")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(r.length === 10)
    r.foreach { case (_, d, k, share) =>
      assert(k === d)
      assert(share === d * 100000L)
    }
  }

  test("lorenz: extreme inequality concentrates in the top decile") {
    // nine zeros and one 1000 → shares 0 through decile 9, 1e6 at 10.
    val df = ((1 to 9).map(_ => ("g", 0L)) :+ (("g", 1000L))).toDF("g", "cents")
    val r = Quantiles.lorenz(df, "g", "cents")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2)
    assert(r.take(9).forall(_._4 === 0L))
    assert(r.last._4 === 1000000L)
  }

  test("transitionEntropy: deterministic chain has zero entropy") {
    // a→b→a→b...: next state is always determined.
    val ev = (1L to 8L).map(i =>
      (1L, i, i, if (i % 2 == 1) "a" else "b"))
      .toDF("u", "t", "tie", "et")
    val r = Behavior.transitionEntropy(ev, "u", "t", "tie", "et")
      .as[(String, Long, Long)].collect().map(x => x._1 -> x._3).toMap
    assert(r("a") === 0L && r("b") === 0L)
  }

  test("transitionEntropy: uniform 2-way split is exactly 1 bit") {
    // from "s": to "x" twice, to "y" twice (across users).
    val ev = Seq(
      (1L, 1L, 1L, "s"), (1L, 2L, 2L, "x"),
      (2L, 1L, 3L, "s"), (2L, 2L, 4L, "y"),
      (3L, 1L, 5L, "s"), (3L, 2L, 6L, "x"),
      (4L, 1L, 7L, "s"), (4L, 2L, 8L, "y"))
      .toDF("u", "t", "tie", "et")
    val r = Behavior.transitionEntropy(ev, "u", "t", "tie", "et")
      .as[(String, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3)))
      .toMap
    assert(r("s") === ((4L, 1000000L)))
    assert(!r.contains("x") && !r.contains("y")) // terminal states: no outgoing
  }
}
