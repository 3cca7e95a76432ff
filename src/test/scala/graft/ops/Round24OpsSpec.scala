package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round24OpsSpec extends SparkSpec {
  import spark.implicits._

  test("lubyMis: result is independent and maximal on a path graph") {
    val nodes = (1L to 6L).toDF("id")
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val r = Graph.lubyMis(nodes, edges, 8)
      .as[(Long, Long)].collect().toMap
    assert(r.size === 6 && !r.values.exists(_ == -1L))
    val in = r.filter(_._2 == 1L).keySet
    // independence: no adjacent pair both in
    (1L to 5L).foreach(i => assert(!(in(i) && in(i + 1))))
    // maximality: every excluded node has an in-MIS neighbor
    r.filter(_._2 == 0L).keys.foreach { v =>
      assert(in.contains(v - 1) || in.contains(v + 1), s"node $v uncovered")
    }
  }

  test("lubyMis: isolated nodes always join the MIS in round 1") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((2L, 3L)).toDF("a", "b")
    val r = Graph.lubyMis(nodes, edges, 4)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) === 1L)
    assert(Seq(r(2L), r(3L)).sorted === Seq(0L, 1L))
  }

  test("lubyMis: deterministic across runs") {
    val nodes = (1L to 20L).toDF("id")
    val edges = (1L to 19L).map(i => (i, i + 1)).toDF("a", "b")
    val r1 = Graph.lubyMis(nodes, edges, 8).as[(Long, Long)].collect().toSet
    val r2 = Graph.lubyMis(nodes, edges, 8).as[(Long, Long)].collect().toSet
    assert(r1 === r2)
  }

  test("etaSquared: perfect seasonality explains all variance") {
    // class 0 always 10, class 1 always 30 → SSW = 0 → strength 1.
    val df = Seq(("k", 0L, 10L), ("k", 0L, 10L), ("k", 1L, 30L),
      ("k", 1L, 30L)).toDF("key", "cls", "x")
    val r = Stats.etaSquared(df, "key", "cls", "x")
      .as[(String, Long, Long, Long, Long, Option[Double])].head()
    assert(r._2 === 2L && r._4 > 0L && r._5 === 0L)
    assert(r._6.contains(1.0))
  }

  test("etaSquared: class means equal -> zero strength; constant -> NULL") {
    val flat = Seq(("k", 0L, 10L), ("k", 0L, 20L), ("k", 1L, 10L),
      ("k", 1L, 20L)).toDF("key", "cls", "x")
    val r = Stats.etaSquared(flat, "key", "cls", "x")
      .as[(String, Long, Long, Long, Long, Option[Double])].head()
    assert(r._6.contains(0.0)) // SSB = 0
    val const = Seq(("k", 0L, 5L), ("k", 1L, 5L)).toDF("key", "cls", "x")
    val rc = Stats.etaSquared(const, "key", "cls", "x")
      .as[(String, Long, Long, Long, Long, Option[Double])].head()
    assert(rc._6.isEmpty)
  }

  test("backtestSeasonalNaive: forecast is the same-dow training mean") {
    // key k: days 0..13, count = 10 on even dow-weeks... simpler:
    // day d has count d+1. horizon 7 → test days 7..13; forecast for
    // day d is count of day d-7 (only same-dow predecessor) = d-6.
    val rows = (0L to 13L).flatMap(d => Seq.fill((d + 1).toInt)(("k", d)))
    val r = TimeSeries.backtestSeasonalNaive(rows.toDF("k", "day"), "k",
        "day", 7)
      .as[(String, Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(r.length === 7)
    r.foreach { case (_, day, nTrain, fc, actual, err) =>
      assert(nTrain === 1L)
      assert(fc === (day - 6) * 1000000L)
      assert(actual === day + 1)
      assert(err === 7000000L) // actual − forecast = 7 every time
    }
  }

  test("backtestSeasonalNaive: multiple same-dow trainers average exactly") {
    // day 14 sees days 0 and 7 as trainers (counts 1 and 8): mean 4.5.
    val rows = (0L to 14L).flatMap(d => Seq.fill((d + 1).toInt)(("k", d)))
    val r = TimeSeries.backtestSeasonalNaive(rows.toDF("k", "day"), "k",
        "day", 1)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(r._2 === 14L && r._3 === 2L)
    assert(r._4 === 4500000L && r._5 === 15L)
    assert(r._6 === 10500000L)
  }
}
