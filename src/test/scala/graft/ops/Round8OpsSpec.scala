package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankWeightedTeleport: all mass restarts at the weighted seeds") {
    // path graph 1 -> 2 -> 3; seed 1 with full weight
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq((1L, 1000000L)).toDF("seed", "w_e6")
    val got = Graph.pageRankWeightedTeleport(nodes, edges, seeds, 2)
      .as[(Long, Long)].collect().toMap
    // round 1: p1 = 150000, p2 = 850000, p3 = 0
    // round 2: p1 = 150000, p2 = 127500, p3 = 722500
    assert(got === Map(1L -> 150000L, 2L -> 127500L, 3L -> 722500L))
  }

  test("pageRankWeightedTeleport: weights split the restart vector") {
    // two disconnected self-loop nodes keep exactly their teleport share
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    val seeds = Seq((1L, 700000L), (2L, 300000L)).toDF("seed", "w_e6")
    val got = Graph.pageRankWeightedTeleport(nodes, edges, seeds, 8)
      .as[(Long, Long)].collect().toMap
    // fixpoint of p = 0.15 w + 0.85 p from p0 = w stays ~w (truncation drifts
    // down a hair); ratios hold
    assert(got(1L) > 2 * got(2L) && got(1L) <= 700000L && got(2L) <= 300000L)
  }

  test("bfsLevels: min-hop distances with early stop") {
    // 1 -> 2 -> 3 -> 4, plus shortcut 1 -> 3; node 5 unreachable
    val nodes = Seq((1L, true), (2L, false), (3L, false), (4L, false),
      (5L, false)).toDF("id", "is_src")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("src", "dst")
    val got = Graph.bfsLevels(nodes, edges, "is_src", 10)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("bfsLevels: maxDepth caps exploration") {
    val nodes = Seq((1L, true), (2L, false), (3L, false)).toDF("id", "is_src")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.bfsLevels(nodes, edges, "is_src", 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L))
  }

  test("commonNeighbors: scores distance-2 pairs, excludes adjacent ones") {
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) share 2 neighbors each
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = Graph.commonNeighbors(edges, 2L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 2L), (2L, 4L, 2L)))
  }

  test("commonNeighbors: minCommon filters single-wedge pairs") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(Graph.commonNeighbors(edges, 2L).isEmpty)
    val one = Graph.commonNeighbors(edges, 1L)
      .as[(Long, Long, Long)].collect().toSet
    assert(one === Set((1L, 3L, 1L)))
  }

  test("exactPercentiles: matches the order-statistic definition") {
    val vals = (1L to 100L) ++ Seq(1000000L) // outlier stretches the domain
    val df = vals.toDF("v")
    val got = Quantiles.exactPercentiles(df, "v", Seq(500000L, 990000L, 1000000L))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (p, k, n, v) => p -> ((k, n, v)) }.toMap
    // n = 101; p50 -> k = ceil(50.5) = 51 -> value 51
    assert(got(500000L) === ((51L, 101L, 51L)))
    // p99 -> k = ceil(99.99) = 100 -> value 100
    assert(got(990000L) === ((100L, 101L, 100L)))
    // p100 -> k = 101 -> the outlier
    assert(got(1000000L) === ((101L, 101L, 1000000L)))
  }

  test("exactPercentiles: heavy duplicates land on the repeated value") {
    val df = (Seq.fill(97)(5L) ++ Seq(1L, 2L, 9L)).toDF("v")
    val got = Quantiles.exactPercentiles(df, "v", Seq(500000L))
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((500000L, 50L, 100L, 5L)))
  }

  test("timeWeightedAvg: dwell time weights the mean; last point drops") {
    val us = 1000000L
    val events = Seq(
      // key a: value 10 holds 3 s, value 100 holds 1 s, final 7 dropped
      ("a", 0L * us, 1L, 10L), ("a", 3L * us, 2L, 100L), ("a", 4L * us, 3L, 7L),
      // key b: single point -> no spans -> absent
      ("b", 0L * us, 4L, 50L)
    ).toDF("event_type", "t_us", "event_id", "cents")
    val got = TimeSeries.timeWeightedAvg(events, "event_type", "t_us",
        "event_id", "cents")
      .as[(String, Option[Long], Long, Long)].collect()
      .map { case (k, tw, dw, n) => k -> ((tw, dw, n)) }.toMap
    // a: (10*3 + 100*1) / 4 = 32 (truncating)
    assert(got === Map("a" -> ((Some(32L), 4L, 2L))))
  }

  test("timeWeightedAvg: zero total dwell emits NULL, not a crash") {
    val events = Seq(("a", 100L, 1L, 10L), ("a", 900L, 2L, 99L))
      .toDF("event_type", "t_us", "event_id", "cents") // same second
    val got = TimeSeries.timeWeightedAvg(events, "event_type", "t_us",
        "event_id", "cents")
      .as[(String, Option[Long], Long, Long)].collect()
      .map { case (k, tw, dw, n) => k -> ((tw, dw, n)) }.toMap
    assert(got === Map("a" -> ((None, 0L, 1L))))
  }

  test("jaccardPrefixJoin: equals the naive threshold join") {
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "x y z"), (4L, "x y z"),
      (5L, "a q r s t u v w")
    ).toDF("doc_id", "text")
    val tau = 500000L
    val fast = Dedup.jaccardPrefixJoin(docs, tau)
      .select("doc_a", "doc_b", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    val naive = Dedup.jaccardPairs(docs)
      .filter(col("inter") * 1000000L >= lit(tau) * col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast === naive)
    assert(fast === Set((1L, 2L, 3L, 5L), (3L, 4L, 3L, 3L)))
  }

  test("jaccardPrefixJoin: prefix generates fewer candidate tokens than full") {
    // sanity on the mechanism: identical docs still pair at tau = 1.0
    val docs = Seq((1L, "p q r"), (2L, "p q r")).toDF("doc_id", "text")
    val got = Dedup.jaccardPrefixJoin(docs, 1000000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 3L, 3L)))
  }
}
