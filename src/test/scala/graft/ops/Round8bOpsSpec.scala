package graft.ops

import graft.SparkSpec

class Round8bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("resourceAllocation: hub neighbors contribute less than tight ones") {
    // 1-5-2 (5 is degree-2) and 1-6-2 where 6 also touches 7, 8 (degree-4):
    // ra(1,2) = 1e6/2 + 1e6/4 = 750000, n_common = 2
    val edges = Seq((1L, 5L), (5L, 2L), (1L, 6L), (6L, 2L), (6L, 7L), (6L, 8L))
      .toDF("a", "b")
    val got = Graph.resourceAllocation(edges, 2L)
      .as[(Long, Long, Long, Long)].collect().toSet
    // (5,6) is also distance-2: via 1 and 2, both degree-2 -> ra 1e6
    assert(got === Set((1L, 2L, 2L, 750000L), (5L, 6L, 2L, 1000000L)))
  }

  test("resourceAllocation: adjacent pairs are excluded") {
    // triangle 1-2-3: every 2-path endpoint pair is already an edge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    assert(Graph.resourceAllocation(edges, 1L).isEmpty)
  }

  test("shortestPaths: relaxation finds the cheap long way round") {
    // 1 -> 2 costs 10 direct, but 1 -> 3 -> 4 -> 2 costs 3
    val nodes = Seq((1L, true), (2L, false), (3L, false), (4L, false))
      .toDF("id", "is_src")
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.shortestPaths(nodes, edges, "is_src", 8)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
  }

  test("shortestPaths: hop bound caps the improvement") {
    val nodes = Seq((1L, true), (2L, false), (3L, false), (4L, false))
      .toDF("id", "is_src")
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L))
      .toDF("src", "dst", "w")
    // 1 hop: only the direct edges from the source are reachable
    val got = Graph.shortestPaths(nodes, edges, "is_src", 1)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
  }

  test("shortestPaths: parallel edges keep the min weight") {
    val nodes = Seq((1L, true), (2L, false)).toDF("id", "is_src")
    val edges = Seq((1L, 2L, 9L), (1L, 2L, 4L)).toDF("src", "dst", "w")
    val got = Graph.shortestPaths(nodes, edges, "is_src", 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 4L))
  }

  test("groupedPercentile: per-group median matches sort definition") {
    // g=a: 1..7 -> median 4 (k=4); g=b: 10,20,30,40 -> k=2 -> 20
    val df = ((1L to 7L).map(("a", _)) ++ Seq(10L, 20L, 30L, 40L).map(("b", _)))
      .toDF("g", "v")
    val got = Quantiles.groupedPercentile(df, "g", "v", 500000L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 500000L, 4L, 7L, 4L), ("b", 500000L, 2L, 4L, 20L)))
  }

  test("groupedPercentile: duplicate-heavy group and tiny domain") {
    val df = (Seq.fill(9)(("a", 7L)) :+ (("a", 1L))).toDF("g", "v")
    val got = Quantiles.groupedPercentile(df, "g", "v", 500000L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 500000L, 5L, 10L, 7L)))
  }

  test("groupedPercentile: p100 picks the max per group") {
    val df = Seq(("a", 3L), ("a", 9L), ("b", 5L)).toDF("g", "v")
    val got = Quantiles.groupedPercentile(df, "g", "v", 1000000L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("a", 1000000L, 2L, 2L, 9L), ("b", 1000000L, 1L, 1L, 5L)))
  }
}
