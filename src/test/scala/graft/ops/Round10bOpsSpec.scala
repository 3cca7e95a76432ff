package graft.ops

import graft.SparkSpec

class Round10bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kTruss: 4-truss keeps K4, sheds the pendant triangle") {
    // K4 on {1,2,3,4} (every edge in 2 triangles) + triangle {4,5,6}
    // hanging off: in the 4-truss the pendant triangle's edges have
    // support 1 < 2 and peel away, taking {5,6} with them
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val got = Graph.kTruss(edges, 4, 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 3L, 2L), (2L, 4L, 2L), (3L, 4L, 2L)))
  }

  test("kTruss: k=5 on K4 empties without diverging") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    assert(Graph.kTruss(edges, 5, 10).isEmpty)
  }

  test("seasonalProfile: dow means and cross-multiplied lift") {
    val day = 86400000000L
    // key a: Thu (day 0) values 10,20 -> mean 15; Fri (day 1) value 60
    // overall mean 30 -> lift Thu = 15/30 = 0.5, Fri = 60/30 = 2.0
    val events = Seq(("a", 0L * day, 10L), ("a", 0L * day + 5L, 20L),
      ("a", 1L * day, 60L)).toDF("event_type", "t_us", "cents")
    val got = TimeSeries.seasonalProfile(events, "event_type", "t_us", "cents")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // 1970-01-01 = Thursday = dow 3
    assert(got === Set(("a", 3L, 2L, 15L, 500000L), ("a", 4L, 1L, 60L, 2000000L)))
  }

  test("binarySegmentation: three-level staircase yields both cuts") {
    // 0,0,0 | 50,50,50 | 100,100,100 -> level-1 cut between 0s and rest
    // is at rn=3 OR between 50s/100s (equal scores? check): means
    // 0 vs 75 (diff 75) at rn=3; 25 vs 100 (diff 75) at rn=6 — tie,
    // earliest wins (t=3). Level 2: left half all-0 -> best split still
    // emitted (score 0? no: left half 0,0,0 constant -> all splits score
    // 0, earliest chosen); right half 50,50,50,100,100,100 -> cut at t=6.
    val events = (1L to 9L).map { i =>
      val v = if (i <= 3) 0L else if (i <= 6) 50L else 100L
      ("a", i, i, v)
    }.toDF("event_type", "t_us", "event_id", "cents")
    val got = Anomaly.binarySegmentation(events, "event_type", "t_us",
        "event_id", "cents")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got.contains(("a", 1L, -1L, 3L, 75000000L, 9L)))
    assert(got.contains(("a", 2L, 1L, 6L, 50000000L, 6L)))
    val leftL2 = got.filter(r => r._2 == 2L && r._3 == 0L)
    assert(leftL2.size == 1 && leftL2.head._5 == 0L) // constant half: score 0
  }

  test("maximalTriangles: K4 faces are not maximal, pendant triads are") {
    // K4 {1,2,3,4}: all 4 triangles extend to the 4th vertex; the
    // separate triangle {7,8,9} is maximal
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (7L, 8L), (8L, 9L), (7L, 9L)).toDF("a", "b")
    val got = Graph.maximalTriangles(edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((7L, 8L, 9L)))
  }

  test("maximalTriangles: triangle with a pendant vertex is still maximal") {
    // {1,2,3} + edge 3-4: vertex 4 is adjacent to 3 only -> no extension
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.maximalTriangles(edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 3L)))
  }

  test("jaccardPrefixJoinAdaptive: equals the naive join under banded tau") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"),          // sz 4: tau 0.6 -> J=3/5 passes
      (3L, "a b x y"), (4L, "a b z w"),          // J=2/6 fails at 0.6
      (5L, (1 to 12).map("t" + _).mkString(" ") + " a"),
      (6L, (1 to 12).map("t" + _).mkString(" ") + " b") // sz 13: tau 0.2, J=12/14 passes
    ).toDF("doc_id", "text")
    val bands = spark.createDataFrame(Seq((0L, 10L, 600000L),
      (10L, 1000L, 200000L))).toDF("len_lo", "len_hi", "tau_e6")
    val fast = Dedup.jaccardPrefixJoinAdaptive(docs, bands)
      .select("doc_a", "doc_b", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    val naive = Dedup.jaccardPairs(docs)
      .join(broadcast(docs.select(col("doc_id").as("doc_a"),
        size(array_distinct(filter(split(col("text"), " "), _ =!= ""))).as("sza"))), "doc_a")
      .join(broadcast(docs.select(col("doc_id").as("doc_b"),
        size(array_distinct(filter(split(col("text"), " "), _ =!= ""))).as("szb"))), "doc_b")
      .withColumn("tau", when(least(col("sza"), col("szb")) < 10, 600000L)
        .otherwise(200000L))
      .filter(col("inter") * 1000000L >= col("tau") * col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast === naive)
    assert(fast.contains((1L, 2L, 3L, 5L)) && fast.contains((5L, 6L, 12L, 14L)))
    assert(!fast.exists(p => p._1 == 3L && p._2 == 4L))
  }

  test("jaccardPrefixJoinAdaptive: rejects a non-monotone threshold table") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val bad = spark.createDataFrame(Seq((0L, 10L, 200000L),
      (10L, 1000L, 500000L))).toDF("len_lo", "len_hi", "tau_e6")
    assertThrows[IllegalArgumentException] {
      Dedup.jaccardPrefixJoinAdaptive(docs, bad).collect()
    }
  }

  test("widestPaths: takes the high-capacity detour over the direct pinch") {
    // 1 -> 2 direct width 1; detour 1 -> 3 -> 2 width min(10, 8) = 8
    val nodes = Seq((1L, true), (2L, false), (3L, false)).toDF("id", "is_src")
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 10L), (3L, 2L, 8L))
      .toDF("src", "dst", "w")
    val got = Graph.widestPaths(nodes, edges, "is_src", 8)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> Long.MaxValue, 2L -> 8L, 3L -> 10L))
  }

  test("widestPaths: parallel edges keep the widest") {
    val nodes = Seq((1L, true), (2L, false)).toDF("id", "is_src")
    val edges = Seq((1L, 2L, 3L), (1L, 2L, 7L)).toDF("src", "dst", "w")
    val got = Graph.widestPaths(nodes, edges, "is_src", 2)
      .as[(Long, Long)].collect().toMap
    assert(got(2L) === 7L)
  }

  test("binarySegmentation: single-point halves emit no level-2 row") {
    val events = Seq(("a", 1L, 1L, 0L), ("a", 2L, 2L, 100L))
      .toDF("event_type", "t_us", "event_id", "cents")
    val got = Anomaly.binarySegmentation(events, "event_type", "t_us",
        "event_id", "cents")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.length === 1 && got.head._2 === 1L) // only the level-1 split
  }
}
