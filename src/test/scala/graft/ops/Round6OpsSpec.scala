package graft.ops

import graft.SparkSpec

class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: uniform cycle is a fixed point") {
    // 1→2→3→1, outdeg 1 everywhere: 150000 + 85% of 1e6 = 1e6 each round
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, edges, 3).as[(Long, Long)].collect().toMap
    assert(pr === Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pageRank: asymmetric graph matches hand-computed integer ranks") {
    // 1→{2,3}, 2→3, 3→1; two rounds computed by hand with e6 truncation
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, edges, 2).as[(Long, Long)].collect().toMap
    assert(pr === Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L))
  }

  test("pageRank: dangling node leaks mass, isolated node keeps teleport floor") {
    // 1→2, 2 has no out-edges, 3 isolated: after 1 round
    // pr(1)=150000 (no in-mass), pr(2)=150000+850000, pr(3)=150000
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val pr = Graph.pageRank(nodes, edges, 1).as[(Long, Long)].collect().toMap
    assert(pr === Map(1L -> 150000L, 2L -> 1000000L, 3L -> 150000L))
  }

  test("scd2: runs compress, intervals chain, last run is current") {
    val ev = Seq(
      (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
      (2L, 10L, "x")
    ).toDF("user_id", "t_us", "event_type")
    val got = History.scd2(ev, "user_id", "t_us", "event_type")
      .as[(Long, Long, String, Option[Long], Boolean)].collect().toSet
    assert(got === Set(
      (1L, 10L, "a", Some(30L), false),
      (1L, 30L, "b", Some(40L), false),
      (1L, 40L, "a", None, true),
      (2L, 10L, "x", None, true)))
  }

  test("skyline2D: dominance, ties, and duplicate survivors") {
    // maximize x, minimize y
    val pts = Seq(
      ("a", 10L, 5L),  // frontier
      ("b", 10L, 7L),  // dominated by a (same x, higher y)
      ("c", 8L, 3L),   // frontier (lower x but cheaper)
      ("d", 8L, 3L),   // duplicate of c — both survive
      ("e", 6L, 3L),   // dominated by c (same y, lower x)
      ("f", 12L, 9L),  // frontier (highest x)
      ("g", 5L, 1L)    // frontier (cheapest overall)
    ).toDF("id", "x_val", "y_val")
    val got = Skyline.skyline2D(pts, "x_val", "y_val")
      .select("id").as[String].collect().toSet
    assert(got === Set("a", "c", "d", "f", "g"))
    val levels = Skyline.frontierLevels(pts, "x_val", "y_val")
      .as[(Long, Long)].collect().toSet
    assert(levels === Set((12L, 9L), (10L, 5L), (8L, 3L), (5L, 1L)))
  }
}
