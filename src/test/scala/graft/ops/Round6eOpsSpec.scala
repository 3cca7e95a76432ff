package graft.ops

import graft.SparkSpec

class Round6eOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankWeighted: hand-computed 3:1 mass split") {
    // 1→2 w3, 1→3 w1, 2→3 w1, 3→1 w2; one round from uniform 1e6
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 1L, 2L))
      .toDF("src", "dst", "w")
    val pr = Graph.pageRankWeighted(nodes, edges, 1)
      .as[(Long, Long)].collect().toMap
    assert(pr === Map(1L -> 1000000L, 2L -> 787500L, 3L -> 1212500L))
  }

  test("pageRankWeighted with unit weights equals pageRank") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val e2 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val ew = e2.withColumn("w", org.apache.spark.sql.functions.lit(1L))
    val a = Graph.pageRank(nodes, e2, 3).as[(Long, Long)].collect().toMap
    val b = Graph.pageRankWeighted(nodes, ew, 3).as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("funnelStages with step deadline stalls slow conversions") {
    val ev = Seq(
      (1L, 0L, "view"), (1L, 50L, "click"), (1L, 90L, "purchase"),   // in time
      (2L, 0L, "view"), (2L, 200L, "click"),                         // click too late
      (3L, 0L, "view"), (3L, 50L, "click"), (3L, 300L, "purchase")   // purchase too late
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelStages(ev, "user_id", "t_us", "event_type",
        Seq("view", "click", "purchase"), Some(100L))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 2))
  }

  test("funnelStages deadline: a later in-window event still converts") {
    // first click is outside the window, a second one inside is taken
    val ev = Seq(
      (1L, 0L, "view"), (1L, 200L, "click"), (1L, 80L, "click")
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelStages(ev, "user_id", "t_us", "event_type",
        Seq("view", "click"), Some(100L))
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 2))
  }

  test("diffColumns attributes the changed column") {
    val v1 = Seq((1L, "a", "p"), (2L, "b", "q"), (3L, "c", "r"), (4L, "d", "s"))
      .toDF("k", "c1", "c2")
    val v2 = Seq((1L, "a", "p"),      // unchanged → dropped
      (2L, "B", "q"),                 // c1 changed
      (3L, "c", "R"),                 // c2 changed
      (5L, "e", "t"))                 // added; 4 removed
      .toDF("k", "c1", "c2")
    val got = Snapshot.diffColumns(v1, v2, "k", Seq("c1", "c2"))
      .as[(Long, String, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      2L -> (("changed", Seq("c1"))),
      3L -> (("changed", Seq("c2"))),
      4L -> (("removed", Seq())),
      5L -> (("added", Seq()))))
  }

  test("diffColumns: both columns changed lists both, declaration order") {
    val v1 = Seq((1L, "a", "p")).toDF("k", "c1", "c2")
    val v2 = Seq((1L, "X", "Y")).toDF("k", "c1", "c2")
    val got = Snapshot.diffColumns(v1, v2, "k", Seq("c1", "c2"))
      .as[(Long, String, Seq[String])].head()
    assert(got === ((1L, "changed", Seq("c1", "c2"))))
  }
}
