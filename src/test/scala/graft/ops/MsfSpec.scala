package graft.ops

import graft.SparkSpec

class MsfSpec extends SparkSpec {
  import spark.implicits._

  test("minimumSpanningForest: Kruskal-by-hand on a cycle graph") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 5L), (3L, 4L, 2L),
      (1L, 4L, 4L), (1L, 3L, 3L)).toDF("a", "b", "w")
    // take w=1, w=2, w=3; w=4 and w=5 both close cycles
    val got = Graph.minimumSpanningForest(nodes, edges, 5)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1L), (3L, 4L, 2L), (1L, 3L, 3L)))
  }

  test("minimumSpanningForest: disconnected input yields a forest") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val edges = Seq((1L, 2L, 7L), (2L, 3L, 6L), (10L, 11L, 5L))
      .toDF("a", "b", "w")
    val got = Graph.minimumSpanningForest(nodes, edges, 5)
      .as[(Long, Long, Long)].collect().toSet
    // every edge is a bridge here; isolated node 99 contributes nothing
    assert(got === Set((1L, 2L, 7L), (2L, 3L, 6L), (10L, 11L, 5L)))
  }

  test("minimumSpanningForest: a chain needs multiple Boruvka rounds") {
    // chain 1-2-3-4-5-6-7-8 with increasing weights: MSF = all edges;
    // components merge pairwise so 3 rounds are required
    val nodes = (1L to 8L).toDF("id")
    val edges = (1L to 7L).map(i => (i, i + 1, i * 10L)).toDF("a", "b", "w")
    val got = Graph.minimumSpanningForest(nodes, edges, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === (1L to 7L).map(i => (i, i + 1, i * 10L)).toSet)
  }

  test("minimumSpanningForest: total weight beats any alternative tree") {
    // K4 with distinct weights — MSF weight is the known minimum
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 20L), (1L, 4L, 30L),
      (2L, 3L, 40L), (2L, 4L, 50L), (3L, 4L, 60L)).toDF("a", "b", "w")
    val got = Graph.minimumSpanningForest(nodes, edges, 5)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._3).sum === 60L) // 10 + 20 + 30
    assert(got.length === 3)
  }
}
