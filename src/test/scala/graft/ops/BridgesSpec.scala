package graft.ops

import graft.SparkSpec

class BridgesSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[(Long, Long), Boolean] = {
    val n = nodes.toDF("id")
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.map { case (a, b) => (a, b, a * 1000 + b) }
      .toDF("a", "b", "w")
    Graph.bridges(n, e, 20).as[(Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
  }

  test("bridges: every edge of a path is a bridge") {
    val got = run(1L to 5L, (1L to 4L).map(i => (i, i + 1)))
    assert(got.size === 4)
    assert(got.values.forall(identity))
  }

  test("bridges: a cycle has none") {
    val got = run(1L to 5L, (1L to 4L).map(i => (i, i + 1)) :+ (5L, 1L))
    // forest = 4 of the 5 edges; none is a bridge
    assert(got.size === 4)
    assert(got.values.forall(b => !b))
  }

  test("bridges: two triangles joined by one edge — only the join edge cuts") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle A
      (4L, 5L), (5L, 6L), (4L, 6L),               // triangle B
      (3L, 4L))                                   // the bridge
    val got = run(1L to 6L, edges)
    assert(got.size === 5) // forest: 2 per triangle + the join edge
    assert(got((3L, 4L)) === true)
    assert(got.filterNot(_._1 == (3L, 4L)).values.forall(b => !b))
  }

  test("bridges: disconnected forest with a cycle component") {
    // component 1: path 1-2-3 (both edges bridges)
    // component 2: square 10-11-12-13-10 (no bridges) with a tail 13-14
    val edges = Seq((1L, 2L), (2L, 3L),
      (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L), (13L, 14L))
    val got = run(Seq(1L, 2L, 3L, 10L, 11L, 12L, 13L, 14L, 99L), edges)
    assert(got.size === 6) // 2 + 3 (square minus one) + tail
    assert(got((1L, 2L)) && got((2L, 3L)) && got((13L, 14L)))
    assert(Seq((10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L))
      .flatMap(got.get).forall(b => !b))
  }

  test("bridges: barbell — two cycles chained by a 3-edge path") {
    // cycle 1-2-3-1, path 3-7-8-4, cycle 4-5-6-4: the path edges cut
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 7L), (7L, 8L), (4L, 8L))
    val got = run(1L to 8L, edges)
    assert(got((3L, 7L)) && got((7L, 8L)) && got((4L, 8L)))
    assert(got.count(_._2) === 3)
  }
}
