package graft.ops

import graft.SparkSpec

class GraphLocalSpec extends SparkSpec {
  import spark.implicits._

  test("localClustering: triangle scores 1e6, path middle scores 0") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val r = Graph.localClustering(e).as[(Long, Long, Long, Long)]
      .collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, 2L, 1L, 1000000L)))
    assert(r(2L) === ((2L, 2L, 1L, 1000000L)))
    // vertex 3: deg 3, one triangle -> 2*1/(3*2) = 1/3
    assert(r(3L) === ((3L, 3L, 1L, 333333L)))
    assert(r(4L) === ((4L, 1L, 0L, 0L))) // degree-1 leaf
  }

  test("assortativity: a star is perfectly disassortative (r = -1)") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r = Graph.assortativity(e).as[(Long, Option[Double])].head()
    assert(r._1 === 6L)
    assert(r._2.get === -1.0)
  }

  test("assortativity: zero-variance degrees yield NULL") {
    val e = Seq((1L, 2L), (3L, 4L)).toDF("a", "b") // all degrees 1
    val r = Graph.assortativity(e).as[(Long, Option[Double])].head()
    assert(r._2.isEmpty)
  }

  test("labelPropagation: a triangle converges to the min label") {
    val n = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val r = Graph.labelPropagation(n, e, 4).as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: isolated vertices keep their own label") {
    val n = Seq(1L, 2L, 9L).toDF("id")
    val e = Seq((1L, 2L)).toDF("a", "b")
    val r = Graph.labelPropagation(n, e, 2).as[(Long, Long)].collect().toMap
    assert(r(9L) === 9L)
    // 1 and 2 swap labels every sync round: after 2 rounds, back home
    assert(r(1L) === 1L && r(2L) === 2L)
  }
}
