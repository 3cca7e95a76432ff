package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphShapeSpec extends SparkSpec {
  import spark.implicits._

  private def pathNodes(n: Int) = (0L until n.toLong).toDF("id")

  test("multiSourceBfs: two seeds carry independent distances") {
    // directed path 0->1->2->3 with seeds {0, 2}
    val nodes = pathNodes(4).withColumn("is_seed", col("id").isin(0L, 2L))
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.multiSourceBfs(nodes, edges, "is_seed", 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(r === Set((0L, 0L, 0L), (0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L),
      (2L, 2L, 0L), (2L, 3L, 1L)))
  }

  test("closeness: star center is maximally close") {
    val nodes = pathNodes(5).withColumn("is_seed", col("id") === 0)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val r = Graph.closeness(nodes, edges, "is_seed", 5)
      .select("n_reached", "sum_dist", "closeness_e6")
      .as[(Long, Long, Long)].head()
    assert(r === ((5L, 4L, 1000000L)), "4 neighbors at distance 1 -> closeness 1.0")
  }

  test("bipartiteCheck: even cycle passes, odd cycle fails") {
    val nodes = pathNodes(6).withColumn("is_root", col("id") === 0)
    val even = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (0L, 5L))
      .toDF("a", "b")
    val odd = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L)).toDF("a", "b")
    val re = Graph.bipartiteCheck(nodes, even, "is_root", 10)
      .select("is_bipartite", "n_violating").as[(Boolean, Long)].head()
    val ro = Graph.bipartiteCheck(nodes, odd, "is_root", 10)
      .select("is_bipartite", "n_violating").as[(Boolean, Long)].head()
    assert(re === ((true, 0L)))
    assert(ro._1 === false && ro._2 >= 1L)
  }

  test("edgeJaccard: triangle edges score 1/3, pendant scores 0") {
    // triangle 0-1-2 plus pendant 2-3
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val r = Graph.edgeJaccard(edges)
      .select(col("a"), col("b"), col("jac_e6"))
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    // edge (0,1): common {2}; union = deg0+deg1-1 = 2+2-1 = 3 -> 333333
    assert(r((0L, 1L)) === 333333L)
    assert(r((2L, 3L)) === 0L)
  }
}
