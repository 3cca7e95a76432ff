package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  private def path5 = {
    // path 1-2-3-4-5 (undirected via bidirection)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("eccentricity: path graph center vs endpoint") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
      .withColumn("is_seed", col("id") === 1 || col("id") === 3)
    val r = Graph.eccentricity(nodes, path5, "is_seed", 10)
      .as[(Long, Long, Long)].collect().map { case (s, n, e) => s -> ((n, e)) }.toMap
    assert(r === Map(1L -> ((5L, 4L)), 3L -> ((5L, 2L))))
  }

  test("eccentricity: maxDepth truncates the reach") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
      .withColumn("is_seed", col("id") === 1)
    val r = Graph.eccentricity(nodes, path5, "is_seed", 2)
      .as[(Long, Long, Long)].head()
    assert(r === ((1L, 3L, 2L)))
  }

  test("doubleSweepDiameter: exact on a tree, root in the middle") {
    // star-path: 3 is the root; farthest from 3 is 1 (ties -> smaller id),
    // ecc(1) = 4 = the true diameter of the 5-path
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
      .withColumn("is_root", col("id") === 3)
    val r = Graph.doubleSweepDiameter(nodes, path5, "is_root", 10)
      .as[(Long, Long, Long, Long)].head()
    assert(r === ((1L, 2L, 4L, 5L)))
  }

  test("doubleSweepDiameter: lower-bounds the cycle diameter") {
    // 6-cycle: true diameter 3; double sweep from any node reports >= 3
    val c = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L))
      .toDF("src", "dst")
    val adj = c.unionByName(c.select(col("dst").as("src"), col("src").as("dst")))
    val nodes = (1L to 6L).toDF("id").withColumn("is_root", col("id") === 1)
    val r = Graph.doubleSweepDiameter(nodes, adj, "is_root", 10)
      .select("diameter_lb").as[Long].head()
    assert(r === 3L)
  }

  test("mmr: first pick is plain argmax relevance, later picks trade off") {
    // a(rel 100) ~ b(rel 99) near-duplicates (sim 95); c(rel 50) distant.
    // MMR picks a, then c (99-95=4 < 50-10=40), then b.
    val cands = Seq((1L, 100L), (2L, 99L), (3L, 50L)).toDF("id", "rel")
    val simsHalf = Seq((1L, 2L, 95L), (1L, 3L, 10L), (2L, 3L, 10L))
      .toDF("a", "b", "sim")
    val sims = simsHalf.unionByName(simsHalf
      .select(col("b").as("a"), col("a").as("b"), col("sim")))
    val r = Diversify.mmr(cands, sims, 3)
      .orderBy("pick").as[(Long, Long, Long, Long)].collect()
    assert(r === Array((1L, 1L, 100L, 100L), (2L, 3L, 50L, 40L),
      (3L, 2L, 99L, 4L)))
  }

  test("betweenness: path graph — interior nodes carry the pairs") {
    // 4-path 1-2-3-4 (ordered pairs, e6): bc(2) = pairs (1,3),(1,4),(3,1),(4,1) -> 4e6
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val adj = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val r = Graph.betweenness(nodes, adj, 5)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 0L, 2L -> 4000000L, 3L -> 4000000L, 4L -> 0L))
  }

  test("betweenness: diamond splits shortest paths") {
    // 1-2-4, 1-3-4: pair (1,4) splits 1/2+1/2 over {2,3} per direction;
    // pair (2,3) splits 1/2+1/2 over {1,4} per direction — all four 1e6
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val adj = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val r = Graph.betweenness(nodes, adj, 5)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L, 4L -> 1000000L))
  }

  test("holtLinear: constant series converges to level, zero trend") {
    val df = (1 to 6).map(i => ("k", i.toLong, i.toLong, 500L))
      .toDF("key", "t", "tie", "cents")
    val r = TimeSeries.holtLinear(df, "key", "t", "tie", "cents", 6)
      .as[(String, Long, Long, Long)].head()
    assert(r === (("k", 500L, 0L, 500L)))
  }

  test("holtLinear: pure linear trend is tracked exactly") {
    // x_t = 100*t: l_t = 100t, b_t = 100 is a fixed point of the recursion
    val df = (1 to 6).map(i => ("k", i.toLong, i.toLong, 100L * i))
      .toDF("key", "t", "tie", "cents")
    val r = TimeSeries.holtLinear(df, "key", "t", "tie", "cents", 6)
      .as[(String, Long, Long, Long)].head()
    assert(r === (("k", 600L, 100L, 700L)))
  }

  test("holtLinear: short keys are dropped") {
    val df = (1 to 4).map(i => ("short", i.toLong, i.toLong, 10L))
      .toDF("key", "t", "tie", "cents")
    assert(TimeSeries.holtLinear(df, "key", "t", "tie", "cents", 6).isEmpty)
  }

  test("zipfSlope: power law f = C/rank recovers slope near -1") {
    // freq(rank r) = 840/r exactly for r = 1..8; the 5-bit log mantissa
    // bounds the fit error well inside 5%
    val docs = (1 to 8).flatMap { r => Seq.fill(840 / r)(f"w$r%02d") }
    val df = Seq(docs.mkString(" ")).toDF("text")
    val r = TextAnalysis.zipfSlope(df, 8)
      .as[(Long, Double)].head()
    assert(r._1 === 8L)
    assert(math.abs(r._2 + 1.0) < 0.05, s"slope ${r._2}")
  }

  test("mmr: ties break toward the smaller id") {
    val cands = Seq((7L, 10L), (4L, 10L)).toDF("id", "rel")
    val sims = Seq((7L, 4L, 0L), (4L, 7L, 0L)).toDF("a", "b", "sim")
    val r = Diversify.mmr(cands, sims, 2)
      .orderBy("pick").select("id").as[Long].collect()
    assert(r === Array(4L, 7L))
  }
}
