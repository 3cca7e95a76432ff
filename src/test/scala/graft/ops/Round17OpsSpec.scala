package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  test("spearmanByKey: perfect monotone up / down") {
    val df = (1 to 8).map(i => ("up", i.toLong, i.toLong * 10)) ++
      (1 to 8).map(i => ("dn", i.toLong, -i.toLong * 10))
    val r = Stats.spearmanByKey(df.toDF("k", "x", "y"), "k", "x", "y")
      .as[(String, Long, Option[Double])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r("up") === ((8L, Some(1.0))))
    assert(r("dn") === ((8L, Some(-1.0))))
  }

  test("spearmanByKey: midrank ties match the textbook value") {
    // x = 1,2,3,4; y = 10,10,20,30 → doubled ranks x: 2,4,6,8; y: 3,3,6,8
    // rho = 72 / sqrt(80 * 72) = 0.948683 (midrank Pearson convention)
    val df = Seq(("k", 1L, 10L), ("k", 2L, 10L), ("k", 3L, 20L), ("k", 4L, 30L))
    val r = Stats.spearmanByKey(df.toDF("k", "x", "y"), "k", "x", "y")
      .as[(String, Long, Option[Double])].head()
    assert(r._2 === 4L)
    assert(math.abs(r._3.get - 0.948683) < 1e-6)
  }

  test("spearmanByKey: zero variance yields NULL") {
    val df = Seq(("k", 1L, 5L), ("k", 2L, 5L), ("k", 3L, 5L))
    val r = Stats.spearmanByKey(df.toDF("k", "x", "y"), "k", "x", "y")
      .as[(String, Long, Option[Double])].head()
    assert(r._3.isEmpty)
  }

  test("anovaF: identical groups give F = 0") {
    val df = Seq(("a", 10L), ("a", 20L), ("b", 10L), ("b", 20L))
    val r = Stats.anovaF(df.toDF("k", "x"), "k", "x")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(r === ((2L, 4L, 0L, 100L, Some(0.0))))
  }

  test("anovaF: textbook two-group example") {
    // a = {1,2,3}, b = {5,6,7}: ssb = 24, ssw = 4, F = 24*4/(4*1) = 24
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 5L), ("b", 6L), ("b", 7L))
    val r = Stats.anovaF(df.toDF("k", "x"), "k", "x")
      .as[(Long, Long, Long, Long, Option[Double])].head()
    assert(r === ((2L, 6L, 24L, 4L, Some(24.0))))
  }

  test("dagLongestPath: diamond takes the heavier arm") {
    // 1→2 (w1), 2→4 (w1), 1→3 (w5), 3→4 (w1): dist(4) = 6 via 3
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L, 1L), (2L, 4L, 1L), (1L, 3L, 5L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.dagLongestPath(nodes, e, 10)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 5L, 4L -> 6L))
  }

  test("dagLongestPath: maxDepth truncates relaxation rounds") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L)).toDF("src", "dst", "w")
    val r = Graph.dagLongestPath(nodes, e, 2)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("ohlc: open/close follow (t, tie) order, not value order") {
    val df = Seq(
      ("k", 10L, 1L, 500L), ("k", 10L, 2L, 100L), // same t: tie breaks
      ("k", 30L, 3L, 900L), ("k", 25L, 4L, 50L),
      ("k", 110L, 5L, 777L)) // second bucket (width 100)
      .toDF("key", "t", "tie", "cents")
    val r = TimeSeries.ohlc(df, "key", "t", "tie", "cents", 100L)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._2 -> x).toMap
    assert(r(0L) === (("k", 0L, 500L, 900L, 50L, 900L, 4L)))
    assert(r(1L) === (("k", 1L, 777L, 777L, 777L, 777L, 1L)))
  }

  test("denseCellClusters: two blobs, one diagonal bridge, one noise") {
    // blob A: cells (0,0),(0,1),(1,1) dense; blob B: (5,5) dense;
    // noise: many singleton cells keep the 2x-mean threshold at 2
    val blobA = Seq.fill(4)((0L, 0L)) ++ Seq.fill(3)((0L, 1L)) ++
      Seq.fill(3)((1L, 1L))
    val blobB = Seq.fill(4)((5L, 5L))
    val noise = (10 to 29).map(i => (i.toLong, 40L))
    val df = (blobA ++ blobB ++ noise).toDF("cx", "cy")
    val r = GridCluster.denseCellClusters(df, "cx", "cy")
      .as[(Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    // threshold = 2*34 div 24 = 2 -> noise cells excluded (n = 1)
    assert(r === Map(0L -> ((3L, 10L)), 5005L -> ((1L, 4L))))
  }
}
