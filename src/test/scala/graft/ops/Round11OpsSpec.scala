package graft.ops

import graft.SparkSpec
import graft.geo.Geofence
import org.apache.spark.sql.functions._

class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("hits: one round on a 3-node chain matches hand computation") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 3L)).toDF("src", "dst")
    // a1 raw: 2 <- h(1)+h(3) = 2e6, 3 <- h(2) = 1e6; max 2e6
    //   -> auth: 2 = 1e6, 3 = 500000
    // h1 raw: 1 = a(2) = 1e6, 3 = a(2) = 1e6, 2 = a(3) = 500000; max 1e6
    //   -> hub: 1 = 1e6, 3 = 1e6, 2 = 500000
    val got = Graph.hits(nodes, edges, 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1000000L, 0L), (2L, 500000L, 1000000L),
      (3L, 1000000L, 500000L)))
  }

  test("hits: node with no in-edges has authority 0, no out-edges hub 0") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val byId = Graph.hits(nodes, edges, 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byId(1L) === ((1000000L, 0L)))
    assert(byId(2L) === ((0L, 1000000L)))
  }

  test("adamicAdar: wedge pivot weight is 1e12 div log2E6(deg)") {
    // star: 2 is the pivot with degree 3 -> three non-adjacent pairs,
    // each scored 1e12 div log2E6(3) = 1e12 div 1584963 = 630929
    val edges = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("a", "b")
    val got = Graph.adamicAdar(edges, 1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 1L, 630929L), (1L, 4L, 1L, 630929L),
      (3L, 4L, 1L, 630929L)))
  }

  test("adamicAdar: degree-2 pivot contributes exactly 1e6") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Graph.adamicAdar(edges, 1L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 1L, 1000000L)))
  }

  test("bigramNll: add-one smoothed NLL matches hand computation") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    // pairs: d1 (a,b)(b,a)(a,b), d2 (a,b); c12(a,b)=3, c12(b,a)=1;
    // c1(a)=3, c1(b)=1; V={a,b,x}=3
    // nll(a,b) = log2E6(6) - log2E6(4) = 2584963 - 2000000 = 584963
    // nll(b,a) = log2E6(4) - log2E6(2) = 1000000
    // d1: (584963*2 + 1000000) div 3 = 723308; d2: 584963; d3: absent
    val got = TextAnalysis.bigramNll(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 723308L), (2L, 1L, 584963L)))
  }

  test("autocorr: perfect linear sequence gives 1.0, constant gives null") {
    val df = Seq(
      ("up", 1L, 1L, 100L), ("up", 2L, 2L, 200L),
      ("up", 3L, 3L, 300L), ("up", 4L, 4L, 400L),
      ("flat", 1L, 1L, 5L), ("flat", 2L, 2L, 5L), ("flat", 3L, 3L, 5L)
    ).toDF("k", "t", "tie", "c")
    val byKey = TimeSeries.autocorr(df, "k", "t", "tie", "c")
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byKey("up") === ((3L, Some(1.0))))
    assert(byKey("flat") === ((2L, None)))
  }

  test("autocorr: alternating sequence is perfectly anti-correlated") {
    val df = Seq(("z", 1L, 1L, 10L), ("z", 2L, 2L, -10L),
      ("z", 3L, 3L, 10L), ("z", 4L, 4L, -10L)).toDF("k", "t", "tie", "c")
    val got = TimeSeries.autocorr(df, "k", "t", "tie", "c")
      .as[(String, Long, Option[Double])].collect().head
    assert(got === (("z", 3L, Some(-1.0))))
  }

  test("insideConvex: interior, boundary, exterior of a CCW square") {
    val sq = Seq((10L, 0L), (0L, 10L), (-10L, 0L), (0L, -10L))
    val df = Seq((0L, 0L), (5L, 5L), (11L, 0L), (-10L, 0L), (6L, 5L))
      .toDF("x", "y")
    val got = df.withColumn("in", Geofence.insideConvex(col("x"), col("y"), sq))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((0L, 0L, true), (5L, 5L, true), (11L, 0L, false),
      (-10L, 0L, true), (6L, 5L, false)))
  }

  test("insideConvex rejects clockwise or degenerate vertex order") {
    val cw = Seq((10L, 0L), (0L, -10L), (-10L, 0L), (0L, 10L))
    intercept[IllegalArgumentException] {
      Geofence.insideConvex(lit(0L), lit(0L), cw)
    }
    intercept[IllegalArgumentException] {
      Geofence.insideConvex(lit(0L), lit(0L), Seq((0L, 0L), (1L, 1L)))
    }
  }

  test("temperatureTargets: sqrt-weights flatten the mixture") {
    val df = (Seq.fill(16)("a") ++ Seq.fill(4)("b") ++ Seq.fill(1)("c"))
      .toDF("cls")
    // N=21, w = 4/2/1, sw = 7 -> targets 12/6/3; p capped at 1e6
    val got = Sampling.temperatureTargets(df, "cls")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 16L, 4L, 12L, 750000L),
      ("b", 4L, 2L, 6L, 1000000L),
      ("c", 1L, 1L, 3L, 1000000L)))
  }

  test("weightedMedian: weight mass, not row count, picks the value") {
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 10L),
      ("h", 1L, 5L), ("h", 2L, 5L)).toDF("k", "v", "w")
    // g: tw=12, first v with 2*cum >= 12 is 3; h: tie -> lower median 1
    val got = Quantiles.weightedMedian(df, "k", "v", "w")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("g", 3L, 12L), ("h", 1L, 10L)))
  }

  test("weightedMedian: duplicate values merge their weights first") {
    val df = Seq(("g", 5L, 1L), ("g", 5L, 1L), ("g", 1L, 1L)).toDF("k", "v", "w")
    // merged: (1,w1),(5,w2); tw=3 -> first 2*cum>=3 at v=5
    val got = Quantiles.weightedMedian(df, "k", "v", "w")
      .as[(String, Long, Long)].collect().head
    assert(got === (("g", 5L, 3L)))
  }
}
