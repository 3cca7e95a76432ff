package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round27OpsSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("knnClassify: clean clusters classify perfectly") {
    // label 1 near (1,0), label 2 near (0,1); folds put one of each in
    // test (ids 0 and 5).
    val rows = Seq(
      (0L, Seq(1.0f, 0.1f), 1), (5L, Seq(0.1f, 1.0f), 2),
      (1L, Seq(1.0f, 0.0f), 1), (2L, Seq(0.9f, 0.1f), 1),
      (3L, Seq(1.1f, 0.0f), 1),
      (6L, Seq(0.0f, 1.0f), 2), (7L, Seq(0.1f, 0.9f), 2),
      (8L, Seq(0.0f, 1.1f), 2))
    val r = Similarity.knnClassify(emb(rows), 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(r === Set((1L, 1L, 1L), (2L, 2L, 1L)))
  }

  test("knnClassify: majority vote with tie toward the smaller label") {
    // test id 0 equidistant from one label-1 and one label-2 trainer,
    // k = 2 → 1-1 vote tie → predict the smaller label.
    val rows = Seq(
      (0L, Seq(0.0f, 0.0f), 9),
      (1L, Seq(1.0f, 0.0f), 2), (2L, Seq(-1.0f, 0.0f), 1))
    val r = Similarity.knnClassify(emb(rows), 2)
      .as[(Long, Long, Long)].head()
    assert(r === ((9L, 1L, 1L)))
  }

  test("gnnAggregate: means over a path graph, exact e6 truncation") {
    // path 1-2-3, x = 10·id. h1(1)=20, h1(2)=(10+30)/2=20, h1(3)=20.
    // h2(v) = mean of neighbor h1 = 20 for all.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val feats = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "x")
    val r = Graph.gnnAggregate(edges, feats)
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) === ((1L, 20000000L, 20000000L)))
    assert(r(2L) === ((2L, 20000000L, 20000000L)))
    assert(r(3L) === ((1L, 20000000L, 20000000L)))
  }

  test("gnnAggregate: second hop reaches two-hop information") {
    // star: center 1 with leaves 2, 3, 4; x nonzero only at leaf 2.
    // h1(1) = 100/3 e6 = 33333333; h1(leaves) = 0.
    // h2(leaf) = h1(1) = 33333333; h2(1) = mean of leaf h1 = 0.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val feats = Seq((1L, 0L), (2L, 100L), (3L, 0L), (4L, 0L)).toDF("id", "x")
    val r = Graph.gnnAggregate(edges, feats)
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x._4).toMap
    assert(r(1L) === 0L)
    assert(r(2L) === 33333333L && r(3L) === 33333333L)
  }

  test("radiusOfGyration: stationary vehicle has rog 0, two-point spread is exact") {
    import java.sql.Timestamp
    val df = Seq(
      ("v1", new Timestamp(1000L), 1L, 10.0, 10.0),
      ("v1", new Timestamp(2000L), 2L, 10.0, 10.0),
      ("v2", new Timestamp(1000L), 3L, 10.0, 10.0),
      ("v2", new Timestamp(2000L), 4L, 10.0, 11.0))
      .toDF("vehicleId", "eventTs", "event_id", "lat", "lon")
    val r = Mobility.radiusOfGyration(df)
      .as[(String, Long, Double)].collect().map(x => x._1 -> x._3).toMap
    assert(r("v1") === 0.0)
    // v2: centroid (10, 10.5); each point 0.5° away → rog² = 0.25
    assert(math.abs(r("v2") - 0.25) < 1e-9)
  }
}
