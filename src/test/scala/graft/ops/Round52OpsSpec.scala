package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class Round52OpsSpec extends SparkSpec {
  import spark.implicits._

  test("salsa: single component reduces to in-degree share") {
    // hubs 1,2 both cite auths 10,20 → one component, din 2 each →
    // scores 1/2 each.
    val e = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L)).toDF("hub", "auth")
    val r = Graph.salsa(e).collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r === Map(10L -> 500000000L, 20L -> 500000000L))
  }

  test("salsa: component weighting splits mass by component size") {
    // comp A: hub 1 → auths 10, 20 (|A_c|=2); comp B: hub 2 → auth 30
    // (|A_c|=1). π(10)=π(20)=(2/3)·(1/2)=1/3; π(30)=1/3.
    val e = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("hub", "auth")
    val r = Graph.salsa(e).collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(10L) === 333333333L)
    assert(r(20L) === 333333333L)
    assert(r(30L) === 333333333L)
  }

  test("richClub: a clique among hubs scores density 1") {
    // star edges give leaves degree 1; the 3 hub nodes form a triangle
    // (degree 4 each) → at k=2 only hubs survive, fully connected.
    val hubs = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val leaves = (0L until 6L).map(i => (100L + i % 3, 200L + i))
    val e = (hubs ++ leaves).toDF("a", "b")
    val r = Graph.richClub(e, Seq(1, 2)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(2L) === ((3L, 3L, 1000000L))) // the hub triangle
    assert(r(1L)._1 === 3L) // leaves (deg 1) excluded already at k=1
  }

  test("transitivity: a triangle is 1e6, a path is 0") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val Row(t1: Long, w1: Long, c1: Long) =
      Graph.transitivity(tri).collect().head
    assert((t1, w1, c1) === ((1L, 3L, 1000000L)))

    val path = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val Row(t2: Long, _, c2: Long) = Graph.transitivity(path).collect().head
    assert((t2, c2) === ((0L, 0L)))
  }

  test("pathDrift: identical days drift 0, a changed day scores its edit distance") {
    // user u: day0 path a>b, day1 path a>b (dist 0), day2 path a>c
    // (dist 1 — 'b'→'c'). Single-day user v drops.
    val us = 86400000000L
    val rows = Seq(
      ("u", 0L * us + 1, 1L, "a"), ("u", 0L * us + 2, 2L, "b"),
      ("u", 1L * us + 1, 3L, "a"), ("u", 1L * us + 2, 4L, "b"),
      ("u", 2L * us + 1, 5L, "a"), ("u", 2L * us + 2, 6L, "c"),
      ("v", 0L * us + 1, 7L, "a"))
    val df = rows.toDF("user_id", "t_us", "event_id", "event_type")
    val r = Behavior.pathDrift(df, "user_id", "t_us", "event_id", "event_type")
      .collect()
    assert(r.length === 1)
    val Row(u: String, nd: Long, nt: Long, tot: Long, drift: Long) = r.head
    assert(u === "u")
    assert((nd, nt, tot) === ((3L, 2L, 1L)))
    assert(drift === 500L) // (0 + 1)·1000 / 2
  }
}
