package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round21OpsSpec extends SparkSpec {
  import spark.implicits._

  test("noveltyScore: first doc is fully novel, a copy scores zero") {
    val docs = Seq(
      (1L, "a b c d"), // shingles: "a b c", "b c d" — all novel
      (2L, "a b c d"), // exact copy → novelty 0
      (3L, "x y z")) // fresh → novelty 1e6
      .toDF("doc_id", "text")
    val r = TextAnalysis.noveltyScore(docs, 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) === ((2L, 2L, 1000000L)))
    assert(r(2L) === ((2L, 0L, 0L)))
    assert(r(3L) === ((1L, 1L, 1000000L)))
  }

  test("noveltyScore: partial overlap is fractional; short docs drop") {
    val docs = Seq(
      (1L, "a b c d"), // "a b c", "b c d"
      (2L, "b c d e"), // "b c d" seen, "c d e" novel → 1/2
      (3L, "a b")) // under 3 tokens: emits nothing
      .toDF("doc_id", "text")
    val r = TextAnalysis.noveltyScore(docs, 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x._4).toMap
    assert(r(2L) === 500000L)
    assert(!r.contains(3L))
  }

  test("deepwalkVisits: every hop follows a real edge, walks stay valid") {
    // 4-cycle: 1-2-3-4-1.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val walks = Graph.deepwalkVisits(edges, 5)
      .as[(Long, Long, Long)].collect()
    assert(walks.length === 4 * 5) // every start survives every step
    val adj = Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).flatMap {
      case (x, y) => Seq((x, y), (y, x))
    }
    val byStart = walks.groupBy(_._1)
    byStart.foreach { case (start, hops) =>
      val path = start +: hops.sortBy(_._2).map(_._3).toSeq
      path.sliding(2).foreach {
        case Seq(x, y) => assert(adj.contains((x, y)), s"bad hop $x->$y")
        case _ => ()
      }
    }
  }

  test("deepwalkVisits: choices are deterministic across runs") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("a", "b")
    val r1 = Graph.deepwalkVisits(edges, 4)
      .as[(Long, Long, Long)].collect().toSet
    val r2 = Graph.deepwalkVisits(edges, 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(r1 === r2 && r1.size === 16)
  }

  test("modularity: two clean components score high, one blob scores zero") {
    // Two triangles, no inter-edges.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a", "b")
    val byComp = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L),
      (6L, 20L)).toDF("id", "label")
    val good = Graph.modularity(edges, byComp)
      .as[(Long, Long, Long)].head()
    // perfect 2-way split of two equal components: Q = 1/2
    assert(good === ((2L, 6L, 500000L)))
    val oneBlob = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("id", "label")
    val blob = Graph.modularity(edges, oneBlob)
      .as[(Long, Long, Long)].head()
    assert(blob._1 === 1L && blob._3 === 0L) // all-in-one: Q = 0 exactly
  }

  test("modularity: anti-community assignment goes negative") {
    // Split each triangle across the two labels → worse than chance.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("a", "b")
    val bad = Seq((1L, 10L), (2L, 20L), (3L, 10L), (4L, 20L), (5L, 10L),
      (6L, 20L)).toDF("id", "label")
    val r = Graph.modularity(edges, bad).as[(Long, Long, Long)].head()
    assert(r._3 < 0L)
  }
}
