package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round20OpsSpec extends SparkSpec {
  import spark.implicits._

  test("welchT: textbook unequal-variance example") {
    // s0 = {10, 20, 30}: mean 20, var 100. s1 = {40, 50}: mean 45,
    // var 50. se2 = 100/3 + 50/2 = 58.333..., t = -25/sqrt(58.333) =
    // -3.273268. df = se2^2/((100/3)^2/2 + 25^2/1) = 3402.77/1180.55
    // = 2.882353.
    val df = Seq((0L, 10L), (0L, 20L), (0L, 30L), (1L, 40L), (1L, 50L))
      .toDF("s", "v")
    val r = Stats.welchT(df, "s", "v")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(r._1 === 3L && r._2 === 2L)
    assert(r._3 === 20000000L && r._4 === 45000000L)
    assert(math.abs(r._5.get - (-3.273268)) < 1e-6)
    assert(math.abs(r._6.get - 2.882353) < 1e-6)
  }

  test("welchT: zero variance in both samples yields NULL t") {
    val df = Seq((0L, 5L), (0L, 5L), (1L, 9L), (1L, 9L)).toDF("s", "v")
    val r = Stats.welchT(df, "s", "v")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(r._5.isEmpty && r._6.isEmpty)
    assert(r._3 === 5000000L && r._4 === 9000000L)
  }

  test("vocabGrowth: repeated-vocabulary corpus has beta 0") {
    // Every doc repeats the same two words: V is constant at 2 after
    // doc 1... but log V changes only if V changes — V = 2 always →
    // y constant → slope 0.
    val docs = Seq((1L, "s", "a b"), (2L, "s", "a b"), (3L, "s", "b a a"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.vocabGrowth(docs)
      .as[(String, Long, Option[Double])].head()
    assert(r._1 === "s" && r._2 === 3L)
    assert(r._3.contains(0.0))
  }

  test("vocabGrowth: all-new-words corpus has beta 1") {
    // Each doc introduces only fresh words → V = N at every point →
    // y = x → slope exactly 1.
    val docs = Seq((1L, "s", "a b"), (2L, "s", "c d e"), (3L, "s", "f"))
      .toDF("doc_id", "source", "text")
    val r = TextAnalysis.vocabGrowth(docs)
      .as[(String, Long, Option[Double])].head()
    assert(r._3.contains(1.0))
  }

  test("vocabGrowth: sources are independent") {
    val docs = Seq((1L, "p", "a b"), (2L, "q", "a b"), (3L, "p", "a b"),
      (4L, "q", "c d")).toDF("doc_id", "source", "text")
    val r = TextAnalysis.vocabGrowth(docs)
      .as[(String, Long, Option[Double])].collect()
      .map(x => x._1 -> x._3).toMap
    assert(r("p").contains(0.0)) // no new vocab in doc 3
    assert(r("q").contains(1.0)) // all-new vocab
  }

  test("skipgramPmi: adjacent-only pair tops a window-2 corpus") {
    // "x y" always adjacent and exclusive; fillers share contexts.
    val docs = (1L to 6L).map(i => (i, "x y " + ("f g h " * 3).trim))
      .toDF("doc_id", "text")
    val r = TextAnalysis.skipgramPmi(docs, 2, 5L, 5)
      .as[(String, String, Long, Long)].collect()
    assert(r.nonEmpty)
    val top = r.head
    assert(top._1 === "x" && top._2 === "y" && top._3 === 6L)
    // x-y co-occurs every time; PMI must be positive (above chance)
    assert(top._4 > 0L)
  }

  test("skipgramPmi: window 1 excludes distance-2 pairs") {
    val docs = (1L to 5L).map(i => (i, "a q b")).toDF("doc_id", "text")
    val w1 = TextAnalysis.skipgramPmi(docs, 1, 5L, 10)
      .as[(String, String, Long, Long)].collect().map(x => (x._1, x._2)).toSet
    assert(w1 === Set(("a", "q"), ("b", "q")))
    val w2 = TextAnalysis.skipgramPmi(docs, 2, 5L, 10)
      .as[(String, String, Long, Long)].collect().map(x => (x._1, x._2)).toSet
    assert(w2 === Set(("a", "q"), ("b", "q"), ("a", "b")))
  }
}
