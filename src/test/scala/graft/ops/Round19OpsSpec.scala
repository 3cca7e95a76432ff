package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round19OpsSpec extends SparkSpec {
  import spark.implicits._

  test("decisionStump: perfectly separable split is found") {
    // f ≤ 2 → t = 10; f ≥ 3 → t = 100. Best split at f = 2.
    val df = Seq((10L, 1L), (10L, 2L), (100L, 3L), (100L, 4L))
      .toDF("t", "f")
    val r = Stats.decisionStump(df, "t", "f")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r._1 === 2L && r._2 === 2L && r._3 === 2L)
    assert(r._5 === 10000000L && r._6 === 100000000L)
  }

  test("decisionStump: constant target ties break to the smallest threshold") {
    val df = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("t", "f")
    val r = Stats.decisionStump(df, "t", "f")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(r._1 === 1L) // all gains equal → smallest split wins
    assert(r._5 === 5000000L && r._6 === 5000000L)
  }

  test("isotonicFit: already-monotone means are unchanged") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("b", "v")
    val r = Stats.isotonicFit(df, "b", "v")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._4).toSeq === Seq(10000000L, 20000000L, 30000000L))
    assert(r.map(x => x._3 == x._4).forall(identity))
  }

  test("isotonicFit: a violator pools with its neighbor (PAVA)") {
    // means 10, 30, 20 → PAVA pools buckets 2, 3 to 25.
    val df = Seq((1L, 10L), (2L, 30L), (3L, 20L)).toDF("b", "v")
    val r = Stats.isotonicFit(df, "b", "v")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._4).toSeq === Seq(10000000L, 25000000L, 25000000L))
  }

  test("isotonicFit: weights (bucket counts) pool correctly") {
    // bucket 1: {40}, bucket 2: {10, 10} → pooled mean (40+20)/3 = 20.
    val df = Seq((1L, 40L), (2L, 10L), (2L, 10L)).toDF("b", "v")
    val r = Stats.isotonicFit(df, "b", "v")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._4).toSeq === Seq(20000000L, 20000000L))
    assert(r.map(_._2).toSeq === Seq(1L, 2L))
  }

  test("sortedNeighborPairs: only rank-adjacent pairs emit, exact jaccard") {
    // Keys sort by (lang, n_chars, doc_id): ids 1, 2, 3 adjacent; 1-2
    // share all tokens, 3 shares none.
    val docs = Seq(
      (1L, "en", 10L, "a b c"),
      (2L, "en", 11L, "a b c"),
      (3L, "en", 12L, "x y z"),
      (4L, "fr", 10L, "a b c")).toDF("doc_id", "lang", "n_chars", "text")
    val r = Dedup.sortedNeighborPairs(docs, 1, 500000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r === Set((1L, 2L, 1L, 1000000L)))
  }

  test("sortedNeighborPairs: window w reaches past immediate neighbors") {
    val docs = Seq(
      (1L, "en", 10L, "a b"),
      (2L, "en", 11L, "q r"),
      (3L, "en", 12L, "a b")).toDF("doc_id", "lang", "n_chars", "text")
    val r2 = Dedup.sortedNeighborPairs(docs, 2, 900000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r2 === Set((1L, 3L, 2L, 1000000L)))
    val r1 = Dedup.sortedNeighborPairs(docs, 1, 900000L).count()
    assert(r1 === 0L)
  }

  test("containmentPrefixJoin: subset doc emits its direction only") {
    // A = {a, b} ⊂ B = {a, b, c, d}: C(A→B) = 1, C(B→A) = 0.5 < 0.8.
    val docs = Seq((1L, "a b"), (2L, "a b c d")).toDF("doc_id", "text")
    val r = Dedup.containmentPrefixJoin(docs, 800000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r === Set((1L, 2L, 2L, 2L)))
  }

  test("containmentPrefixJoin: prefix filter is lossless vs brute force") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e f g"), (3L, "c d e f"),
      (4L, "x y"), (5L, "x y z w"), (6L, "p q r")).toDF("doc_id", "text")
    val got = Dedup.containmentPrefixJoin(docs, 600000L)
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute force in Scala
    val toks = Map(1L -> "a b c d e", 2L -> "a b c d e f g", 3L -> "c d e f",
      4L -> "x y", 5L -> "x y z w", 6L -> "p q r")
      .map { case (k, v) => k -> v.split(" ").toSet }
    val want = (for {
      a <- toks.keys; b <- toks.keys if a != b
      inter = (toks(a) & toks(b)).size
      if inter * 1000000L >= 600000L * toks(a).size
    } yield (a, b, inter.toLong, toks(a).size.toLong)).toSet
    assert(got === want && want.nonEmpty)
  }
}
