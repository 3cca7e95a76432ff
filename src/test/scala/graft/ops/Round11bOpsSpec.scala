package graft.ops

import graft.SparkSpec

class Round11bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("aucRank: perfect separation 1.0, anti-separation 0, all-ties 0.5") {
    val perfect = Seq((1L, false), (2L, true), (3L, true)).toDF("s", "y")
    assert(Ranking.aucRank(perfect, "s", "y")
      .as[(Long, Long, Option[Long])].head() === ((2L, 1L, Some(1000000L))))
    val anti = Seq((1L, true), (2L, false)).toDF("s", "y")
    assert(Ranking.aucRank(anti, "s", "y")
      .as[(Long, Long, Option[Long])].head() === ((1L, 1L, Some(0L))))
    val ties = Seq((5L, true), (5L, false)).toDF("s", "y")
    assert(Ranking.aucRank(ties, "s", "y")
      .as[(Long, Long, Option[Long])].head() === ((1L, 1L, Some(500000L))))
  }

  test("aucRank: single-class input yields NULL auc") {
    val onlyPos = Seq((1L, true), (2L, true)).toDF("s", "y")
    assert(Ranking.aucRank(onlyPos, "s", "y")
      .as[(Long, Long, Option[Long])].head() === ((2L, 0L, None)))
  }

  test("attribution: first/last touch inside the lookback window only") {
    val ev = Seq(
      // u1: view@100 outside the 150-window of purchase@300; click@200 in
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 300L, "purchase"),
      // u2: purchase with no touches at all
      (2L, 50L, "purchase"),
      // u3: view then error, both inside -> first=view, last=error
      (3L, 10L, "view"), (3L, 20L, "error"), (3L, 30L, "purchase")
    ).toDF("u", "t", "et")
    val got = Behavior.attribution(ev, "u", "t", "et", "purchase",
        Seq("view", "click", "signup", "error"), 150L)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("click", "click", 1L), ("(none)", "(none)", 1L),
      ("view", "error", 1L)))
  }

  test("attribution: conversion events never count as touches") {
    val ev = Seq((1L, 10L, "purchase"), (1L, 20L, "purchase"))
      .toDF("u", "t", "et")
    val got = Behavior.attribution(ev, "u", "t", "et", "purchase",
        Seq("view", "click"), 100L)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(("(none)", "(none)", 2L)))
  }

  test("dayGaps: gap runs and longest dark stretch per entity") {
    val day = 86400000000L
    val ev = Seq(0L, 1L, 5L, 6L, 9L).map(d => (1L, d * day + 42L)) ++
      Seq((2L, 3L * day))
    val got = Behavior.dayGaps(ev.toDF("u", "t"), "u", "t")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 0L, 9L, 5L, 2L, 3L), (2L, 3L, 3L, 1L, 0L, 0L)))
  }

  test("piiDensity: per-source hit counts and per-Mtoken rate") {
    val docs = Seq(
      (1L, "src1", "call 555-1234"), (2L, "src1", "hello world"),
      (3L, "src2", "a@b.com x")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.piiDensity(docs, "source")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(("src1", 2L, 1L, 1L, 250000L),
      ("src2", 1L, 1L, 1L, 500000L)))
  }
}
