package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round22OpsSpec extends SparkSpec {
  import spark.implicits._

  test("itemCf: always-together items score a perfect squared cosine") {
    // items 1, 2 co-occur in both baskets; 3 appears once with them.
    val b = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L))
      .toDF("b", "i")
    val r = Recsys.itemCf(b, "b", "i", 2L, 5)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> x._4).toMap
    // cos²(1,2) = 2²·1e12/(2·2) = 1e12; pair (1,3) has support 1 → cut.
    assert(r === Map((1L, 2L) -> 1000000000000L, (2L, 1L) -> 1000000000000L))
  }

  test("itemCf: top-k rank orders by cos2 then smaller partner") {
    // 1 co-occurs with 2 twice (of 2/3 baskets) and with 3 twice (of 2/2).
    val b = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (20L, 3L), (30L, 2L)).toDF("b", "i")
    val r = Recsys.itemCf(b, "b", "i", 2L, 1)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x._2).toMap
    // for item 1: cos²(1,3) = 4e12/(2·2) = 1e12 beats cos²(1,2) = 4e12/6.
    assert(r(1L) === 3L)
  }

  test("itemCf: mega-basket skew cap bounds pair fan-out deterministically") {
    // One adversarial 40-item basket. Cap 5 → only the 5 smallest item
    // ids survive, so the pair space is 5·4 (both directions), never
    // 40·39 — the bounded-fan-out guarantee under basket skew. A second
    // normal basket overlaps the kept prefix and must be unaffected.
    val mega = (1L to 40L).map(i => (99L, i))
    val small = Seq((7L, 1L), (7L, 2L))
    val b = (mega ++ small).toDF("b", "i")
    val capped = Recsys.itemCf(b, "b", "i", 1L, 50, maxBasketSize = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
    // every surviving item id is within the kept prefix
    assert(capped.forall(r => r._1 <= 5L && r._2 <= 5L))
    // pair space exactly 5·4 directed pairs
    assert(capped.map(r => (r._1, r._2)).distinct.length === 20)
    // the overlapping small basket still contributes: (1,2) has support 2
    assert(capped.find(r => r._1 == 1L && r._2 == 2L).get._3 === 2L)
    // baskets under the cap are untouched: capped run == uncapped run
    val smallOnly = small.toDF("b", "i")
    val x = Recsys.itemCf(smallOnly, "b", "i", 1L, 5, maxBasketSize = 5)
      .collect().toSet
    val y = Recsys.itemCf(smallOnly, "b", "i", 1L, 5).collect().toSet
    assert(x === y)
  }

  test("bcubed: perfect clustering scores 1e6 across the board") {
    val a = Seq((1L, 10L, 0L), (2L, 10L, 0L), (3L, 20L, 1L), (4L, 20L, 1L))
      .toDF("id", "cluster", "truth")
    val r = Stats.bcubed(a).as[(Long, Long, Long, Long)].head()
    assert(r === ((4L, 1000000L, 1000000L, 1000000L)))
  }

  test("bcubed: one merged cluster keeps recall 1, halves precision") {
    val a = Seq((1L, 10L, 0L), (2L, 10L, 0L), (3L, 10L, 1L), (4L, 10L, 1L))
      .toDF("id", "cluster", "truth")
    val r = Stats.bcubed(a).as[(Long, Long, Long, Long)].head()
    assert(r._2 === 500000L && r._3 === 1000000L)
    assert(r._4 === 666666L) // 2pr/(p+r), truncated
  }

  test("markovAttribution: a mandatory channel has removal effect 1") {
    // Every converting journey passes through "click".
    val ev = Seq(
      (1L, 1L, 101L, "click"), (1L, 2L, 102L, "purchase"),
      (2L, 1L, 201L, "click"), (2L, 2L, 202L, "purchase"),
      (3L, 1L, 301L, "view")) // non-converting view-only journey
      .toDF("user_id", "t_us", "event_id", "event_type")
    val r = Behavior.markovAttribution(ev, "user_id", "t_us", "event_id",
        "event_type", "purchase", Seq("view", "click"), 8)
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._3, x._4))).toMap
    // full chain: start→click 2/3, start→view 1/3; click→conv always.
    assert(r("click")._1 === 0L && r("click")._2 === 1000000L)
    // removing view loses nothing (view never converts)
    assert(r("view")._2 === 0L)
  }

  test("markovAttribution: journeys truncate at the first conversion") {
    // Post-purchase events must not create transitions: without
    // truncation, click→view would exist and view would matter.
    val ev = Seq(
      (1L, 1L, 1L, "click"), (1L, 2L, 2L, "purchase"),
      (1L, 3L, 3L, "view"), (1L, 4L, 4L, "purchase"))
      .toDF("user_id", "t_us", "event_id", "event_type")
    val r = Behavior.markovAttribution(ev, "user_id", "t_us", "event_id",
        "event_type", "purchase", Seq("view", "click"), 8)
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> x._4).toMap
    assert(r("click") === 1000000L)
    assert(r("view") === 0L)
  }

  test("markovAttribution: direct start->conv survives channel removal") {
    // user 1 converts with no touches at all; user 2 needs click.
    val ev = Seq(
      (1L, 1L, 1L, "purchase"),
      (2L, 1L, 2L, "click"), (2L, 2L, 3L, "purchase"))
      .toDF("user_id", "t_us", "event_id", "event_type")
    val r = Behavior.markovAttribution(ev, "user_id", "t_us", "event_id",
        "event_type", "purchase", Seq("view", "click"), 8)
      .as[(String, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    // full: start→conv 1/2, start→click 1/2 → P = 1e6.
    assert(r("click")._1 === 1000000L)
    // removing click keeps the direct half: P = 500000.
    assert(r("click")._2 === 500000L)
  }
}
