package graft.ops

import graft.SparkSpec

class Round37OpsSpec extends SparkSpec {
  import spark.implicits._

  // ── IntervalJoin.peakConcurrency ─────────────────────────────────────

  test("peakConcurrency: overlap counting with half-open intervals") {
    // [0,10) [5,15) overlap → peak 2; [15,20) starts exactly at an end →
    // never 3 (end's −1 applies first at t=15).
    val iv = Seq(("k", 0L, 10L), ("k", 5L, 15L), ("k", 15L, 20L))
      .toDF("key", "s", "e")
    val got = IntervalJoin.peakConcurrency(iv, "key", "s", "e")
      .as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("k", 3L, 2L)))
  }

  test("peakConcurrency: fully nested intervals stack") {
    val iv = Seq(("k", 0L, 100L), ("k", 10L, 90L), ("k", 20L, 80L))
      .toDF("key", "s", "e")
    val got = IntervalJoin.peakConcurrency(iv, "key", "s", "e")
      .as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("k", 3L, 3L)))
  }

  test("peakConcurrency: keys sweep independently") {
    val iv = Seq(("a", 0L, 10L), ("a", 1L, 9L), ("b", 0L, 10L))
      .toDF("key", "s", "e")
    val got = IntervalJoin.peakConcurrency(iv, "key", "s", "e")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") === ("a", 2L, 2L))
    assert(got("b") === ("b", 1L, 1L))
  }

  // ── Dedup.normalizedStats ────────────────────────────────────────────

  test("normalizedStats: formatting-only dups counted separately") {
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), // format-only pair
      (3L, "same text"), (4L, "same text"),       // byte-identical pair
      (5L, "unique")
    ).toDF("doc_id", "text")
    val got = Dedup.normalizedStats(docs)
      .as[(Long, Long, Long, Long, Long)].head()
    // 5 docs, 3 groups; 2 dup groups; 1 format-only; 4 docs in dup groups.
    assert(got === ((5L, 3L, 2L, 1L, 4L)))
  }

  test("normalizedStats: mixed group (raw dup + format variant) is not format-only") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "A B!"))
      .toDF("doc_id", "text")
    val got = Dedup.normalizedStats(docs)
      .as[(Long, Long, Long, Long, Long)].head()
    // One group of 3 with 2 raw variants: dup group but NOT format-only.
    assert(got === ((3L, 1L, 1L, 0L, 3L)))
  }
}
