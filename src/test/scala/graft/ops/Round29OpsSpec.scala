package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round29OpsSpec extends SparkSpec {
  import spark.implicits._

  // ── Graph.harmonic ───────────────────────────────────────────────────

  test("harmonic: path graph sums 1e6/d over reached nodes") {
    // 1→2→3 path (directed), seed 1: d(2)=1, d(3)=2.
    val nodes = Seq((1L, true), (2L, false), (3L, false)).toDF("id", "is_seed")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.harmonic(nodes, edges, "is_seed", 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 1500000L)))
  }

  test("harmonic: unreachable nodes contribute nothing (no poisoning)") {
    // Disconnected 3: harmonic just omits it — contrast closeness.
    val nodes = Seq((1L, true), (2L, false), (3L, false)).toDF("id", "is_seed")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.harmonic(nodes, edges, "is_seed", 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 1000000L)))
  }

  // ── Graph.neighborJaccard ────────────────────────────────────────────

  test("neighborJaccard: triangle with pendant") {
    // Triangle 1-2-3 plus pendant 4-1.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = Graph.neighborJaccard(edges)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // (1,2): N1={2,3,4}, N2={1,3} → common {3}=1, union 3+2-1=4 → 250000.
    assert(got((1L, 2L)) === (1L, 2L, 3L, 2L, 1L, 250000L))
    // (2,3): N2={1,3}, N3={1,2} → common {1}=1, union 2+2-1=3 → 333333.
    assert(got((2L, 3L)) === (2L, 3L, 2L, 2L, 1L, 333333L))
    // (1,4): N1={2,3,4}, N4={1} → common 0, union 4 → 0.
    assert(got((1L, 4L)) === (1L, 4L, 3L, 1L, 0L, 0L))
  }

  // ── Sampling.weightedPriority ────────────────────────────────────────

  test("weightedPriority: heavy rows rank first; k bounds the output") {
    // Weight 1e12 divides the 48-bit hash to ≤ 281 — always beats the
    // unit-weight rows (hash48 is ≥ 1e9 w.h.p. for these fixed ids; the
    // assertion is deterministic for this seed set).
    val df = (1L to 20L).map(i => (i, if (i == 7L) 1000000000000L else 1L))
      .toDF("id", "w")
    val got = Sampling.weightedPriority(df, "id", "w", "spec", 5)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 5)
    assert(got.head._1 === 7L, s"heavy row should rank first: ${got.toSeq}")
    // Output ordered by (pri, id).
    assert(got.map(r => (r._3, r._1)).toSeq ===
      got.map(r => (r._3, r._1)).sortBy(identity).toSeq)
  }

  test("weightedPriority: deterministic across invocations") {
    val df = (1L to 50L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val a = Sampling.weightedPriority(df, "id", "w", "s", 8)
      .as[(Long, Long, Long)].collect().toSeq
    val b = Sampling.weightedPriority(df, "id", "w", "s", 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a === b)
  }
}
