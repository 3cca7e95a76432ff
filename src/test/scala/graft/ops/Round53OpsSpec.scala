package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class Round53OpsSpec extends SparkSpec {
  import spark.implicits._

  test("fellegiSunter: perfectly discriminating field earns a large positive weight") {
    // f1 agrees on ALL matches and NO non-matches; f2/f3 carry no signal
    // (always true). 4 matches, 4 non-matches.
    val pairs = (Seq.fill(4)((true, true, true, true)) ++
      Seq.fill(4)((false, true, true, false)))
      .toDF("f1", "f2", "f3", "is_match")
    val r = FuzzyJoin.fellegiSunter(pairs).collect()
      .map(x => (x.getBoolean(0), x.getLong(5))).toMap
    // all-agree pattern: f1 term = log2(4·4 / max(0,1)·4) = log2(4) = 2
    // bits; f2/f3 terms = log2(1) = 0 → weight ≈ +4e6 (a·u=16, b·m
    // clamps to... b1=0→1: log2(16/4)=2 bits)
    assert(r(true) > 1500000L)
    assert(r(false) < -1500000L) // disagreement pattern mirrors negative
  }

  test("fellegiSunter: non-informative field weighs ~0") {
    // f2 agrees half the time for both matches and non-matches.
    val pairs = (
      Seq.fill(2)((true, true, true, true)) ++
        Seq.fill(2)((true, false, true, true)) ++
        Seq.fill(2)((false, true, true, false)) ++
        Seq.fill(2)((false, false, true, false)))
      .toDF("f1", "f2", "f3", "is_match")
    val rows = FuzzyJoin.fellegiSunter(pairs).collect()
    // two match patterns differ only in f2 — their weights must be equal
    // (f2 contributes log2(1)=0 whether it agrees or not).
    val matchW = rows.filter(_.getBoolean(0)).map(_.getLong(5)).distinct
    assert(matchW.length === 1)
  }

  test("rleCompression: constant stream compresses to one run") {
    val df = Seq.tabulate(10)(i => ("u", i.toLong, i.toLong, "a"))
      .toDF("user_id", "t_us", "event_id", "event_type")
    val Row(_, ne: Long, nr: Long, mx: Long, ratio: Long) =
      Behavior.rleCompression(df, "user_id", "t_us", "event_id", "event_type")
        .collect().head
    assert((ne, nr, mx) === ((10L, 1L, 10L)))
    assert(ratio === 100000L)
  }

  test("rleCompression: alternating stream does not compress") {
    val df = Seq.tabulate(10)(i => ("u", i.toLong, i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("user_id", "t_us", "event_id", "event_type")
    val Row(_, ne: Long, nr: Long, mx: Long, ratio: Long) =
      Behavior.rleCompression(df, "user_id", "t_us", "event_id", "event_type")
        .collect().head
    assert((ne, nr, mx) === ((10L, 10L, 1L)))
    assert(ratio === 1000000L)
  }

  test("centroidMatrix: distances are exact and nearest pairs flagged") {
    // labels at 1D positions 0, 1, 10 (constant vectors) →
    // d²(0,1)=1e12, d²(0,2)=1e13·10... nearest pair is (0,1).
    val rows = Seq(
      (1L, Seq(0.0f), 0), (2L, Seq(0.0f), 0),
      (3L, Seq(1.0f), 1), (4L, Seq(1.0f), 1),
      (5L, Seq(10.0f), 2), (6L, Seq(10.0f), 2))
    val df = rows.toDF("vec_id", "embedding", "label")
    val r = ClusterEval.centroidMatrix(df).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getBoolean(3))))
      .toMap
    assert(r((0L, 1L)) === ((1000000000000L, true)))
    assert(r((1L, 2L)) === ((81000000000000L, true))) // 9² — nearest for 2
    assert(r((0L, 2L)) === ((100000000000000L, false)))
  }
}
