package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class Round49OpsSpec extends SparkSpec {
  import spark.implicits._

  test("hhi: monopoly scores 1e8, four equal members score 2500²·4") {
    val df = Seq(
      ("mono", "s1", 500L), ("mono", "s1", 500L),
      ("quad", "a", 100L), ("quad", "b", 100L),
      ("quad", "c", 100L), ("quad", "d", 100L))
      .toDF("g", "m", "v")
    val r = Pareto.hhi(df, "g", "m", "v").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(3)))).toMap
    assert(r("mono") === ((1L, 100000000L))) // 10000² — full concentration
    assert(r("quad") === ((4L, 25000000L))) // 4 × 2500²
  }

  test("prAuc: perfect ranking hits 1e6, inverted ranking is heavily penalized") {
    val perfect = Seq((10L, true), (9L, true), (2L, false), (1L, false))
      .toDF("s", "y")
    val Row(np: Long, nn: Long, ap: Long) =
      Ranking.prAuc(perfect, "s", "y").collect().head
    assert((np, nn) === ((2L, 2L)))
    assert(ap === 1000000L)

    val inverted = Seq((10L, false), (9L, false), (2L, true), (1L, true))
      .toDF("s", "y")
    val apInv = Ranking.prAuc(inverted, "s", "y").collect().head.getLong(2)
    // positives at ranks 3,4: P = 1/3 and 2/4 → AP = (333333+500000)/2
    assert(apInv === 416666L)
  }

  test("prAuc: tied scores share the block precision") {
    // one score value holding 1 positive + 1 negative: prec = 1/2
    val df = Seq((5L, true), (5L, false)).toDF("s", "y")
    assert(Ranking.prAuc(df, "s", "y").collect().head.getLong(2) === 500000L)
  }

  test("cohensKappa: perfect agreement is 1e6, independence is ~0") {
    val same = Seq.tabulate(30)(i => (s"c${i % 3}", s"c${i % 3}")).toDF("a", "b")
    val Row(_, po: Long, _, k: Long) =
      Stats.cohensKappa(same, "a", "b").collect().head
    assert(po === 1000000L)
    assert(k === 1000000L)

    // balanced 2×2 independence: po = 1/2, pe = 1/2 → κ = 0
    val ind = Seq.tabulate(40)(i => (s"c${i % 2}", s"c${(i / 2) % 2}"))
      .toDF("a", "b")
    val kInd = Stats.cohensKappa(ind, "a", "b").collect().head.getLong(3)
    assert(math.abs(kInd) < 5000L)
  }

  test("cohensKappa: systematic disagreement goes negative") {
    val anti = Seq.tabulate(20)(i => (s"c${i % 2}", s"c${(i + 1) % 2}"))
      .toDF("a", "b")
    val Row(_, po: Long, pe: Long, k: Long) =
      Stats.cohensKappa(anti, "a", "b").collect().head
    assert(po === 0L)
    assert(pe === 500000L)
    assert(k === -1000000L)
  }
}
