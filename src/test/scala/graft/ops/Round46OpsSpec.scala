package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class Round46OpsSpec extends SparkSpec {
  import spark.implicits._

  test("logRank: identical groups give zero statistic") {
    // Same durations/events in both groups → O1 equals E1 exactly.
    val subj = Seq(
      (1L, 1L, 0L), (1L, 1L, 1L),
      (2L, 1L, 0L), (2L, 1L, 1L),
      (3L, 0L, 0L), (3L, 0L, 1L)).toDF("t", "ev", "g")
    val Row(o1: Long, e1: Long, v: Long, chi2: Long) =
      Stats.logRank(subj).collect().head
    assert(o1 === 2L)
    assert(e1 === 2000000L) // E1 = 1/2 + 1/2 + 1/2 + 1/2 = 2 exactly
    assert(chi2 === 0L)
    assert(v > 0L)
  }

  test("logRank: hand-checked two-time example") {
    // t=1: n=4 (2 per group), d=2 both in g1 → E1 = 2*2/4 = 1,
    //      V = 2*(2/4)*(2/4)*(4-2)/(4-1) = 1/3.
    // t=2: n=2 (g0 only), d=1 in g0 → E1 = 1*0/2 = 0, V = 0.
    val subj = Seq(
      (1L, 1L, 1L), (1L, 1L, 1L), // two g1 deaths at t=1
      (2L, 1L, 0L), (2L, 0L, 0L)) // one g0 death, one censored at t=2
      .toDF("t", "ev", "g")
    val Row(o1: Long, e1: Long, v: Long, chi2: Long) =
      Stats.logRank(subj).collect().head
    assert(o1 === 2L)
    assert(e1 === 1000000L)
    assert(v === 333333L) // (((2*2*1e6)div 4)*2 div 4)*2 div 3
    // chi2 = 1²/(1/3) = 3 → e3 units: (1e3)² · 1e3 div 333333 = 3000
    assert(chi2 === 3000L)
  }

  test("theilsU: y fully determines x → U = 1; independent → U ≈ 0") {
    val det = Seq.tabulate(40)(i => (s"x${i % 4}", i.toLong % 4))
      .toDF("x", "y")
    val Row(_, _, _, uDet: Long) = Stats.theilsU(det, "x", "y").collect().head
    assert(uDet === 1000000L)

    val ind = Seq.tabulate(40)(i => (s"x${i % 2}", (i / 2).toLong % 2))
      .toDF("x", "y")
    val Row(_, hx: Long, mi: Long, uInd: Long) =
      Stats.theilsU(ind, "x", "y").collect().head
    assert(hx === 1000000L) // H(X) of a fair coin = 1 bit
    assert(mi <= 0L) // truncated-log residue can dip a hair below 0
    assert(uInd === 0L) // clamped
  }

  test("theilsU is directional: U(x|y) differs from U(y|x) when margins differ") {
    // x has 4 equally-likely values, y = x mod 2: knowing x fixes y
    // (U(y|x)=1) but knowing y only halves x's uncertainty (U(x|y)=1/2).
    val df = Seq.tabulate(40)(i => (s"x${i % 4}", i.toLong % 2))
      .toDF("x", "y")
    val Row(_, _, _, uXY: Long) = Stats.theilsU(df, "x", "y").collect().head
    val Row(_, _, _, uYX: Long) = Stats.theilsU(df, "y", "x").collect().head
    assert(uXY === 500000L)
    assert(uYX === 1000000L)
  }
}
