package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class Round47OpsSpec extends SparkSpec {
  import spark.implicits._

  test("croston: folds demand sizes and gaps independently, hand-checked") {
    // key a: demands (day 0, q 4), (day 3, q 8), (day 5, q 2); zeros drop.
    // z fold: 0 → (0+4)/2=2 → (2+8)/2=5 → (5+2)/2=3
    // gaps: 3, 2; p fold: 0 → (0+3)/2=1 → (1+2)/2=1
    val df = Seq(
      ("a", 0L, 4L), ("a", 3L, 8L), ("a", 5L, 2L), ("a", 7L, 0L))
      .toDF("k", "day", "q")
    val Row(_, n: Long, z: Long, p: Long, f: Long) =
      TimeSeries.croston(df, "k", "day", "q").collect().head
    assert(n === 3L)
    assert(z === 3L)
    assert(p === 1L)
    assert(f === 3000L) // 3 * 1000 div 1
  }

  test("croston: same-day demands merge before the fold") {
    // day 2 has two rows (3 + 5 = 8): the fold must see ONE demand of 8.
    val df = Seq(("a", 2L, 3L), ("a", 2L, 5L), ("a", 6L, 4L))
      .toDF("k", "day", "q")
    val Row(_, n: Long, z: Long, p: Long, _) =
      TimeSeries.croston(df, "k", "day", "q").collect().head
    assert(n === 2L)
    assert(z === 4L) // 0 → (0+8)/2=4 → (4+4)/2=4
    assert(p === 2L) // single gap 4: (0+4)/2=2
  }

  test("permutationEntropy: monotone series collapses to one pattern") {
    val df = Seq.tabulate(20)(i => ("a", i.toLong, i.toLong, i.toLong * 10))
      .toDF("k", "t", "tie", "v")
    val Row(_, nw: Long, np: Long, h: Long, norm: Long) =
      TimeSeries.permutationEntropy(df, "k", "t", "tie", "v")
        .collect().head
    assert(nw === 18L)
    assert(np === 1L)
    assert(h === 0L)
    assert(norm === 0L)
  }

  test("permutationEntropy: alternating series uses exactly two patterns") {
    // 0,10,0,10,... triples alternate (a<=b,b>c,a<=c)=011? and (a>b,b<=c,a<=c)
    val df = Seq.tabulate(21)(i => ("a", i.toLong, i.toLong, (i % 2).toLong * 10))
      .toDF("k", "t", "tie", "v")
    val r = TimeSeries.permutationEntropy(df, "k", "t", "tie", "v")
      .collect().head
    assert(r.getLong(2) === 2L) // n_patterns
    // 19 windows, 10/9 split → H just under 1 bit
    assert(r.getLong(3) > 900000L && r.getLong(3) <= 1000000L)
  }

  test("epochFolding: a pure period-3 signal scores high at p=3, flat at p=4") {
    // one event in every hour ≡ 0 (mod 3) over 24 hours
    val rows = (0L until 24L).filter(_ % 3 == 0)
      .flatMap(h => Seq.fill(10)(h * 3600000000L))
    val df = rows.toDF("t_us")
    val r = TimeSeries.epochFolding(df, "t_us", Seq(3, 4))
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(3L) > r(4L) * 5) // fold at the true period dominates
  }

  test("epochFolding: uneven spine support is weighted, not assumed uniform") {
    // 25-hour spine folded at p=24: phase 0 covers 2 hours, others 1.
    // Events uniform per HOUR → chi2 stays small because expectation
    // scales with support.
    val df = (0L until 25L).flatMap(h => Seq.fill(4)(h * 3600000000L))
      .toDF("t_us")
    val Row(_, nPhases: Long, nEv: Long, chi2: Long) =
      TimeSeries.epochFolding(df, "t_us", Seq(24)).collect().head
    assert(nPhases === 24L)
    assert(nEv === 100L)
    assert(chi2 < 5000L) // < 5 in χ² units on 23 dof — flat
  }
}
