package graft.ops

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("ks2: disjoint samples reach D = 1 at the first sample's max") {
    val df = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L), (1L, 6L))
      .toDF("s", "v")
    val r = Stats.ks2(df, "s", "v").as[(Long, Long, Long, Long)].head()
    assert(r === ((3L, 3L, 3L, 1000000L)))
  }

  test("ks2: identical samples score 0") {
    val df = Seq((0L, 1L), (0L, 2L), (1L, 1L), (1L, 2L)).toDF("s", "v")
    val r = Stats.ks2(df, "s", "v").as[(Long, Long, Long, Long)].head()
    assert(r._4 === 0L)
  }

  test("chiSquare: perfectly associated 2x2 gives chi2 = n (zero cells count)") {
    val rows = Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("b", 1L))
    val r = Stats.chiSquare(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long, Long)].head()
    // chi2 = N = 20 needs the two ZERO cells' (0-E)^2/E = 5 each
    assert(r === ((20L, 1L, 20000000L, 1000000L)))
  }

  test("chiSquare: independent table scores 0") {
    val rows = for (x <- Seq("a", "b"); y <- Seq(0L, 1L); _ <- 1 to 5)
      yield (x, y)
    val r = Stats.chiSquare(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long, Long)].head()
    assert(r._3 === 0L && r._4 === 0L)
  }

  test("mutualInfo: x = y binary carries exactly 1 bit") {
    val rows = Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("b", 1L))
    val r = Stats.mutualInfo(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].head()
    // log2E6(cxy*n) - log2E6(cx*cy) shares the mantissa index -> exact 1e6
    assert(r === ((20L, 2L, 1000000L)))
  }

  test("mutualInfo: independent columns stay within log-truncation of 0") {
    val rows = for (x <- Seq("a", "b"); y <- Seq(0L, 1L); _ <- 1 to 5)
      yield (x, y)
    val r = Stats.mutualInfo(rows.toDF("x", "y"), "x", "y")
      .as[(Long, Long, Long)].head()
    assert(math.abs(r._3) < 50000L) // < 0.05 bits of fixed-point residue
  }

  test("kaplanMeier: textbook 5-subject curve") {
    val df = Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 1L), (5L, 0L))
      .toDF("t", "ev")
    val r = Stats.kaplanMeier(df, "t", "ev")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(x => (x._1, x._2, x._3)).toSeq ===
      Seq((1L, 5L, 1L), (2L, 4L, 1L), (4L, 2L, 1L)))
    // S = 0.8, 0.6, 0.3 within the 5-bit mantissa's ~2% envelope
    val s = r.map(_._4 / 1e6)
    assert(math.abs(s(0) - 0.8) < 0.025)
    assert(math.abs(s(1) - 0.6) < 0.025)
    assert(math.abs(s(2) - 0.3) < 0.025)
    assert(s(0) >= s(1) && s(1) >= s(2)) // monotone nonincreasing
  }

  test("kaplanMeier: everyone dying at the end pins survival to exact 0") {
    val df = Seq((1L, 1L), (2L, 1L), (2L, 1L)).toDF("t", "ev")
    val r = Stats.kaplanMeier(df, "t", "ev")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.last._4 === 0L)
  }

  test("competingRisks: hand-worked 8-subject CIF (tie-time, censor, extinction)") {
    // Risk fractions are powers of two at every event time, so the e6
    // log2/pow2 machinery is EXACT and the Aalen-Johansen CIF values can
    // be asserted against hand-derived truth (not a twin of the code):
    //  t=1: n=8, d1=3, d2=1 (TIE-TIME, both causes) -> S(1-)=1
    //       cif1 = 1e6*3/8 = 375000, cif2 = 1e6*1/8 = 125000
    //  t=2: two CENSORS (no output row; they still leave the risk set)
    //  t=3: n=2, d2=1; S(3-)=pow2(-log2(8/4))=500000 -> cif2 += 250000
    //  t=4: n=1, d1=1; S(4-)=pow2(-2e6)=250000 -> cif1 += 250000
    //       (extinction: n_risk==d, so S after is 0 and cif1+cif2 = 1e6)
    val df = Seq((1L, 1L), (1L, 1L), (1L, 1L), (1L, 2L),
      (2L, 0L), (2L, 0L), (3L, 2L), (4L, 1L)).toDF("t", "cz")
    val r = Stats.competingRisks(df, "t", "cz")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq === Seq(
      (1L, 8L, 3L, 1L, 375000L, 125000L),
      (3L, 2L, 0L, 1L, 375000L, 375000L),
      (4L, 1L, 1L, 0L, 625000L, 375000L)))
    assert(r.last._5 + r.last._6 === 1000000L) // CIFs exhaust S at extinction
  }

  test("crossCorr: an impulse shifted by 2 correlates perfectly at lag 2") {
    val x = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 0L), (4L, 0L), (5L, 0L))
      .toDF("h", "x")
    val y = Seq((4L, 1L)).toDF("h", "y") // dense spine 0-fills the rest
    val r = TimeSeries.crossCorr(x, y, 3).as[(Long, Long, Double)]
      .collect().map(t => t._1 -> t._3).toMap
    assert(r(2L) === 1.0)
    assert(r(0L) < 1.0)
  }
}
