package graft.ops

import graft.SparkSpec

class Round54OpsSpec extends SparkSpec {
  import spark.implicits._

  test("kendallTauByKey: perfect concordance / discordance / tie-null") {
    val df = Seq(
      // key a: x and y both strictly increasing -> tau = 1
      ("a", 1L, 1L, 10L), ("a", 2L, 2L, 20L),
      ("a", 3L, 3L, 30L), ("a", 4L, 4L, 40L),
      // key b: y strictly decreasing in x -> tau = -1
      ("b", 1L, 1L, 40L), ("b", 2L, 2L, 30L),
      ("b", 3L, 3L, 20L), ("b", 4L, 4L, 10L),
      // key c: x constant -> denominator collapses -> NULL
      ("c", 1L, 5L, 1L), ("c", 2L, 5L, 2L))
      .toDF("k", "u", "x", "y")
    val r = Stats.kendallTauByKey(df, "k", "u", "x", "y")
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getLong(2), row.getLong(3),
          if (row.isNullAt(4)) None else Some(row.getDouble(4)))).toMap
    assert(r("a") === ((6L, 6L, 0L, Some(1.0))))
    assert(r("b") === ((6L, 0L, 6L, Some(-1.0))))
    assert(r("c") === ((1L, 0L, 0L, None)))
  }

  test("partialCorr: independent control leaves r_xy untouched") {
    // y = x exactly; z orthogonal to both -> r_xz = r_yz = 0,
    // so r_partial = r_xy = 1.
    val df = Seq((1L, 1L, 1L), (2L, 2L, -1L), (3L, 3L, -1L), (4L, 4L, 1L))
      .toDF("x", "y", "z")
    val r = Stats.partialCorr(df, "x", "y", "z").head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 1.0) // r_xy
    assert(r.getDouble(2) === 0.0) // r_xz
    assert(r.getDouble(3) === 0.0) // r_yz
    assert(r.getDouble(4) === 1.0) // r_partial
  }

  test("chebyshevBh: step-up rejects the separated cells, keeps the null one") {
    // Cells A (all 0) and B (all 100) sit 50 off the global mean with
    // n_g = 100 -> Chebyshev p = var/(n_g d^2) = 2500/(100*2500) = 0.01.
    // Cell C alternates 0/100 -> mean = global mean -> p = 1.
    // m = 3: p_(1)=0.01 <= 0.0167, p_(2)=0.01 <= 0.0333, p_(3)=1 > 0.05
    // -> k* = 2 -> A and B rejected, C not.
    val rows = Seq.fill(100)(("A", 0L)) ++ Seq.fill(100)(("B", 100L)) ++
      (1 to 100).map(i => ("C", if (i % 2 == 0) 0L else 100L))
    val r = Experiment.chebyshevBh(rows.toDF("cell", "v"), Seq("cell"), "v")
      .collect().map(row => row.getString(0) ->
        (row.getLong(1), row.getDouble(2), row.getBoolean(4))).toMap
    assert(r("A") === ((100L, 0.01, true)))
    assert(r("B") === ((100L, 0.01, true)))
    assert(r("C")._2 === 1.0 && !r("C")._3)
  }
}
