package graft.ops

import graft.SparkSpec

class Round56OpsSpec extends SparkSpec {
  import spark.implicits._

  test("lofWithinLabel: line cluster plus far point, k=2, exact e6 scores") {
    // 1-d points 0, 0.001, 0.002, 0.1 (e6 ints 0/1000/2000/100000).
    // Hand-computed (see Outlier scaladoc arithmetic):
    //   sreach: p0=5e6, p1=8e6, p2=5e6, p3=19405e6
    //   lof_e6: p0=812500, p1=1600000, p2=812500, p3=3153312500
    val emb = Seq((0L, Array(0f), 0L), (1L, Array(0.001f), 0L),
      (2L, Array(0.002f), 0L), (3L, Array(0.1f), 0L))
      .toDF("vec_id", "embedding", "label")
    val r = Outlier.lofWithinLabel(emb, 2, 4)
      .select("vec_id", "lof_e6").as[(Long, Long)].collect().toMap
    assert(r === Map(0L -> 812500L, 1L -> 1600000L, 2L -> 812500L,
      3L -> 3153312500L))
  }

  test("lofWithinLabel: topPerLabel keeps the highest scores only") {
    val emb = Seq((0L, Array(0f), 0L), (1L, Array(0.001f), 0L),
      (2L, Array(0.002f), 0L), (3L, Array(0.1f), 0L))
      .toDF("vec_id", "embedding", "label")
    val top = Outlier.lofWithinLabel(emb, 2, 1)
      .select("vec_id").as[Long].collect()
    assert(top.toSeq === Seq(3L))
  }

  test("stratifiedAte: recovers the per-stratum effect and drops one-arm strata") {
    // Stratum 0: treated mean 300, control mean 100 -> diff 200 (n=4).
    // Stratum 1: treated mean 50, control mean 100 -> diff -50 (n=4).
    // Stratum 2: control only -> dropped.
    // ATE = (4*200 + 4*(-50)) / 8 = 75.
    val units = Seq(
      (0L, true, 300L), (0L, true, 300L), (0L, false, 100L), (0L, false, 100L),
      (1L, true, 50L), (1L, true, 50L), (1L, false, 100L), (1L, false, 100L),
      (2L, false, 900L)).toDF("stratum", "t", "y")
    val rows = Experiment.stratifiedAte(units, "stratum", "t", "y")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    assert(rows.keySet === Set(0L, 1L))
    assert(rows(0L) === ((200L, 500000L, 75L)))
    assert(rows(1L) === ((-50L, 500000L, 75L)))
  }

  test("kneedle: knee sits where cumulative share pulls furthest ahead of rank") {
    // values 70, 20, 5, 5: shares 70/90/95/100 vs ranks 25/50/75/100.
    // gaps (e6): 450000, 400000, 200000, 0 -> knee at rank 1, key a.
    val per = Seq(("a", 70L), ("b", 20L), ("c", 5L), ("d", 5L))
      .toDF("k", "v")
    val r = Pareto.kneedle(per, "k", "v").head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 1L)
    assert(r.getString(2) === "a")
    assert(r.getLong(5) === 450000L)
  }
}
