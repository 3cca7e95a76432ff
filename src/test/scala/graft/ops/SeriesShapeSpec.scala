package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeriesShapeSpec extends SparkSpec {
  import spark.implicits._

  private def series(vs: Seq[Long]) =
    vs.zipWithIndex.map { case (v, t) => ("k", t.toLong, v) }.toDF("k", "t", "v")

  test("saxSymbols: monotone ramp codes a..d in order") {
    // 8 points, frameLen 4 -> 2 frames; alphabet 4 needs >= 4 frames
    val df = series(Seq(0L, 10L, 20L, 30L, 40L, 50L, 60L, 70L,
      80L, 90L, 100L, 110L, 120L, 130L, 140L, 150L))
    val r = TimeSeries.saxSymbols(df, "k").select("n_frames", "sax")
      .as[(Long, String)].head()
    assert(r === ((4L, "abcd")), "ascending frames -> ascending symbols")
  }

  test("vShapeRuns: one V with known depth and run") {
    // 5,4,3,1,6,7: local min at value 1, depth = min(3,6)-1 = 2,
    // longest down run = 3 (5->4->3->1)
    val df = series(Seq(5L, 4L, 3L, 1L, 6L, 7L))
    val r = TimeSeries.vShapeRuns(df, "k")
      .select("n_points", "n_vshapes", "max_v_depth", "longest_down_run")
      .as[(Long, Long, Long, Long)].head()
    assert(r === ((6L, 1L, 2L, 3L)))
  }

  test("vShapeRuns: monotone series has no V and full down run") {
    val df = series(Seq(9L, 7L, 5L, 3L))
    val r = TimeSeries.vShapeRuns(df, "k")
      .select("n_vshapes", "longest_down_run").as[(Long, Long)].head()
    assert(r === ((0L, 3L)))
  }

  test("theilSen: outlier cannot move the median slope") {
    // y = 2t except one wild point; majority of pairwise slopes stay 2e6
    val df = series(Seq(0L, 2L, 4L, 6L, 1000L, 10L, 12L, 14L, 16L, 18L))
    val r = TimeSeries.theilSen(df, "k").select("slope_e6").as[Long].head()
    assert(r === 2000000L)
  }

  test("theilSen: negative slope is sign-exact") {
    val df = series(Seq(30L, 27L, 24L, 21L))
    val r = TimeSeries.theilSen(df, "k").select("slope_e6").as[Long].head()
    assert(r === -3000000L)
  }

  test("maseRatio: perfect weekly seasonality scores 0") {
    val week = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L)
    val df = series(week ++ week ++ week)
    val r = TimeSeries.maseRatio(df, "k")
      .select("sae_seasonal", "mase_e6").as[(Long, Long)].head()
    assert(r === ((0L, 0L)), "repeating week -> zero seasonal error")
  }
}
