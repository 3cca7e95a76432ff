package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("mannWhitneyU: textbook no-tie example") {
    // s0 = {1, 3, 5}, s1 = {2, 4, 6}: U1 = #{(a, b): a < b} pairs won by
    // s1-perspective ranks → R1 = 1+3+5 ranks = 1, 3, 5 → ΣR1 = 9,
    // U1 = ΣR1 − n1(n1+1)/2 = 9 − 6 = 3... with doubled units: u2_a = 2·U1
    // via 2U1 = Σc1·r2 − n1(n1+1) where r2 is the doubled midrank of the
    // OTHER convention. Cross-check: u2_a + u2_b = 2·n1·n2 = 18.
    val df = Seq((0L, 1L), (0L, 3L), (0L, 5L), (1L, 2L), (1L, 4L), (1L, 6L))
      .toDF("s", "v")
    val r = Stats.mannWhitneyU(df, "s", "v")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 === 3L && r._2 === 3L)
    assert(r._3 + r._4 === 18L)
    // ranks of sample-0 values (1-based): 1, 3, 5 → doubled = 2, 6, 10,
    // Σ = 18; u2_a = 18 − 3·4 = 6 (i.e. U1 = 3).
    assert(r._3 === 6L)
  }

  test("mannWhitneyU: ties use doubled midranks exactly") {
    // s0 = {1, 2}, s1 = {2, 3}: pooled 1, 2, 2, 3 → doubled midranks
    // 2, 5, 5, 8. Σ over s0 = 2 + 5 = 7 → u2_a = 7 − 2·3 = 1 (U1 = 0.5).
    val df = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L)).toDF("s", "v")
    val r = Stats.mannWhitneyU(df, "s", "v")
      .as[(Long, Long, Long, Long)].head()
    assert(r === ((2L, 2L, 1L, 7L)))
  }

  test("linearRegression2: exact plane is recovered") {
    // y = 5 + 2·x1 + 3·x2 on a non-collinear grid.
    val pts = for (a <- 0L to 4L; b <- 0L to 3L)
      yield (5L + 2 * a + 3 * b, a, b)
    val r = Stats.linearRegression2(pts.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(r._1 === 20L)
    assert(r._2.contains(2.0) && r._3.contains(3.0) && r._4.contains(5.0))
  }

  test("linearRegression2: collinear features yield NULLs") {
    val df = Seq((1L, 1L, 2L), (2L, 2L, 4L), (3L, 3L, 6L)).toDF("y", "x1", "x2")
    val r = Stats.linearRegression2(df, "y", "x1", "x2")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(r._2.isEmpty && r._3.isEmpty && r._4.isEmpty)
  }

  test("naiveBayesConfusion: separable vocabularies classify perfectly") {
    // Folds: id % 5 == 0 held out. Classes use disjoint vocab.
    val docs = (0L to 19L).map { i =>
      if (i % 2 == 0) (i, "en", "the cat sat on the mat")
      else (i, "fr", "le chat noir dort bien")
    }
    val r = Classify.naiveBayesConfusion(docs.toDF("id", "lang", "text"),
        "id", "lang", "text")
      .as[(String, String, Long)].collect().toSet
    // Held-out ids: 0, 5, 10, 15 → en: 0, 10; fr: 5, 15.
    assert(r === Set(("en", "en", 2L), ("fr", "fr", 2L)))
  }

  test("naiveBayesConfusion: argmax ties break toward the smaller label") {
    // One test doc whose tokens are unseen in training → every class
    // scores prior − len·denom with equal priors and totals → tie.
    val docs = Seq(
      (1L, "aa", "x x"), (2L, "bb", "y y"),
      (3L, "aa", "x x"), (4L, "bb", "y y"),
      (0L, "bb", "zz zz"))
    val r = Classify.naiveBayesConfusion(docs.toDF("id", "lang", "text"),
        "id", "lang", "text")
      .as[(String, String, Long)].head()
    assert(r === (("bb", "aa", 1L)))
  }

  test("sccMinLabel: cycle plus tail") {
    // 1→2→3→1 cycle; 4→1, 5→4 tail. SCC: {1,2,3} labeled 1; 4, 5 singleton.
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 4L))
      .toDF("src", "dst")
    val r = Graph.sccMinLabel(nodes, edges, 6)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("sccMinLabel: two disjoint cycles stay separate components") {
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 5L), (5L, 3L), (6L, 6L))
      .toDF("src", "dst")
    val r = Graph.sccMinLabel(nodes, edges, 6)
      .as[(Long, Long)].collect().toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L,
      6L -> 6L))
  }

  test("fanoFactor: Poisson-flat counts give fano < 1, bursty > 1") {
    // key "flat": counts 4, 4, 4, 4 → variance 0 → fano 0.
    // key "burst": counts 1, 1, 1, 9 → mean 3, pop-var 12 → fano 4.
    val rows =
      (0L until 4L).flatMap(b => Seq.fill(4)(("flat", b))) ++
        (0L until 3L).map(b => ("burst", b)) ++ Seq.fill(9)(("burst", 3L))
    val r = TimeSeries.fanoFactor(rows.toDF("k", "b"), "k", "b")
      .as[(String, Long, Long)].collect().map(x => x._1 -> ((x._2, x._3)))
      .toMap
    assert(r("flat") === ((4L, 0L)))
    assert(r("burst") === ((4L, 4000000L)))
  }
}
