package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class Round2OpsSpec extends SparkSpec {

  test("connectedComponents: chains, triangles, singletons converge to min label") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} (isolated)
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val cc = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("connectedComponents: long chain needs multiple rounds, still converges") {
    import spark.implicits._
    val n = 12
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val cc = Dedup.connectedComponents(nodes, edges).collect()
    assert(cc.forall(_.getLong(1) === 0L))
  }

  test("connectedComponents: empty edge set leaves every node a singleton") {
    import spark.implicits._
    val nodes = Seq(5L, 6L, 7L).toDF("id")
    val edges = spark.emptyDataset[(Long, Long)].toDF("a", "b")
    val cc = Dedup.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(5L -> 5L, 6L -> 6L, 7L -> 7L))
  }

  test("contamination: disjoint corpora produce no rows") {
    import spark.implicits._
    val bench = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    val corpus = Seq((2L, "ee ff gg hh")).toDF("doc_id", "text")
    assert(Curation.contamination(corpus, bench).count() === 0L)
  }

  test("sampling at 0 and 100 percent keeps none/all") {
    import spark.implicits._
    val df = (1 to 500).map(_.toLong).toDF("id")
    assert(Sampling.stratified(df, $"id".cast("string"), "s", lit(0)).count() === 0L)
    assert(Sampling.stratified(df, $"id".cast("string"), "s", lit(100)).count() === 500L)
  }

  test("stratified sampling is deterministic and rate-plausible") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val rate = when(col("event_type") === "view", lit(10)).otherwise(lit(50))
    val s1 = Sampling.stratified(ev, col("event_id").cast("string"), "samp", rate)
    val s2 = Sampling.stratified(ev, col("event_id").cast("string"), "samp", rate)
    assert(s1.count() === s2.count())
    val counts = s1.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~10% of view, ~50% of others; binomial 5-sigma bounds at n~2000
    val viewFrac = counts("view").toDouble / totals("view")
    val clickFrac = counts("click").toDouble / totals("click")
    assert(viewFrac > 0.06 && viewFrac < 0.14, s"view frac $viewFrac")
    assert(clickFrac > 0.44 && clickFrac < 0.56, s"click frac $clickFrac")
  }

  test("fuzzy join: finds single-edit typos inside the block, skips far strings") {
    import spark.implicits._
    val clean = Seq("v100", "v200", "w300").toDF("id")
    val dirty = Seq("v1000", "v201", "w999", "x100").toDF("id")
    val out = FuzzyJoin.byEditDistance(clean, dirty, "id", maxDist = 1, prefixLen = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // v100→v1000 (append, d1), v200→v201 (substitute, d1); w999 d3 excluded;
    // x100 blocked out (prefix 'x1' matches nothing)
    assert(out === Set(("v100", "v1000", 1L), ("v200", "v201", 1L)))
  }

  test("simhashPairs: identical docs at hamming 0, disjoint docs not paired") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),   // identical → hamming 0
      (3L, "zeta eta theta iota kappa lambda")) // disjoint vocabulary
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("hamming")))
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._2 == 3L && p._3 > 3))
  }

  test("histogram quantiles approximate exact percentiles within bin width") {
    val ev = Tables.events(spark, sf("sf0.01"))
    val est = Quantiles.fromHistogram(
        Quantiles.histogram(ev, "event_type", "value"), "event_type", Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"), expr("percentile(value, 0.9)").as("p90"))
      .collect().flatMap(r => Seq(
        (r.getString(0), 0.5) -> r.getDouble(1), (r.getString(0), 0.9) -> r.getDouble(2))).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(est(k) - v) <= 2.5, s"$k est=${est(k)} exact=$v") // bin width 2 + interp slack
    }
  }

  test("tfidf: k rows per doc, rarer words outscore common ones at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common rare1"),
      (2L, "common other words"),
      (3L, "common more words")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopK(docs, 2)
    val d1 = out.filter($"doc_id" === 1).orderBy($"rk").collect()
    assert(d1.length === 2)
    // doc1: 'common' tf=2 df=3 → score 2*3/3=2 ; 'rare1' tf=1 df=1 → 3
    assert(d1.head.getAs[String]("word") === "rare1")
    assert(d1.head.getAs[Double]("score") === 3.0)
    assert(d1(1).getAs[String]("word") === "common")
    assert(d1(1).getAs[Double]("score") === 2.0)
  }

  test("inverted index: postings sorted, capped, df bounds applied") {
    import spark.implicits._
    val docs = (1 to 30).map(i => (i.toLong, if (i <= 25) "hot word" else "cold word"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.invertedIndex(docs, 2, 1000000L, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toList
    val byWord = out.map(t => t._1 -> t).toMap
    assert(byWord("word")._2 === 30L)
    assert(byWord("word")._3 === (1 to 10).mkString(","))  // capped at 10
    assert(byWord("hot")._2 === 25L)
    assert(byWord("cold")._3 === (26 to 30).map(_.toString).mkString(","))
  }
}
