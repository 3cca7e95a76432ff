package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round13bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("thetaSetOps: identical sets estimate empty difference, full intersection") {
    val a = spark.range(0, 200).toDF("id")
    val r = Sketches.thetaSetOps(a, a, 16)
      .select("est_inter", "est_union", "est_diff_ab")
      .as[(Long, Long, Long)].head()
    assert(r._1 === r._2, "intersection of identical sets = union")
    assert(r._3 === 0L, "difference of identical sets is empty")
  }

  test("thetaSetOps: disjoint sets estimate zero intersection") {
    val a = spark.range(0, 300).toDF("id")
    val b = spark.range(10000, 10300).toDF("id")
    val r = Sketches.thetaSetOps(a, b, 16)
      .select("est_inter", "est_a", "est_b").as[(Long, Long, Long)].head()
    assert(r._1 === 0L)
    // 1/sqrt(16) = 25% standard error; allow ~4 sigma
    assert(r._2 > 60 && r._2 < 1200, s"est_a=${r._2}")
    assert(r._3 > 60 && r._3 < 1200, s"est_b=${r._3}")
  }

  test("targetEncoding: two balanced categories produce cross means") {
    // cat a: y = 100,100; cat b: y = 200,200; mu = 150, m = 0 smoothing off
    val df = Seq(("a", 100L), ("a", 100L), ("b", 200L), ("b", 200L)).toDF("cat", "y")
    val r = Curation.targetEncoding(df, "cat", "y", m = 0)
      .select("cat", "enc_avg").as[(String, Long)].collect().toMap
    // LOO of each 'a' row: (200-100)/(2-1) = 100
    assert(r === Map("a" -> 100L, "b" -> 200L))
  }

  test("targetEncoding: smoothing pulls a singleton category to the global mean") {
    val df = Seq(("a", 0L), ("a", 0L), ("b", 900L)).toDF("cat", "y")
    val r = Curation.targetEncoding(df, "cat", "y", m = 10)
      .select("cat", "enc_avg").as[(String, Long)].collect().toMap
    // mu = 300; singleton b: (0 + 10*300) / (0 + 10) = 300 (pure prior)
    assert(r("b") === 300L)
  }

  test("corrMatrix: exact +1/-1 on linear columns, NULL on constant") {
    val df = Seq((1L, 2L, -1L, 5L), (2L, 4L, -2L, 5L), (3L, 6L, -3L, 5L))
      .toDF("a", "b", "c", "k")
    val r = Stats.corrMatrix(df, Seq("a", "b", "c", "k"))
      .select("pair", "corr").as[(String, Option[Double])].collect().toMap
    assert(r("a~b") === Some(1.0))
    assert(r("a~c") === Some(-1.0))
    assert(r("a~k") === None, "zero-variance pair must be NULL")
  }

  test("featureHashing: counts survive the dim projection") {
    val df = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val r = TextAnalysis.featureHashing(df, dims = 8, topK = 8)
      .agg(sum("n_tokens"), sum("n_distinct")).as[(Long, Long)].head()
    assert(r._1 === 5L, "total token mass preserved")
    assert(r._2 <= 3L, "at most 3 distinct tokens across dims")
  }
}
