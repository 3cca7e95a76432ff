package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round11gOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pow2E6Expr: exact on whole powers, truncating on mantissa") {
    val df = Seq(3000000L, 3500000L, 0L).toDF("x")
    val got = df.select(col("x"), Sketches.pow2E6Expr("x").as("v"))
      .as[(Long, Long)].collect().toMap
    assert(got(3000000L) === 8L)
    assert(got(3500000L) === 11L) // 2^3.5 = 11.31 -> truncates
    assert(got(0L) === 1L)
  }

  test("pow2E6 inverts log2E6 within the 5-bit mantissa tolerance") {
    val vals = Seq(1L, 7L, 100L, 12345L, 999999L)
    val df = vals.toDF("v")
    val got = df.select(col("v"), Bm25.log2E6(col("v")).as("l"))
      .select(col("v"), Sketches.pow2E6Expr("l").as("back"))
      .as[(Long, Long)].collect()
    got.foreach { case (v, back) =>
      val err = math.abs(back - v)
      // two 5-bit mantissa hops (~2.2% each) + the final integer floor
      assert(err <= math.max(1L, math.round(v * 0.05)),
        s"roundtrip $v -> $back off by $err")
    }
  }

  test("sprt: first crossing decides, later re-crossings are ignored") {
    // c1 = +1e6, c0 = -1e6, A = 3e6: three conversions cross h1 at n=3,
    // then six failures would cross h0 — the h1 decision must stand
    val ev = (1L to 3L).map(i => (0L, i, i, 1L)) ++
      (4L to 9L).map(i => (0L, i, i, 0L))
    val got = Experiment.sprt(ev.toDF("variant", "t", "tie", "x"),
        "variant", "t", "tie", "x", 1000000L, -1000000L, 3000000L)
      .as[(Long, Long, Long, Long, String, Option[Long])].head()
    assert(got === ((0L, 9L, 3L, -3000000L, "h1", Some(3L))))
  }

  test("sprt: h0 crossing and never-crossing variants") {
    val ev = (1L to 3L).map(i => (0L, i, i, 0L)) ++   // drifts to h0
      Seq((1L, 1L, 1L, 1L), (1L, 2L, 2L, 0L))        // oscillates: continue
    val got = Experiment.sprt(ev.toDF("variant", "t", "tie", "x"),
        "variant", "t", "tie", "x", 1000000L, -1000000L, 3000000L)
      .as[(Long, Long, Long, Long, String, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) === ((0L, 3L, 0L, -3000000L, "h0", Some(3L))))
    assert(got(1L) === ((1L, 2L, 1L, 0L, "continue", None)))
  }

  test("ddsketch reconstruction is within the relative-error budget") {
    // uniform 1..1000, p50 exact = 500; gamma ~ 1.041 (alpha ~ 2%) plus
    // midpoint truncation -> estimate must sit within 5% of truth
    val df = (1L to 1000L).map(("g", _)).toDF("g", "v")
    val est = Sketches.logBucketQuantile(df, "g", "v", 57536L, Seq(500000L))
      .withColumn("mid_l", expr("bucket * 57536L + 28768L"))
      .select(Sketches.pow2E6Expr("mid_l").as("est"))
      .as[Long].head()
    assert(math.abs(est - 500L).toDouble / 500.0 <= 0.05,
      s"p50 estimate $est vs exact 500")
  }
}
