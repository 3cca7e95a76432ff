package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("hllRho: first-set-bit rank of the 26-bit window") {
    val df = Seq(1L << 25, 1L << 24, 1L, 0L).toDF("w")
      .select(Sketches.hllRho(col("w")).as("rho"))
    assert(df.as[Int].collect().toSeq === Seq(1, 2, 26, 27))
  }

  test("hllRhoSql mirrors hllRho") {
    val sql = Sketches.hllRhoSql("w")
    val df = spark.range(0, 100).select((col("id") * col("id") * 7919).as("w"))
    val both = df.select(Sketches.hllRho(col("w")).as("a"),
      expr(sql.replace("//", "div")).as("b"))
    assert(both.filter(col("a") =!= col("b")).count() === 0)
  }

  test("hll: duplicate rows leave the sketch unchanged") {
    val df = spark.range(0, 500).select(col("id"))
    val once = Sketches.hll(df, "id").as[(Long, Long, Long, Long)].head()
    val twice = Sketches.hll(df.union(df), "id").as[(Long, Long, Long, Long)].head()
    assert(once === twice)
  }

  test("hll: estimate lands within HLL error bounds for n = 5000") {
    val df = spark.range(0, 5000).select(col("id"))
    val (rmax, nz, s, est) = Sketches.hll(df, "id").as[(Long, Long, Long, Long)].head()
    // 1.04/sqrt(64) = 13% standard error; allow 4 sigma
    assert(nz === 64L, "all registers should be hit at n=5000")
    assert(est > 2500 && est < 8500, s"est=$est rmax=$rmax s=$s")
  }

  test("tCloseness: a group matching the global distribution scores 0") {
    // two identical groups -> each equals the global mix exactly
    val rows = for (g <- Seq("a", "b"); b <- 0L to 3L; _ <- 1 to 5) yield (g, b)
    val r = Privacy.tCloseness(rows.toDF("g", "bucket"), Seq("g"), "bucket")
      .select("t_e6").as[Long].collect()
    assert(r.toSeq === Seq(0L, 0L))
  }

  test("tCloseness: opposite point masses are EMD-maximal") {
    // group a all in bucket 0, group b all in bucket 1: global is 50/50.
    // |cum| after bucket 0 is 500000, m=2 -> t = 500000 for both.
    val rows = Seq.fill(10)(("a", 0L)) ++ Seq.fill(10)(("b", 1L))
    val r = Privacy.tCloseness(rows.toDF("g", "bucket"), Seq("g"), "bucket")
      .select("g", "t_e6").as[(String, Long)].collect().toMap
    assert(r === Map("a" -> 500000L, "b" -> 500000L))
  }

  test("diffInDiff: nets out group gap and common trend") {
    // control: 100 -> 120 (trend +20); treated: 200 -> 260 (trend +60)
    // DiD = 60 - 20 = 40 cents = 400000 e4
    val rows = Seq((0, 0, 100L), (0, 1, 120L), (1, 0, 200L), (1, 1, 260L))
    val r = Experiment.diffInDiff(rows.toDF("t", "p", "c"), "t", "p", "c")
    val row = r.select("did_e4", "mean_t_post_e4").as[(Long, Long)].head()
    assert(row === ((400000L, 2600000L)))
  }
}
