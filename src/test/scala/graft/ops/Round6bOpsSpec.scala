package graft.ops

import graft.SparkSpec

class Round6bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cusumProfile: window identity matches the sequential recursion") {
    // values in dollars; target 1.00, slack 0.00 → d = cents - 100
    val df = Seq(
      (1L, 1L, 3.0), (1L, 2L, 0.5), (1L, 3L, 0.5), (1L, 4L, 4.0),
      (2L, 1L, 0.1), (2L, 2L, 0.2)
    ).toDF("k", "t", "v")
    // key 1: d = 200,-50,-50,300 → s = 200,150,100,400 (threshold 250 → 1 alarm)
    // key 2: d = -90,-80 → s = 0,0
    val m = Anomaly.cusumProfile(df, "k", "t", "v", 100L, 0L, 250L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L) === ((4L, 1L, 400L)))
    assert(m(2L) === ((2L, 0L, 0L)))
  }

  test("cusumProfile: reset after drop (clamp at zero)") {
    // d = 500, -1000, 300: without clamp s3 = -200; with clamp s = 500,0,300
    val df = Seq((1L, 1L, 6.0), (1L, 2L, -9.0), (1L, 3L, 4.0))
      .toDF("k", "t", "v")
    val m = Anomaly.cusumProfile(df, "k", "t", "v", 100L, 0L, 400L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L) === ((3L, 1L, 500L)))
  }

  test("orphans: counts missing parents, ignores null FKs") {
    val child = Seq(Some(1L), Some(2L), Some(9L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Audit.orphans(child, "fk", parent, "pk", "c->p")
      .as[(String, Long)].collect()
    assert(got === Array(("c->p", 2L)))
  }

  test("referentialIntegrity: one row per relation, zero-orphan relations included") {
    val child = Seq(1L, 2L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Audit.referentialIntegrity(Seq(
      (child, "fk", parent, "pk", "ok"),
      (parent, "pk", child.filter($"fk" === 1L), "fk", "broken")))
      .as[(String, Long)].collect().toMap
    assert(got === Map("ok" -> 0L, "broken" -> 1L))
  }

  test("funnelTimes: stage times fill strictly in order") {
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 40L, "click"),
      (3L, 10L, "click")
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelTimes(ev, "user_id", "t_us", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((Some(10L), Some(20L), Some(30L))))
    // u2's purchase precedes the click-reach → stage 3 unreached
    assert(got(2L) === ((Some(10L), Some(40L), None)))
    assert(got(3L) === ((None, None, None)))
  }

  test("funnelTimes agrees with funnelStages on testdata") {
    val ev = graft.Tables.events(spark, sf())
      .withColumn("t_us", org.apache.spark.sql.functions.unix_micros(
        org.apache.spark.sql.functions.col("ts")))
    val steps = Seq("view", "click", "purchase")
    val times = Behavior.funnelTimes(ev, "user_id", "t_us", "event_type", steps)
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4).count(_.isDefined)).toMap
    val stages = Behavior.funnelStages(ev, "user_id", "t_us", "event_type", steps)
      .as[(Long, Int)].collect().toMap
    assert(times === stages.map { case (k, v) => k -> v })
  }
}
