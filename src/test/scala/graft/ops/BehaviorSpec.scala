package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "purchase")

  test("funnelStages: full, partial, zero, and out-of-order progressions") {
    val events = Seq(
      // u1 completes the funnel in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2 purchases BEFORE viewing — only stage 1
      (2L, 5L, "purchase"), (2L, 10L, "view"),
      // u3 never views — stage 0 despite click+purchase
      (3L, 10L, "click"), (3L, 20L, "purchase"),
      // u4 views twice then clicks — stage 2
      (4L, 10L, "view"), (4L, 15L, "view"), (4L, 20L, "click")
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelStages(events, "user_id", "t_us", "event_type", steps)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 0, 4L -> 2))
  }

  test("funnelStages: same-timestamp events do not advance (strictly after)") {
    val events = Seq(
      (1L, 10L, "view"), (1L, 10L, "click"),          // tie: click not after view
      (2L, 10L, "view"), (2L, 11L, "click"), (2L, 11L, "purchase") // tie at stage 3
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelStages(events, "user_id", "t_us", "event_type", steps)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 1, 2L -> 2))
  }

  test("funnelStages rejects non-identifier step names") {
    val df = Seq((1L, 1L, "a")).toDF("user_id", "t_us", "event_type")
    intercept[IllegalArgumentException] {
      Behavior.funnelStages(df, "user_id", "t_us", "event_type", Seq("a'b"))
    }
  }

  test("transitions: counts and e6 probabilities normalize per source") {
    val events = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b")
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.transitions(events, "user_id", "t_us", "event_type")
      .as[(String, String, Long, Long)].collect()
      .map { case (s, d, c, p) => (s, d) -> ((c, p)) }.toMap
    // a→b twice, a→c once (from a: 2/3 and 1/3); b→a once (1/1)
    assert(got(("a", "b")) === ((2L, 666666L)))
    assert(got(("a", "c")) === ((1L, 333333L)))
    assert(got(("b", "a")) === ((1L, 1000000L)))
    assert(got.size === 3)
  }

  test("topPaths: frequency then lexicographic tie-break, limit k") {
    val events = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "b"), (1L, 5L, "c"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c")
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.topPaths(events, "user_id", "t_us", "event_type", 2)
      .as[(String, Long)].collect().toSeq
    // a>b>c twice; b>c>b and c>b>c once each → lexicographic picks b>c>b
    assert(got === Seq(("a>b>c", 2L), ("b>c>b", 1L)))
  }

  test("funnel on testdata events matches stepwise-min cascade") {
    val ev = graft.Tables.events(spark, sf())
      .withColumn("t_us", unix_micros(col("ts")))
    val got = Behavior.funnelStages(ev, "user_id", "t_us", "event_type", steps)
    assert(got.count() === ev.select("user_id").distinct().count())
    // stage distribution is monotone-nonincreasing in reach
    val dist = got.groupBy("stage").count().as[(Int, Long)].collect().toMap
    assert(dist.keys.forall(k => k >= 0 && k <= 3))
  }
}
