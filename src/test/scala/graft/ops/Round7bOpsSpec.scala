package graft.ops

import graft.SparkSpec

class Round7bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rfm: quintiles and segment codes on a 5-customer ladder") {
    // customer i: i orders, last at 10·i, total 100·i cents → r=f=m=i
    val orders = (1 to 5).flatMap { i =>
      val per = 100L * i / i // keep totals exactly 100·i
      (1 to i).map(j => (i.toLong, 10L * i - (i - j), per))
    }.toDF("o_custkey", "ts_s", "cents")
    val got = Segmentation.rfm(orders, "o_custkey", "ts_s", "cents")
      .select("entity", "r", "f", "m", "segment")
      .as[(Long, Int, Int, Int, Int)].collect().toSet
    assert(got === (1 to 5).map(i => (i.toLong, i, i, i, 111 * i)).toSet)
  }

  test("rfm: ties bucket deterministically by entity id") {
    // two customers with identical metrics: lower id gets the lower bucket
    val orders = Seq((1L, 10L, 100L), (2L, 10L, 100L))
      .toDF("o_custkey", "ts_s", "cents")
    val got = Segmentation.rfm(orders, "o_custkey", "ts_s", "cents")
      .select("entity", "r").as[(Long, Int)].collect().toMap
    assert(got(1L) < got(2L))
  }

  test("retentionDayN: day-7 comeback counting") {
    val day = 86400000000L
    val events = Seq(
      (1L, 100L),           // u1 active day 0
      (1L, 7 * day + 5L),   // u1 back on day 7
      (2L, 200L)            // u2 active day 0 only
    ).toDF("user_id", "t_us")
    val got = Segmentation.retentionDayN(events, "user_id", "t_us", 7)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 2L, 1L, 500000L), (7L, 1L, 0L, 0L)))
  }

  test("retentionDayN: duplicate same-day events count once") {
    val events = Seq((1L, 100L), (1L, 200L), (1L, 300L))
      .toDF("user_id", "t_us")
    val got = Segmentation.retentionDayN(events, "user_id", "t_us", 7)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((0L, 1L, 0L, 0L)))
  }

  test("ewmaHalf: truncating half-life fold in time order") {
    val events = Seq(
      ("a", 1L, 1L, 10L), ("a", 2L, 2L, 20L), ("a", 3L, 3L, 7L),
      ("b", 1L, 4L, 101L)
    ).toDF("event_type", "t_us", "event_id", "cents")
    val got = TimeSeries.ewmaHalf(events, "event_type", "t_us", "event_id",
        "cents")
      .as[(String, Long, Long)].collect().toSet
    // a: (0+10)/2=5 → (5+20)/2=12 → (12+7)/2=9 ; b: (0+101)/2=50
    assert(got === Set(("a", 9L, 3L), ("b", 50L, 1L)))
  }

  test("ewmaHalf: timestamp ties fold in tie-column order") {
    val events = Seq(
      ("a", 1L, 1L, 100L), ("a", 1L, 2L, 0L)
    ).toDF("event_type", "t_us", "event_id", "cents")
    val got = TimeSeries.ewmaHalf(events, "event_type", "t_us", "event_id",
        "cents")
      .as[(String, Long, Long)].collect().toSet
    // (0+100)/2=50 → (50+0)/2=25 (not the other order: (0+0)/2=0 → 50)
    assert(got === Set(("a", 25L, 2L)))
  }
}
