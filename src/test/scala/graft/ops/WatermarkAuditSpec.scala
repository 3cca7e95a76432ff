package graft.ops

import graft.SparkSpec

class WatermarkAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("watermarkAudit: events later than the delay are dropped") {
    // Arrival order 1..4; event times 100s, 200s, 50s, 195s; delay 60s.
    // seq 3 arrives when wm = 200−60 = 140 > 50 → dropped, 90s late.
    // seq 4: wm = 140 ≤ 195 → kept. First row: no watermark yet → kept.
    val df = Seq(
      ("k", ts(100), 1L), ("k", ts(200), 2L),
      ("k", ts(50), 3L), ("k", ts(195), 4L)
    ).toDF("key", "etime", "seq")
    val got = TimeSeries.watermarkAudit(df, "key", "etime", "seq", 60000000L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("k", 4L, 3L, 1L, 90L)))
  }

  test("watermarkAudit: zero drops when delay covers the disorder") {
    val df = Seq(
      ("k", ts(100), 1L), ("k", ts(200), 2L), ("k", ts(150), 3L)
    ).toDF("key", "etime", "seq")
    val got = TimeSeries.watermarkAudit(df, "key", "etime", "seq", 60000000L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("k", 3L, 3L, 0L, 0L)))
  }

  test("watermarkAudit: keys are audited independently") {
    val df = Seq(
      ("a", ts(1000), 1L), ("a", ts(10), 2L),   // a: second is very late
      ("b", ts(10), 3L), ("b", ts(1000), 4L)    // b: in order
    ).toDF("key", "etime", "seq")
    val got = TimeSeries.watermarkAudit(df, "key", "etime", "seq", 60000000L)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") === ("a", 2L, 1L, 1L, 930L))
    assert(got("b") === ("b", 2L, 2L, 0L, 0L))
  }
}
