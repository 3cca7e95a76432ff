package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StreamPageHinkley.{PhOut, Point}

class StreamPageHinkleySpec extends SparkSpec {
  import spark.implicits._

  // Hand-folded expectation, delta=0, threshold=15:
  //   x=10: t=1 cx=10 mu=10 u=0  ph=0
  //   x=10: t=2 cx=20 mu=10 u=0  ph=0
  //   x=40: t=3 cx=60 mu=20 u=20 ph=20 → alarm
  //   x=0 : t=4 cx=60 mu=15 u=5  ph=5  (state carried across batches)
  test("PH statistic folds across batches with carried state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Point]
    val q = StreamPageHinkley.detect(in.toDS(), 0L, 15L)
      .writeStream.format("memory").queryName("sph").outputMode("append")
      .start()
    try {
      in.addData(Point("k", 1L, 10L), Point("k", 2L, 10L), Point("k", 3L, 40L))
      q.processAllAvailable()
      assert(spark.table("sph").as[PhOut].collect().toSet === Set(
        PhOut("k", 1L, 0L, false), PhOut("k", 2L, 0L, false),
        PhOut("k", 3L, 20L, true)))

      in.addData(Point("k", 4L, 0L))
      q.processAllAvailable()
      assert(spark.table("sph").as[PhOut].collect().toSet === Set(
        PhOut("k", 1L, 0L, false), PhOut("k", 2L, 0L, false),
        PhOut("k", 3L, 20L, true), PhOut("k", 4L, 5L, false)))
    } finally q.stop()
  }

  test("keys hold independent state; within-batch rows fold in time order") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Point]
    val q = StreamPageHinkley.detect(in.toDS(), 0L, 15L)
      .writeStream.format("memory").queryName("sph2").outputMode("append")
      .start()
    try {
      // arrival order reversed; event-time order is 10, 10, 40 (key a)
      in.addData(Point("a", 3L, 40L), Point("a", 1L, 10L), Point("a", 2L, 10L),
        Point("b", 1L, 100L))
      q.processAllAvailable()
      val got = spark.table("sph2").as[PhOut].collect().toSet
      assert(got === Set(
        PhOut("a", 1L, 0L, false), PhOut("a", 2L, 0L, false),
        PhOut("a", 3L, 20L, true),
        // key b alone: t=1 cx=100 mu=100 u=0 ph=0 — no alarm
        PhOut("b", 1L, 0L, false)))
    } finally q.stop()
  }

  test("matches the batch window-unroll twin on a replayed series") {
    implicit val sqlCtx = spark.sqlContext
    // series with a genuine level shift: 10×8 then 50×8, delta=1
    val xs = (1L to 8L).map(i => Point("k", i, 10L)) ++
      (9L to 16L).map(i => Point("k", i, 50L))
    val in = MemoryStream[Point]
    val q = StreamPageHinkley.detect(in.toDS(), 1L, 60L)
      .writeStream.format("memory").queryName("sph3").outputMode("append")
      .start()
    try {
      xs.grouped(5).foreach { g => in.addData(g: _*); q.processAllAvailable() }
      val stream = spark.table("sph3").as[PhOut].collect()
        .map(o => o.t_us -> (o.ph_e6, o.alarm)).toMap
      // independent batch recursion (the q_page_hinkley shape)
      var (t, cx, u, minu) = (0L, 0L, 0L, 0L)
      xs.sortBy(_.t_us).foreach { p =>
        t += 1; cx += p.x_e6; u += p.x_e6 - cx / t - 1L
        if (u < minu) minu = u
        assert(stream(p.t_us) === ((u - minu, u - minu > 60L)),
          s"mismatch at t=${p.t_us}")
      }
      assert(stream.size === xs.size)
    } finally q.stop()
  }
}
