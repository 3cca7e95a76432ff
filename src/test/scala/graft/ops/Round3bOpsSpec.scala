package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-3 second batch: fixed-point BM25, exact-integer z-score
  * anomalies, bucket-blocked interval join, linear interpolation. */
class Round3bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ── Bm25 fixed-point log ─────────────────────────────────────────────

  test("log2E6 tracks true log2 within the 5-bit mantissa error bound") {
    val vals = Seq(1L, 2L, 3L, 7L, 1024L, 1025L, 65535L, 1L << 40, (1L << 40) + 12345L)
    val got = vals.toDF("v").select(col("v"), Bm25.log2E6(col("v")).as("l"))
      .as[(Long, Long)].collect().toMap
    vals.foreach { v =>
      val truth = math.log(v.toDouble) / math.log(2.0) * 1e6
      // piecewise-constant 5-bit mantissa: error < log2(1 + 1/32) ≈ 0.0443
      assert(math.abs(got(v) - truth) <= 45000.0,
        s"v=$v got=${got(v)} truth=$truth")
      assert(got(v) >= (truth - 45000).toLong && got(v) <= truth.toLong + 1,
        "piecewise-constant estimate must never exceed the true log")
    }
  }

  test("log2E6 seeded random sweep stays within the mantissa error bound") {
    val rnd = new scala.util.Random(42)
    val vals = Seq.fill(60)(1L + (rnd.nextDouble() * math.pow(2, 1 + rnd.nextInt(46))).toLong)
    val got = vals.distinct.toDF("v").select(col("v"), Bm25.log2E6(col("v")).as("l"))
      .as[(Long, Long)].collect()
    got.foreach { case (v, l) =>
      val truth = math.log(v.toDouble) / math.log(2.0) * 1e6
      assert(l <= truth + 1 && l >= truth - 45000,
        s"v=$v got=$l truth=$truth")
    }
  }

  test("bm25 ranks the term-stuffed doc first, absent-term docs score zero") {
    val docs = Seq(
      (1L, "spark spark spark spark tiny"),
      (2L, "spark appears once in a much longer document with many filler words here"),
      (3L, "no relevant terms at all in this one"),
      (4L, "spark spark and more words")).toDF("doc_id", "text")
    val top = Bm25.topK(docs, Seq("spark"), 4).as[(Long, Long)].collect()
    assert(top.head._1 == 1L, s"highest tf/shortest doc wins, got ${top.toSeq}")
    assert(!top.map(_._1).contains(3L), "docs without any query term don't score")
    assert(top.map(_._2).forall(_ > 0))
  }

  // ── Anomaly.zscoreProfile ────────────────────────────────────────────

  test("zscore profile flags a planted extreme value and only that") {
    val xs = Seq.fill(99)(10.0) :+ 1000.0
    val df = xs.zipWithIndex.map { case (v, i) => ("g", v) }.toDF("grp", "v")
    val out = Anomaly.zscoreProfile(df, "grp", "v")
      .as[(String, Long, Long)].collect().head
    assert(out._2 == 100 && out._3 == 1L, s"expected 1 outlier of 100, got $out")
    // uniform data → zero outliers
    val flat = Seq.fill(50)(("g", 5.0)).toDF("grp", "v")
    assert(Anomaly.zscoreProfile(flat, "grp", "v")
      .as[(String, Long, Long)].collect().head._3 == 0L)
  }

  // ── IntervalJoin ─────────────────────────────────────────────────────

  test("bucket-blocked interval self-join equals the naive theta join") {
    val rnd = new scala.util.Random(11)
    // ts spans negative epochs: bucket adjacency must hold across zero
    // under Spark's truncating div too
    val rows = (1L to 300L).map(i => (i % 7, i, rnd.nextInt(100000).toLong - 50000L))
    val df = rows.toDF("k", "id", "ts")
    val tol = 5000L
    val fast = IntervalJoin.selfPairsWithin(df, "k", "id", "ts", tol)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val naive = rows.flatMap { case (k1, i1, t1) =>
      rows.collect { case (k2, i2, t2)
        if k1 == k2 && i1 < i2 && math.abs(t1 - t2) <= tol => (i1, i2) }
    }.toSet
    assert(fast == naive, s"missing=${naive -- fast} extra=${fast -- naive}")
  }

  // ── Multimodal resize / frame sampling ───────────────────────────────

  test("resize stub keeps every stride-th byte, content-exact") {
    val df = Seq((1L, "abcdefghij"), (2L, "xy"))
      .toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val out = Multimodal.resizePartitions(df, 4)
      .select("doc_id", "resized").as[(Long, Array[Byte])].collect().toMap
    assert(new String(out(1L)) == "aei", "bytes 0,4,8")
    assert(new String(out(2L)) == "x")
  }

  test("frame sampling slices real bytes matching the arithmetic size law") {
    val text = "z" * 700 // 3 frames of 256: 256, 256, 188 → sampled idx 0, 2
    val df = Seq((9L, text)).toDF("doc_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val out = Multimodal.sampleFrames(df)
      .select("frame_idx", "frame_bytes").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 256L, 2L -> 188L), s"got $out")
  }

  // ── TimeSeries.interpolate ───────────────────────────────────────────

  test("interpolate fills a gap linearly and holds flat at the edges") {
    // observations at buckets 0 and 300s-spaced: v=10.00 at t=0, v=40.00 at t=900
    val ev = Seq(("a", 0L, 10.0), ("a", 900L, 40.0))
      .toDF("grp", "es", "v")
      .withColumn("ts", timestamp_seconds(col("es")))
    val rs = TimeSeries.resample(ev, "grp", "ts", "v", 300L)
    val out = TimeSeries.interpolate(rs, "grp", 300L)
      .select("bucket_es", "interp_e4").as[(Long, Long)].collect().toMap
    assert(out(0L) == 100000L && out(900L) == 400000L, s"endpoints exact: $out")
    assert(out(300L) == 200000L && out(600L) == 300000L, s"linear midpoints: $out")
  }
}
