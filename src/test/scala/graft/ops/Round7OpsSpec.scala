package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  // ── personalized PageRank ────────────────────────────────────────────

  test("pageRankPersonalized: mass flows only from the seed set") {
    // 1→2→3→1 cycle plus a source-less feeder 4→1; seed = node 1.
    val nodes = Seq((1L, true), (2L, false), (3L, false), (4L, false))
      .toDF("id", "is_src")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val got = Graph.pageRankPersonalized(nodes, edges, "is_src", 2)
      .as[(Long, Long)].collect().toMap
    // iter1: pr = (150000, 850000, 0, 0); iter2 shifts the wave one hop.
    assert(got === Map(1L -> 150000L, 2L -> 127500L, 3L -> 722500L, 4L -> 0L))
  }

  // ── convergence-detected PageRank ────────────────────────────────────

  test("pageRankConverged: symmetric 2-cycle converges after one round") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRankConverged(nodes, edges, 0L, 10)
      .as[(Long, Long, Long)].collect().toSet
    // uniform is stationary here: round 1 reproduces 1e6, delta = 0.
    assert(got === Set((1L, 1000000L, 1L), (2L, 1000000L, 1L)))
  }

  test("pageRankConverged: chain settles in three rounds at eps 0") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRankConverged(nodes, edges, 0L, 10)
      .as[(Long, Long, Long)].collect().toSet
    // r1: (150000, 1000000); r2: (150000, 277500); r3: unchanged → stop.
    assert(got === Set((1L, 150000L, 3L), (2L, 277500L, 3L)))
  }

  test("pageRankConverged: maxIters caps a non-converged run") {
    val nodes = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val rounds = Graph.pageRankConverged(nodes, edges, 0L, 2)
      .select(max(col("n_rounds"))).as[Long].first()
    assert(rounds === 2L)
  }

  // ── multi-seed PPR ───────────────────────────────────────────────────

  test("pageRankMultiSeed: each seed column is an independent PPR") {
    // 1→2→3→1 cycle; compare the seed-1 slice against the single-seed run.
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L).toDF("seed")
    val multi = Graph.pageRankMultiSeed(nodes, edges, seeds, 2)
      .as[(Long, Long, Long)].collect()
    val single = Graph.pageRankPersonalized(
        nodes.withColumn("is_src", col("id") === 1L), edges, "is_src", 2)
      .as[(Long, Long)].collect().toMap
    val seed1 = multi.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    assert(seed1 === single)
    // the seed-2 slice is the same ranking rotated one node forward
    val seed2 = multi.filter(_._2 == 2L).map(r => r._1 -> r._3).toMap
    assert(seed2 === Map(2L -> 150000L, 3L -> 127500L, 1L -> 722500L))
    assert(multi.length === 6)
  }

  // ── per-session funnels ──────────────────────────────────────────────

  private val steps = Seq("view", "click", "purchase")

  test("funnelSessions: gap splits sessions, stage is per-session") {
    val events = Seq(
      // u1: session @10 reaches stage 2; lone purchase @500 opens a fresh
      // session that never views → stage 0
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 500L, "purchase"),
      // u2: single-event session
      (2L, 5L, "view"),
      // u3: same-timestamp click cannot advance past the view (strict >)
      (3L, 10L, "view"), (3L, 10L, "click")
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelSessions(events, "user_id", "t_us",
        "event_type", steps, 100L)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 10L, 2), (1L, 500L, 0), (2L, 5L, 1), (3L, 10L, 1)))
  }

  test("funnelSessions: the funnel restarts from zero in each session") {
    val events = Seq(
      (1L, 10L, "view"),
      (1L, 200L, "view"), (1L, 250L, "click"), (1L, 300L, "purchase")
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelSessions(events, "user_id", "t_us",
        "event_type", steps, 100L)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 10L, 1), (1L, 200L, 3)))
  }

  test("funnelSessions: boundary gap (t - last == gap) stays in-session") {
    val events = Seq(
      (1L, 10L, "view"), (1L, 110L, "click"), // exactly gap apart → same session
      (1L, 211L, "purchase")                  // 101 > gap → new session
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelSessions(events, "user_id", "t_us",
        "event_type", steps, 100L)
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 10L, 2), (1L, 211L, 0)))
  }

  test("funnelConversion: rates are sessions reaching at least stage k") {
    val events = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"),   // session 1: stage 2
      (1L, 500L, "view"),                       // session 2: stage 1
      (2L, 5L, "other")                         // session 3: stage 0
    ).toDF("user_id", "t_us", "event_type")
    val got = Behavior.funnelConversion(events, "user_id", "t_us",
        "event_type", steps, 100L)
      .as[(Int, Long, Long)].collect().toSet
    // 3 sessions total: 2 reach ≥1, 1 reaches ≥2, 0 reach ≥3
    assert(got === Set((1, 2L, 666666L), (2, 1L, 333333L), (3, 0L, 0L)))
  }

  // ── sliding-horizon distinct ─────────────────────────────────────────

  test("slidingDistinct: trailing-horizon counts drop expired values") {
    val events = Seq(
      // u1: A@10, B@50, A@120, C@130 with horizon 100
      (1L, 1L, 10L, "A"),   // {A} → 1
      (2L, 1L, 50L, "B"),   // {A, B} → 2
      (3L, 1L, 120L, "A"),  // window (20, 120]: B@50, A@120 → 2 (A@10 expired)
      (4L, 1L, 130L, "C"),  // window (30, 130]: B, A, C → 3
      (5L, 1L, 400L, "B")   // everything expired → 1
    ).toDF("event_id", "user_id", "t_us", "event_type")
    val got = Behavior.slidingDistinct(events, "user_id", "t_us",
        "event_id", "event_type", 100L)
      .select("tie", "n_distinct").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L, 5L -> 1L))
  }

  test("slidingDistinct: boundary semantics — (t - H, t] window") {
    val events = Seq(
      (1L, 1L, 0L, "A"),
      (2L, 1L, 100L, "B"),  // A@0 at exact horizon edge: 100 - 100 = 0, NOT > 0 → expired
      (3L, 1L, 99L, "C")    // A@0 in (−1, 99] → counted
    ).toDF("event_id", "user_id", "t_us", "event_type")
    val got = Behavior.slidingDistinct(events, "user_id", "t_us",
        "event_id", "event_type", 100L)
      .select("tie", "n_distinct").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 3L -> 2L, 2L -> 2L))
  }

  test("slidingDistinct: duplicate values at one timestamp count once") {
    val events = Seq(
      (1L, 1L, 10L, "A"), (2L, 1L, 10L, "A"), (3L, 1L, 10L, "B")
    ).toDF("event_id", "user_id", "t_us", "event_type")
    val got = Behavior.slidingDistinct(events, "user_id", "t_us",
        "event_id", "event_type", 100L)
      .select("tie", "n_distinct").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  // ── 3-D skyline ──────────────────────────────────────────────────────

  test("skyline3D: dominance on (max x, min y, min z) with duplicates") {
    val pts = Seq(
      ("a", 3L, 5L, 5L), // dominated by b (same x, y; lower z)
      ("b", 3L, 5L, 4L),
      ("c", 2L, 6L, 1L),
      ("d", 4L, 7L, 7L),
      ("e", 2L, 6L, 1L), // duplicate of c — both survive
      ("f", 1L, 9L, 9L), // dominated by c
      ("g", 3L, 6L, 3L)  // same x as b, incomparable on (y, z)
    ).toDF("id", "x", "y", "z")
    val got = Skyline.skyline3D(pts, "x", "y", "z")
      .select("id").as[String].collect().toSet
    assert(got === Set("b", "c", "d", "e", "g"))
  }

  test("skyline3D: single point and totally-ordered chain") {
    val one = Seq(("a", 1L, 1L, 1L)).toDF("id", "x", "y", "z")
    assert(Skyline.skyline3D(one, "x", "y", "z").count() === 1L)
    val chain = Seq(("a", 1L, 3L, 3L), ("b", 2L, 2L, 2L), ("c", 3L, 1L, 1L))
      .toDF("id", "x", "y", "z")
    val got = Skyline.skyline3D(chain, "x", "y", "z")
      .select("id").as[String].collect().toSet
    assert(got === Set("c"))
  }

  // ── cumulative distinct ──────────────────────────────────────────────

  test("cumulativeDistinct: running distinct count per entity") {
    val events = Seq(
      (1L, 1L, 10L, "A"), (2L, 1L, 20L, "B"), (3L, 1L, 30L, "A"),
      (4L, 1L, 40L, "C"),
      (5L, 2L, 10L, "Z")
    ).toDF("event_id", "user_id", "t_us", "event_type")
    val got = Behavior.cumulativeDistinct(events, "user_id", "t_us",
        "event_id", "event_type")
      .select("event_id", "n_distinct").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L, 5L -> 1L))
  }

  test("cumulativeDistinct: timestamp ties break on the tie column") {
    val events = Seq(
      (1L, 3L, 10L, "A"), (2L, 3L, 10L, "B")
    ).toDF("event_id", "user_id", "t_us", "event_type")
    val got = Behavior.cumulativeDistinct(events, "user_id", "t_us",
        "event_id", "event_type")
      .select("event_id", "n_distinct").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L))
  }
}
