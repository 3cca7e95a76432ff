package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Behavior, Graph, Skyline}

/** Round-7 extensions: personalized + convergence-detected PageRank,
  * per-session funnels, the 3-D skyline, and running distinct counts.
  * All-integer arithmetic throughout so every oracle is bit-exact.
  */
object Round7Queries {

  /** Unrolled DuckDB twin of [[Graph.pageRankPersonalized]]: the round-6
    * circulant graph (ring + even-node chords), restart mass concentrated
    * on ids divisible by 10. */
  private def pprSql(iters: Int): String = {
    val head =
      """WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
        |e AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes
        |      UNION ALL
        |      SELECT id AS src, (id * 7 + 3) % 100 AS dst FROM nodes WHERE id % 2 = 0),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
        |p0 AS (SELECT id, CAST(CASE WHEN id % 10 = 0 THEN 1000000 ELSE 0 END AS BIGINT) AS pr
        |       FROM nodes)""".stripMargin
    val its = (1 to iters).map { k =>
      s"""p$k AS (SELECT n.id, CAST(CASE WHEN n.id % 10 = 0 THEN 150000 ELSE 0 END
         |                         + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS pr
         |       FROM nodes n LEFT JOIN (SELECT ed.dst, sum(p.pr // ed.outdeg) AS s
         |                               FROM ed JOIN p${k - 1} p ON p.id = ed.src
         |                               GROUP BY ed.dst) m ON m.dst = n.id)""".stripMargin
    }
    (head +: its).mkString(",\n") + s"\nSELECT id, pr AS pr_e6 FROM p$iters"
  }

  /** Pure-Scala fixed-point simulation of the convergence-detected run on
    * the (SF-independent) 100-node asymmetric graph — computes how many
    * rounds the L1-delta loop executes, so the oracle can unroll exactly
    * that many CTEs. Mirrors [[Graph.pageRankConverged]] bit for bit:
    * truncating division on non-negative longs. */
  private def simulatedRounds(epsE6: Long, maxIters: Int): Int = {
    val nodes = 0 until 100
    val edges = (nodes.map(i => (i, (i + 1) % 100)) ++
      nodes.filter(_ % 3 == 0).map(i => (i, (i * i + 7) % 100))).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var pr = Array.fill(100)(1000000L)
    var k = 0
    var done = false
    while (k < maxIters && !done) {
      val mass = Array.fill(100)(0L)
      edges.foreach { case (s, d) => mass(d) += pr(s) / outdeg(s) }
      val next = Array.tabulate(100)(i => 150000L + (85L * mass(i)) / 100L)
      k += 1
      done = nodes.map(i => math.abs(next(i) - pr(i))).sum <= epsE6
      pr = next
    }
    k
  }

  /** Unrolled DuckDB twin of [[Graph.pageRankConverged]] on the asymmetric
    * graph (ring + every-third-node quadratic chords — NOT measure-
    * preserving, so the uniform start actually has to converge). */
  private def prConvergedSql(iters: Int): String = {
    val head =
      """WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
        |e AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes
        |      UNION
        |      SELECT id AS src, (id * id + 7) % 100 AS dst FROM nodes WHERE id % 3 = 0),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
        |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes)""".stripMargin
    val its = (1 to iters).map { k =>
      s"""p$k AS (SELECT n.id, CAST(150000 + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS pr
         |       FROM nodes n LEFT JOIN (SELECT ed.dst, sum(p.pr // ed.outdeg) AS s
         |                               FROM ed JOIN p${k - 1} p ON p.id = ed.src
         |                               GROUP BY ed.dst) m ON m.dst = n.id)""".stripMargin
    }
    (head +: its).mkString(",\n") +
      s"\nSELECT id, pr AS pr_e6, CAST($iters AS BIGINT) AS n_rounds FROM p$iters"
  }

  /** Unrolled (id, seed)-grain DuckDB twin of [[Graph.pageRankMultiSeed]]
    * on the asymmetric graph with seeds {0, 30, 60}. */
  private def multiSeedSql(iters: Int): String = {
    val head =
      """WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
        |e AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes
        |      UNION
        |      SELECT id AS src, (id * id + 7) % 100 AS dst FROM nodes WHERE id % 3 = 0),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
        |seeds AS (SELECT 0 AS seed UNION ALL SELECT 30 UNION ALL SELECT 60),
        |b AS (SELECT n.id, s.seed FROM nodes n CROSS JOIN seeds s),
        |p0 AS (SELECT id, seed,
        |              CAST(CASE WHEN id = seed THEN 1000000 ELSE 0 END AS BIGINT) AS pr
        |       FROM b)""".stripMargin
    val its = (1 to iters).map { k =>
      s"""p$k AS (SELECT b.id, b.seed,
         |         CAST(CASE WHEN b.id = b.seed THEN 150000 ELSE 0 END
         |              + (85 * COALESCE(m.s2, 0)) // 100 AS BIGINT) AS pr
         |       FROM b LEFT JOIN (SELECT ed.dst, p.seed, sum(p.pr // ed.outdeg) AS s2
         |                         FROM ed JOIN p${k - 1} p ON p.id = ed.src
         |                         GROUP BY ed.dst, p.seed) m
         |         ON m.dst = b.id AND m.seed = b.seed)""".stripMargin
    }
    (head +: its).mkString(",\n") + s"\nSELECT id, seed, pr AS pr_e6 FROM p$iters"
  }

  def defs: Seq[QueryDef] = Seq(

    // ── Personalized PageRank: restart vector concentrated on ids % 10 = 0
    //    — relevance-to-seeds ranking; sinks far from the seeds decay to 0.
    QueryDef("q_pagerank_personalized",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
          .withColumn("is_src", col("id") % 10 === 0)
        val edges = nodes
          .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"))
          .unionByName(nodes.filter(col("id") % 2 === 0)
            .select(col("id").as("src"), ((col("id") * 7 + 3) % 100).as("dst")))
        Graph.pageRankPersonalized(nodes, edges, "is_src", 4)
      },
      Some(pprSql(4))),

    // ── Convergence-detected PageRank: loop until the L1 delta falls to
    //    5e6 e6-units (7 rounds on this graph — the oracle unroll count
    //    comes from a pure-Scala simulation of the same integer fixpoint).
    QueryDef("q_pagerank_converged",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val edges = nodes
          .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"))
          .unionByName(nodes.filter(col("id") % 3 === 0)
            .select(col("id").as("src"),
              ((col("id") * col("id") + 7) % 100).as("dst")))
        Graph.pageRankConverged(nodes, edges, 5000000L, 50)
      },
      Some(prConvergedSql(simulatedRounds(5000000L, 50)))),

    // ── Per-session funnels: 1-hour inactivity gap splits each user's
    //    stream; the funnel restarts inside every session. One shuffle —
    //    sessionization rides the same fold as the stage machine.
    QueryDef("q_funnel_session",
      (s, d) => Behavior.funnelSessions(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_type", Seq("view", "click", "purchase"),
        3600000000L),
      Some("""WITH e AS (SELECT user_id AS entity, epoch_us(ts) AS t, event_type AS et FROM events),
             |o AS (SELECT entity, t, et,
             |        CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 3600000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e WINDOW w AS (PARTITION BY entity ORDER BY t, et)),
             |s AS (SELECT entity, t, et,
             |        CAST(sum(new_s) OVER (PARTITION BY entity ORDER BY t, et
             |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             |      FROM o),
             |g AS (SELECT entity, sid, min(t) AS session_start_us FROM s GROUP BY 1, 2),
             |s1 AS (SELECT entity, sid, min(t) AS t1 FROM s WHERE et = 'view' GROUP BY 1, 2),
             |s2 AS (SELECT s.entity, s.sid, min(t) AS t2 FROM s JOIN s1 USING (entity, sid)
             |       WHERE et = 'click' AND t > t1 GROUP BY 1, 2),
             |s3 AS (SELECT s.entity, s.sid, min(t) AS t3 FROM s JOIN s2 USING (entity, sid)
             |       WHERE et = 'purchase' AND t > t2 GROUP BY 1, 2)
             |SELECT g.entity, g.session_start_us,
             |       CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
             |FROM g LEFT JOIN s1 USING (entity, sid) LEFT JOIN s2 USING (entity, sid)
             |       LEFT JOIN s3 USING (entity, sid)""".stripMargin)),

    // ── 3-D skyline of customers: order count (max) vs cheapest order
    //    (min) vs first-purchase epoch (min) — "prolific, cheap, early".
    //    The oracle affords the quadratic NOT-EXISTS; the engine runs
    //    level-reduce → per-x sweep → small broadcast anti-join.
    QueryDef("q_skyline_3d",
      (s, d) => {
        val pts = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            min(floor(col("o_totalprice") * 100 + 0.5)).as("min_price_cents"),
            min(unix_timestamp(col("o_orderdate"))).as("first_s"))
        Skyline.skyline3D(pts, "n_orders", "min_price_cents", "first_s")
      },
      Some("""WITH pts AS (SELECT o_custkey, count(*) AS n_orders,
             |                    min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS min_price_cents,
             |                    CAST(min(epoch(o_orderdate)) AS BIGINT) AS first_s
             |             FROM orders GROUP BY 1)
             |SELECT p.o_custkey, p.n_orders, p.min_price_cents, p.first_s
             |FROM pts p
             |WHERE NOT EXISTS (SELECT 1 FROM pts q
             |  WHERE q.n_orders >= p.n_orders AND q.min_price_cents <= p.min_price_cents
             |    AND q.first_s <= p.first_s
             |    AND (q.n_orders > p.n_orders OR q.min_price_cents < p.min_price_cents
             |         OR q.first_s < p.first_s))""".stripMargin)),

    // ── Multi-seed PPR: relevance of every node to seeds {0, 30, 60}
    //    computed in one pass on the (id, seed) grain — 3 PPR questions,
    //    one round-shape. Oracle unrolls the same grain.
    QueryDef("q_pagerank_multiseed",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val edges = nodes
          .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"))
          .unionByName(nodes.filter(col("id") % 3 === 0)
            .select(col("id").as("src"),
              ((col("id") * col("id") + 7) % 100).as("dst")))
        val seeds = nodes.filter(col("id").isin(0, 30, 60))
          .select(col("id").as("seed"))
        Graph.pageRankMultiSeed(nodes, edges, seeds, 3)
      },
      Some(multiSeedSql(3))),

    // ── Per-stage session conversion rates: one single-row aggregate over
    //    the session table, unpivoted to a row per stage.
    QueryDef("q_funnel_rates",
      (s, d) => Behavior.funnelConversion(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_type", Seq("view", "click", "purchase"),
        3600000000L),
      Some("""WITH e AS (SELECT user_id AS entity, epoch_us(ts) AS t, event_type AS et FROM events),
             |o AS (SELECT entity, t, et,
             |        CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 3600000000
             |             THEN 1 ELSE 0 END AS new_s
             |      FROM e WINDOW w AS (PARTITION BY entity ORDER BY t, et)),
             |s AS (SELECT entity, t, et,
             |        CAST(sum(new_s) OVER (PARTITION BY entity ORDER BY t, et
             |                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             |      FROM o),
             |s1 AS (SELECT entity, sid, min(t) AS t1 FROM s WHERE et = 'view' GROUP BY 1, 2),
             |s2 AS (SELECT s.entity, s.sid, min(t) AS t2 FROM s JOIN s1 USING (entity, sid)
             |       WHERE et = 'click' AND t > t1 GROUP BY 1, 2),
             |s3 AS (SELECT s.entity, s.sid, min(t) AS t3 FROM s JOIN s2 USING (entity, sid)
             |       WHERE et = 'purchase' AND t > t2 GROUP BY 1, 2),
             |st AS (SELECT g.entity, g.sid,
             |         CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |              WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
             |       FROM (SELECT DISTINCT entity, sid FROM s) g
             |         LEFT JOIN s1 USING (entity, sid) LEFT JOIN s2 USING (entity, sid)
             |         LEFT JOIN s3 USING (entity, sid)),
             |a AS (SELECT CAST(count(*) AS BIGINT) AS total,
             |        CAST(sum(CASE WHEN stage >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             |        CAST(sum(CASE WHEN stage >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             |        CAST(sum(CASE WHEN stage >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
             |      FROM st)
             |SELECT 1 AS stage, n1 AS n_sessions, n1 * 1000000 // total AS rate_e6 FROM a
             |UNION ALL SELECT 2, n2, n2 * 1000000 // total FROM a
             |UNION ALL SELECT 3, n3, n3 * 1000000 // total FROM a""".stripMargin)),

    // ── Trailing-24h distinct event-type count at every event, via the
    //    interval-stabbing +1/−1 identity (one exchange; the oracle pays
    //    the quadratic correlated subquery instead).
    QueryDef("q_sliding_distinct",
      (s, d) => Behavior.slidingDistinct(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_id", "event_type", 86400000000L)
        .select(col("tie").as("event_id"), col("entity").as("user_id"),
          col("n_distinct")),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, event_type AS et FROM events)
             |SELECT e.event_id, e.user_id,
             |       (SELECT CAST(count(DISTINCT e2.et) AS BIGINT) FROM e e2
             |        WHERE e2.user_id = e.user_id
             |          AND e2.t > e.t - 86400000000 AND e2.t <= e.t) AS n_distinct
             |FROM e""".stripMargin)),

    // ── Running distinct event-type count per user at every event — the
    //    first-occurrence-flag + running-sum identity, one exchange.
    QueryDef("q_cum_distinct",
      (s, d) => Behavior.cumulativeDistinct(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_id", "event_type")
        .select(col("event_id"), col("user_id"), col("n_distinct")),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t, event_type AS et FROM events),
             |f AS (SELECT event_id, user_id, t,
             |        CASE WHEN lag(et) OVER (PARTITION BY user_id ORDER BY et, t, event_id)
             |               IS DISTINCT FROM et THEN 1 ELSE 0 END AS is_first
             |      FROM e)
             |SELECT event_id, user_id,
             |       CAST(sum(is_first) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct
             |FROM f""".stripMargin))
  )
}
