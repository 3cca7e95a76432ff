package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.ops.{Anomaly, Bm25, Dedup, Graph, Identity, Incremental, Ranking, Similarity, TimeSeries}

/** Round-10 extensions: end-to-end hybrid retrieval (BM25 ∪ cosine →
  * RRF), binary retrieval metrics, and min/max incremental maintenance.
  */
object Round10Queries {

  /** The q_bm25_topk oracle pipeline as CTE text, LIMIT `k`. */
  private def bm25Sql(k: Int): String = {
    val log2 = Bm25.log2E6Sql("v")
    s"""bm_dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |          FROM documents),
       |bm_n AS (SELECT count(*) AS n FROM documents),
       |bm_l AS (SELECT CAST(sum(dl) AS BIGINT) AS l FROM bm_dl),
       |bm_tf AS (SELECT doc_id, wd AS word, count(*) AS tf
       |          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents) u
       |          WHERE wd IN ('spark', 'join', 'fast')
       |          GROUP BY 1, 2),
       |bm_df AS (SELECT word, count(*) AS bm_df FROM bm_tf GROUP BY 1),
       |bm_df2 AS (SELECT word, bm_df,
       |                  1024 + (1024 * (2 * (bm_n.n - bm_df) + 1)) // (2 * bm_df + 1) AS v
       |           FROM bm_df, bm_n),
       |bm_idf AS (SELECT word, CAST($log2 - 10000000 AS BIGINT) AS idf_e6 FROM bm_df2),
       |bm_sc AS (SELECT bm_tf.doc_id,
       |                 CAST((bm_idf.idf_e6 * 44 * bm_l.l * bm_tf.tf)
       |                   // (20 * bm_l.l * bm_tf.tf + 6 * bm_l.l
       |                       + 18 * bm_dl.dl * bm_n.n) AS BIGINT) AS term_score
       |          FROM bm_tf JOIN bm_idf USING (word) JOIN bm_dl USING (doc_id), bm_n, bm_l),
       |bm_top AS (SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_e6
       |           FROM bm_sc GROUP BY 1
       |           ORDER BY score_e6 DESC, doc_id ASC LIMIT $k)""".stripMargin
  }

  /** Unrolled k-truss peeling oracle on the broken-ring graph (same
    * graph as q_kcore); MATERIALIZED against exponential CTE inlining.
    * Support of edge (a,b) = common in-truss neighbors of a and b. */
  private def kTrussSql(k: Int, rounds: Int): String = {
    val head =
      """WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
        |raw AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes WHERE id % 7 <> 0
        |        UNION
        |        SELECT id AS src, (id * id + 7) % 100 AS dst FROM nodes WHERE id % 3 = 0),
        |e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |       FROM raw WHERE src <> dst)""".stripMargin
    def supSql(i: Int): String =
      s"""(SELECT e.a, e.b, count(*) AS support
         | FROM e$i e
         | JOIN (SELECT a AS u, b AS v FROM e$i UNION ALL SELECT b, a FROM e$i) na
         |   ON e.a = na.u
         | JOIN (SELECT a AS u, b AS v FROM e$i UNION ALL SELECT b, a FROM e$i) nb
         |   ON e.b = nb.u AND na.v = nb.v
         | GROUP BY e.a, e.b)""".stripMargin
    val its = (1 to rounds).map { i =>
      s"""e$i AS MATERIALIZED (SELECT a, b FROM ${supSql(i - 1)} s
         |       WHERE support >= ${k - 2})""".stripMargin
    }
    (head +: its).mkString(",\n") +
      s"\nSELECT a, b, CAST(support AS BIGINT) AS support FROM ${supSql(rounds)} s"
  }

  def defs: Seq[QueryDef] = Seq(

    // ── 3-truss of the broken-ring graph: each surviving edge needs at
    //    least one in-truss triangle (support ≥ k−2 = 1), so
    //    chord-crossings survive and triangle-free chains evaporate.
    QueryDef("q_ktruss",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val edges = nodes.filter(col("id") % 7 =!= 0)
          .select(col("id").as("a"), ((col("id") + 1) % 100).as("b"))
          .unionByName(nodes.filter(col("id") % 3 === 0)
            .select(col("id").as("a"), ((col("id") * col("id") + 7) % 100).as("b")))
        Graph.kTruss(edges, 3, 8)
      },
      Some(kTrussSql(3, 8))),

    // ── Length-scaled similarity join: τ steps down from 0.5 (short
    //    docs) to 0.15 (long docs) on the smaller side's size; the
    //    oracle applies the same bands to the naive all-pairs join.
    QueryDef("q_jaccard_adaptive",
      (s, d) => {
        val bands = s.createDataFrame(Seq(
          (0L, 40L, 500000L), (40L, 80L, 300000L),
          (80L, 1000000000L, 150000L)))
          .toDF("len_lo", "len_hi", "tau_e6")
        Dedup.jaccardPrefixJoinAdaptive(
          Tables.documents(s, d).filter(col("doc_id") < 80)
            .select(col("doc_id"), col("text")), bands)
      },
      Some("""WITH w AS (SELECT DISTINCT doc_id, wd AS word
             |           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
             |                 FROM documents WHERE doc_id < 80) u
             |           WHERE wd <> ''),
             |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM w GROUP BY doc_id),
             |bands(len_lo, len_hi, tau_e6) AS (VALUES (0, 40, 500000),
             |        (40, 80, 300000), (80, 1000000000, 150000)),
             |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |                 CAST(count(*) AS BIGINT) AS inter
             |          FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
             |          GROUP BY 1, 2)
             |SELECT i.doc_a, i.doc_b, i.inter,
             |       sa.sz + sb.sz - i.inter AS uni,
             |       CAST(bands.tau_e6 AS BIGINT) AS tau_applied_e6
             |FROM inter i
             |JOIN sizes sa ON sa.doc_id = i.doc_a
             |JOIN sizes sb ON sb.doc_id = i.doc_b
             |JOIN bands ON least(sa.sz, sb.sz) >= bands.len_lo
             |          AND least(sa.sz, sb.sz) < bands.len_hi
             |WHERE i.inter * 1000000 >= bands.tau_e6 * (sa.sz + sb.sz - i.inter)""".stripMargin)),

    // ── KMV sketch maintenance: per-type distinct-user sketches under a
    //    value-level change feed — inserts merge, deletes inside the
    //    sketch horizon rebuild their group; oracle rebuilds everything.
    QueryDef("q_kmv_maintain",
      (s, d) => {
        val eu = Tables.events(s, d)
          .select(col("event_type").as("g"), col("user_id").as("v")).distinct()
        val base = eu.filter(col("v") % 10 =!= 0)
          .select(col("g"),
            Dedup.hash48(col("v").cast("string"), lit("kmv")).as("h"))
          .groupBy(col("g"))
          .agg(slice(array_sort(collect_set(col("h"))), 1, 64).as("sketch"))
        val changes = eu.filter(col("v") % 10 === 0)
          .select(col("g"), col("v"), lit(1L).as("op"))
          .unionByName(eu.filter(col("v") % 10 =!= 0 && col("v") % 7 === 0)
            .select(col("g"), col("v"), lit(-1L).as("op")))
        val raw = eu.filter(col("v") % 10 === 0 || col("v") % 7 =!= 0)
        // Driver-portability: the checker's pandas sort cannot hash list
        // cells, so project the sketch to a CSV string at the API edge
        // (the library form keeps the array — q_collect_ops precedent).
        Incremental.maintainKmv(base, changes, raw, 64)
          .withColumn("sketch",
            concat_ws(",", col("sketch").cast("array<string>")))
      },
      Some {
        val h = PortableSql.hash48("CAST(u AS VARCHAR)", "'kmv'")
        s"""WITH eu AS (SELECT DISTINCT event_type AS g, user_id AS u FROM events),
           |fin AS (SELECT g, u FROM eu WHERE u % 10 = 0 OR u % 7 <> 0),
           |hs AS (SELECT DISTINCT g, $h AS hh FROM fin),
           |r AS (SELECT g, hh,
           |             row_number() OVER (PARTITION BY g ORDER BY hh) AS rn,
           |             count(*) OVER (PARTITION BY g) AS nh
           |      FROM hs),
           |sk AS (SELECT g, list(hh ORDER BY hh) FILTER (WHERE rn <= 64) AS sketch,
           |              max(nh) AS nh,
           |              min(CASE WHEN rn = 64 THEN hh END) AS kth
           |       FROM r GROUP BY g)
           |SELECT g, array_to_string(sketch, ',') AS sketch,
           |       CAST(CASE WHEN nh < 64 THEN nh
           |            ELSE 63 * 281474976710656 // kth END AS BIGINT) AS est
           |FROM sk""".stripMargin
      }),

    // ── Trailing-window maintenance: slide a 30-day grouped aggregate
    //    forward 7 days WITHOUT rescanning the window — new days are
    //    inserts, aged-out days are deletes, both through the same
    //    delta-merge. Oracle recomputes the slid window directly.
    QueryDef("q_incremental_window",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          col("o_orderpriority").as("g"),
          expr("unix_timestamp(o_orderdate) div 86400").as("day"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
        val d0 = o.agg(min(col("day")).as("d0"))
        val w = o.crossJoin(broadcast(d0))
        val base = w.filter(col("day") >= col("d0") && col("day") < col("d0") + 30)
          .groupBy(col("g"))
          .agg(count(lit(1)).as("cnt"), sum(col("v")).as("total"))
        val changes = w
          .filter(col("day") >= col("d0") + 30 && col("day") < col("d0") + 37)
          .select(col("g"), col("v"), lit(1L).as("op"))
          .unionByName(w
            .filter(col("day") >= col("d0") && col("day") < col("d0") + 7)
            .select(col("g"), col("v"), lit(-1L).as("op")))
        Incremental.maintainAgg(base, changes)
      },
      Some("""WITH o AS (SELECT o_orderpriority AS g,
             |                 epoch(o_orderdate) // 86400 AS day,
             |                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
             |           FROM orders),
             |d0 AS (SELECT min(day) AS d0 FROM o)
             |SELECT g, CAST(count(*) AS BIGINT) AS cnt,
             |       CAST(sum(v) AS BIGINT) AS total
             |FROM o, d0
             |WHERE day >= d0.d0 + 7 AND day < d0.d0 + 37
             |GROUP BY g""".stripMargin)),

    // ── Maximal triangles on the broken-ring graph: triads no fourth
    //    vertex completes — wedge join + one maximality anti-join.
    QueryDef("q_maximal_triangles",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val edges = nodes.filter(col("id") % 7 =!= 0)
          .select(col("id").as("a"), ((col("id") + 1) % 100).as("b"))
          .unionByName(nodes.filter(col("id") % 3 === 0)
            .select(col("id").as("a"), ((col("id") * col("id") + 7) % 100).as("b")))
        Graph.maximalTriangles(edges)
      },
      Some("""WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
             |raw AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes WHERE id % 7 <> 0
             |        UNION
             |        SELECT id AS src, (id * id + 7) % 100 AS dst FROM nodes WHERE id % 3 = 0),
             |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             |      FROM raw WHERE src <> dst),
             |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
             |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
             |        FROM e e1 JOIN e e2 ON e1.b = e2.a
             |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
             |SELECT t.x, t.y, t.z FROM tri t
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM adj wx
             |  JOIN adj wy ON wy.u = t.y AND wy.v = wx.v
             |  JOIN adj wz ON wz.u = t.z AND wz.v = wx.v
             |  WHERE wx.u = t.x)""".stripMargin)),

    // ── Per-identity funnel: the stitched view→click→purchase machine —
    //    cross-device conversions count.
    QueryDef("q_identity_funnel",
      (s, d) => {
        val ev = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
        val devices = ev.select(col("user_id").as("id")).distinct()
        val links = devices.as("x").join(devices.as("y"),
            col("y.id") === col("x.id") + 1 && col("x.id") % 5 === 0)
          .select(col("x.id").as("a"), col("y.id").as("b"))
        Identity.stitchFunnel(ev, "user_id", "t_us", "event_type", links,
          Seq("view", "click", "purchase"))
      },
      Some("""WITH RECURSIVE ev0 AS (SELECT user_id AS device, epoch_us(ts) AS t,
             |                       event_type AS et FROM events),
             |devices AS (SELECT DISTINCT device AS id FROM ev0),
             |l0 AS (SELECT x.id AS a, y.id AS b FROM devices x
             |       JOIN devices y ON y.id = x.id + 1 WHERE x.id % 5 = 0),
             |e2 AS (SELECT a, b FROM l0 UNION ALL SELECT b, a FROM l0),
             |reach(id, label) AS (
             |  SELECT id, id FROM devices
             |  UNION
             |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id),
             |cc AS (SELECT id, min(label) AS identity FROM reach GROUP BY id),
             |e AS (SELECT cc.identity AS entity, ev0.t, ev0.et
             |      FROM ev0 JOIN cc ON cc.id = ev0.device),
             |u AS (SELECT DISTINCT entity FROM e),
             |s1 AS (SELECT entity, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
             |s2 AS (SELECT e.entity, min(t) AS t2 FROM e JOIN s1 USING (entity)
             |       WHERE et = 'click' AND t > t1 GROUP BY 1),
             |s3 AS (SELECT e.entity, min(t) AS t3 FROM e JOIN s2 USING (entity)
             |       WHERE et = 'purchase' AND t > t2 GROUP BY 1)
             |SELECT entity AS identity,
             |       CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
             |FROM u LEFT JOIN s1 USING (entity) LEFT JOIN s2 USING (entity)
             |       LEFT JOIN s3 USING (entity)""".stripMargin)),

    // ── Multi-series clock alignment: all event types forward-filled
    //    onto one 6-hour grid (last-known value per tick, NULL before a
    //    series starts). Oracle is DuckDB's native ASOF join.
    QueryDef("q_align_clock",
      (s, d) => TimeSeries.alignClock(
        Tables.events(s, d)
          .withColumn("t_s", expr("unix_micros(ts) div 1000000"))
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "t_s", "event_id", "cents", 21600L),
      Some("""WITH obs AS (SELECT event_type AS series, epoch_us(ts) // 1000000 AS t,
             |                    arg_max(CAST(floor(value * 100 + 0.5) AS BIGINT),
             |                            event_id) AS c
             |             FROM events GROUP BY 1, 2),
             |b AS (SELECT min(t) AS t0, max(t) AS t1
             |      FROM (SELECT epoch_us(ts) // 1000000 AS t FROM events)),
             |ticks AS (SELECT unnest(generate_series((b.t0 // 21600) * 21600,
             |                                        b.t1, 21600)) AS t FROM b),
             |grid AS (SELECT s.series, ticks.t
             |         FROM (SELECT DISTINCT series FROM obs) s CROSS JOIN ticks)
             |SELECT grid.series, grid.t AS bucket_es, obs.c AS v_cents
             |FROM grid ASOF LEFT JOIN obs
             |  ON obs.series = grid.series AND obs.t <= grid.t""".stripMargin)),

    // ── Identity stitching end-to-end: devices d and d+1 link when
    //    d % 5 = 0 → connected components → events re-keyed by resolved
    //    identity → 30-min gap sessions. Stitched sessions merge visits
    //    that per-device sessionization would split.
    QueryDef("q_identity_stitch",
      (s, d) => {
        val ev = Tables.events(s, d).withColumn("t_us", unix_micros(col("ts")))
        val devices = ev.select(col("user_id").as("id")).distinct()
        val links = devices.as("x").join(devices.as("y"),
            col("y.id") === col("x.id") + 1 && col("x.id") % 5 === 0)
          .select(col("x.id").as("a"), col("y.id").as("b"))
        Identity.stitchSessions(ev, "user_id", "t_us", links,
          30L * 60 * 1000000)
      },
      Some("""WITH RECURSIVE ev AS (SELECT user_id AS device, epoch_us(ts) AS t
             |                      FROM events),
             |devices AS (SELECT DISTINCT device AS id FROM ev),
             |l0 AS (SELECT x.id AS a, y.id AS b FROM devices x
             |       JOIN devices y ON y.id = x.id + 1 WHERE x.id % 5 = 0),
             |e2 AS (SELECT a, b FROM l0 UNION ALL SELECT b, a FROM l0),
             |reach(id, label) AS (
             |  SELECT id, id FROM devices
             |  UNION
             |  SELECT e2.b, r.label FROM reach r JOIN e2 ON e2.a = r.id),
             |cc AS (SELECT id, min(label) AS identity FROM reach GROUP BY id),
             |nd AS (SELECT identity, CAST(count(*) AS BIGINT) AS n_devices
             |       FROM cc GROUP BY 1),
             |sess AS (SELECT cc.identity, ev.t,
             |                CASE WHEN lag(ev.t) OVER (PARTITION BY cc.identity
             |                                          ORDER BY ev.t) IS NULL
             |                       OR ev.t - lag(ev.t) OVER (PARTITION BY cc.identity
             |                                                 ORDER BY ev.t)
             |                          > 1800000000
             |                     THEN 1 ELSE 0 END AS brk
             |         FROM ev JOIN cc ON cc.id = ev.device)
             |SELECT s.identity, nd.n_devices, CAST(count(*) AS BIGINT) AS n_events,
             |       CAST(sum(s.brk) AS BIGINT) AS n_sessions
             |FROM sess s JOIN nd USING (identity)
             |GROUP BY s.identity, nd.n_devices""".stripMargin)),

    // ── Widest (maximum-bottleneck) paths from seeds {0, 50} over the
    //    variable-width ring + width-4 chords, ≤ 8 hops.
    QueryDef("q_widest_paths",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
          .withColumn("is_src", col("id") % 50 === 0)
        val edges = nodes
          .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"),
            (lit(1L) + col("id") % 5).as("w"))
          .unionByName(nodes.filter(col("id") % 3 === 0)
            .select(col("id").as("src"),
              ((col("id") * col("id") + 7) % 100).as("dst"), lit(4L).as("w")))
        Graph.widestPaths(nodes, edges, "is_src", 8)
      },
      Some(("""WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
             |e AS (SELECT src, dst, max(w) AS w FROM (
             |        SELECT id AS src, (id + 1) % 100 AS dst, 1 + id % 5 AS w FROM nodes
             |        UNION ALL
             |        SELECT id AS src, (id * id + 7) % 100 AS dst, 4 AS w
             |        FROM nodes WHERE id % 3 = 0) u
             |      GROUP BY src, dst),
             |wp AS (
             |  SELECT id, CAST(9223372036854775807 AS BIGINT) AS cap, 0 AS hops
             |  FROM nodes WHERE id % 50 = 0
             |  UNION
             |  SELECT e.dst AS id, least(wp.cap, CAST(e.w AS BIGINT)) AS cap,
             |         wp.hops + 1 AS hops
             |  FROM wp JOIN e ON e.src = wp.id WHERE wp.hops < 8)
             |SELECT id, max(cap) AS cap FROM wp GROUP BY id""".stripMargin)
        .replaceFirst("WITH ", "WITH RECURSIVE "))),

    // ── Day-of-week seasonal profile of event values per type: per-dow
    //    truncated mean + cross-multiplied seasonal lift.
    QueryDef("q_seasonal_profile",
      (s, d) => TimeSeries.seasonalProfile(
        Tables.events(s, d)
          .withColumn("t_us", unix_micros(col("ts")))
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "t_us", "cents"),
      Some("""WITH e AS (SELECT event_type AS key,
             |                 ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
             |                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             |           FROM events),
             |pd AS (SELECT key, dow, CAST(count(*) AS BIGINT) AS n,
             |              CAST(sum(c) AS BIGINT) AS s
             |       FROM e GROUP BY key, dow),
             |pk AS (SELECT key, CAST(count(*) AS BIGINT) AS n_all,
             |              CAST(sum(c) AS BIGINT) AS s_all
             |       FROM e GROUP BY key)
             |SELECT pd.key, pd.dow, pd.n, pd.s // pd.n AS mean_cents,
             |       CAST((CAST(pd.s AS HUGEINT) * pk.n_all * 1000000)
             |            // (CAST(pd.n AS HUGEINT) * pk.s_all) AS BIGINT) AS lift_e6
             |FROM pd JOIN pk ON pk.key = pd.key""".stripMargin)),

    // ── Two-level binary segmentation: the dominant split per type plus
    //    the best split inside each resulting half.
    QueryDef("q_binary_segmentation",
      (s, d) => Anomaly.binarySegmentation(
        Tables.events(s, d)
          .withColumn("t_us", unix_micros(col("ts")))
          .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long")),
        "event_type", "t_us", "event_id", "cents"),
      Some("""WITH e AS (SELECT event_type AS key, epoch_us(ts) AS t, event_id AS tie,
             |                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
             |           FROM events),
             |w1 AS (SELECT key, t, tie,
             |              row_number() OVER (PARTITION BY key ORDER BY t, tie) AS rn,
             |              sum(c) OVER (PARTITION BY key ORDER BY t, tie
             |                           ROWS UNBOUNDED PRECEDING) AS s1,
             |              CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n,
             |              sum(c) OVER (PARTITION BY key) AS s
             |       FROM e),
             |sc1 AS (SELECT key, t, tie, rn, n,
             |               abs(s1 * (n - rn) - (s - s1) * rn) * 1000000
             |                 // (rn * (n - rn)) AS score
             |        FROM w1 WHERE rn < n),
             |b1 AS (SELECT key, t AS s_t, tie AS s_tie, score, n FROM (
             |         SELECT *, row_number() OVER (PARTITION BY key
             |                    ORDER BY score DESC, rn ASC) AS pick FROM sc1)
             |       WHERE pick = 1),
             |tag AS (SELECT e.key, e.t, e.tie, e.c,
             |               CASE WHEN e.t < b1.s_t
             |                      OR (e.t = b1.s_t AND e.tie <= b1.s_tie)
             |                    THEN 0 ELSE 1 END AS side
             |        FROM e JOIN b1 ON b1.key = e.key),
             |w2 AS (SELECT key, side, t, tie,
             |              row_number() OVER (PARTITION BY key, side ORDER BY t, tie) AS rn,
             |              sum(c) OVER (PARTITION BY key, side ORDER BY t, tie
             |                           ROWS UNBOUNDED PRECEDING) AS s1,
             |              CAST(count(*) OVER (PARTITION BY key, side) AS BIGINT) AS n,
             |              sum(c) OVER (PARTITION BY key, side) AS s
             |       FROM tag),
             |sc2 AS (SELECT key, side, t, rn, n,
             |               abs(s1 * (n - rn) - (s - s1) * rn) * 1000000
             |                 // (rn * (n - rn)) AS score
             |        FROM w2 WHERE rn < n),
             |b2 AS (SELECT key, side, t, score, n FROM (
             |         SELECT *, row_number() OVER (PARTITION BY key, side
             |                    ORDER BY score DESC, rn ASC) AS pick FROM sc2)
             |       WHERE pick = 1)
             |SELECT key, CAST(1 AS BIGINT) AS level, CAST(-1 AS BIGINT) AS side,
             |       s_t AS split_t, CAST(score AS BIGINT) AS score_e6, n FROM b1
             |UNION ALL
             |SELECT key, CAST(2 AS BIGINT), CAST(side AS BIGINT), t,
             |       CAST(score AS BIGINT), n FROM b2""".stripMargin)),

    // ── Hybrid retrieval end-to-end: BM25 top-20 (lexical) fused with
    //    cosine top-20 (vector) by reciprocal rank — doc_id and vec_id
    //    share the id space, so consensus ids float to the top.
    QueryDef("q_hybrid_retrieval",
      (s, d) => {
        val bm = Bm25.topK(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          Seq("spark", "join", "fast"), 20)
          .select(col("doc_id").as("id"), row_number().over(
            Window.orderBy(col("score_e6").desc, col("doc_id")))
            .cast("long").as("rank"))
        val e = Similarity.cast(Tables.embeddings(s, d))
        val cosList = Similarity.topK(
          e.filter(col("vec_id") > 0).select(col("vec_id"), col("ev")),
          e.filter(col("vec_id") === 0).select(col("ev").as("qv")), 20)
          .select(col("vec_id").as("id"), row_number().over(
            Window.orderBy(col("cos").desc, col("vec_id")))
            .cast("long").as("rank"))
        Ranking.rrf(Seq(bm, cosList), 60L)
      },
      Some(s"""WITH ${bm25Sql(20)},
             |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
             |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings WHERE vec_id > 0),
             |cos_top AS (SELECT vec_id,
             |                   round(list_dot_product(ev, qv) /
             |                         (sqrt(list_dot_product(ev, ev)) * sqrt(list_dot_product(qv, qv))), 6) AS cos
             |            FROM ev, qv ORDER BY cos DESC, vec_id ASC LIMIT 20),
             |r1 AS (SELECT doc_id AS id,
             |              row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rank
             |       FROM bm_top),
             |r2 AS (SELECT vec_id AS id,
             |              row_number() OVER (ORDER BY cos DESC, vec_id) AS rank
             |       FROM cos_top),
             |c AS (SELECT id, 1000000 // (60 + rank) AS c FROM r1
             |      UNION ALL SELECT id, 1000000 // (60 + rank) FROM r2)
             |SELECT id, CAST(sum(c) AS BIGINT) AS score_e6,
             |       CAST(count(*) AS BIGINT) AS n_lists
             |FROM c GROUP BY id""".stripMargin)),

    // ── Precision@10 and MRR per priority class on the same synthetic
    //    relevance as q_ndcg.
    QueryDef("q_retrieval_metrics",
      (s, d) => Ranking.retrievalMetrics(
        Tables.orders(s, d).select(col("o_orderpriority").as("g"),
          row_number().over(Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey")))
            .cast("long").as("rank"),
          (col("o_orderkey") % 4).as("rel")),
        "g", "rank", "rel", 10),
      Some("""WITH r AS (SELECT o_orderpriority AS g,
             |                  CAST(row_number() OVER (PARTITION BY o_orderpriority
             |                       ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank,
             |                  CAST(o_orderkey % 4 AS BIGINT) AS rel
             |           FROM orders)
             |SELECT g,
             |       CAST(sum(CASE WHEN rank <= 10 AND rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |         AS n_rel_at_k,
             |       CAST(min(CASE WHEN rel > 0 THEN rank END) AS BIGINT) AS first_rel_rank,
             |       CAST(sum(CASE WHEN rank <= 10 AND rel > 0 THEN 1 ELSE 0 END)
             |            * 1000000 // 10 AS BIGINT) AS prec_e6,
             |       CAST(1000000 // min(CASE WHEN rel > 0 THEN rank END) AS BIGINT) AS mrr_e6
             |FROM r GROUP BY g""".stripMargin)),

    // ── Min/max maintenance under a change feed: deletes that hit the
    //    standing extreme rebuild ONLY their group from the post-change
    //    rows; the oracle recomputes everything directly.
    QueryDef("q_incremental_minmax",
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_orderpriority").as("g"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("v"))
        val base = o.filter(col("o_orderkey") % 10 =!= 0)
          .groupBy(col("g")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
        val changes = o.filter(col("o_orderkey") % 10 === 0)
          .select(col("g"), col("v"), lit(1L).as("op"))
          .unionByName(o.filter(col("o_orderkey") % 10 =!= 0 &&
              col("o_orderkey") % 7 === 0)
            .select(col("g"), col("v"), lit(-1L).as("op")))
        val raw = o.filter(col("o_orderkey") % 10 === 0 ||
            col("o_orderkey") % 7 =!= 0)
          .select(col("g"), col("v"))
        Incremental.maintainMinMax(base, changes, raw)
      },
      Some("""SELECT o_orderpriority AS g,
             |       CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mn,
             |       CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mx
             |FROM orders
             |WHERE o_orderkey % 10 = 0
             |   OR (o_orderkey % 10 <> 0 AND o_orderkey % 7 <> 0)
             |GROUP BY 1""".stripMargin))
  )
}
