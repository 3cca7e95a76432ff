package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.geo.RadiusJoin
import graft.ops.{Anomaly, Audit, Behavior, Experiment, Graph, History,
  JoinDiag, Skyline, Snapshot}

/** Round-6 extensions: iterative fixed-point PageRank, SCD2 change-capture
  * history, and the 2-D skyline. All-integer arithmetic throughout (e6
  * ranks, micros timestamps, cents prices) so every oracle is bit-exact.
  */
object Round6Queries {

  /** Unrolled-iteration DuckDB twin of [[Graph.pageRank]] on the test
    * graph: nodes = partkey mod 100; every node points at +1 (mod 100) and
    * even nodes also at 7·id+3 (mod 100) — connected, aperiodic, and
    * out-degree-skewed so ranks are nonuniform. CASTs keep DuckDB's
    * HUGEINT sum promotion off the output schema. */
  private def pageRankSql(iters: Int): String = {
    val head =
      """WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
        |e AS (SELECT id AS src, (id + 1) % 100 AS dst FROM nodes
        |      UNION ALL
        |      SELECT id AS src, (id * 7 + 3) % 100 AS dst FROM nodes WHERE id % 2 = 0),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
        |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes)""".stripMargin
    val its = (1 to iters).map { k =>
      s"""p$k AS (SELECT n.id, CAST(150000 + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS pr
         |       FROM nodes n LEFT JOIN (SELECT ed.dst, sum(p.pr // ed.outdeg) AS s
         |                               FROM ed JOIN p${k - 1} p ON p.id = ed.src
         |                               GROUP BY ed.dst) m ON m.dst = n.id)""".stripMargin
    }
    (head +: its).mkString(",\n") + s"\nSELECT id, pr AS pr_e6 FROM p$iters"
  }

  /** Weighted twin of [[pageRankSql]]: the +1 ring edge carries weight 3,
    * the even-node chord weight 1, so mass splits 3:1 instead of 1:1. */
  private def pageRankWeightedSql(iters: Int): String = {
    val head =
      """WITH nodes AS (SELECT DISTINCT p_partkey % 100 AS id FROM part),
        |e AS (SELECT id AS src, (id + 1) % 100 AS dst, 3 AS w FROM nodes
        |      UNION ALL
        |      SELECT id AS src, (id * 7 + 3) % 100 AS dst, 1 AS w FROM nodes WHERE id % 2 = 0),
        |sw AS (SELECT src, CAST(sum(w) AS BIGINT) AS sw FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, e.w, sw.sw FROM e JOIN sw USING (src)),
        |p0 AS (SELECT id, CAST(1000000 AS BIGINT) AS pr FROM nodes)""".stripMargin
    val its = (1 to iters).map { k =>
      s"""p$k AS (SELECT n.id, CAST(150000 + (85 * COALESCE(m.s, 0)) // 100 AS BIGINT) AS pr
         |       FROM nodes n LEFT JOIN (SELECT ed.dst, sum((p.pr * ed.w) // ed.sw) AS s
         |                               FROM ed JOIN p${k - 1} p ON p.id = ed.src
         |                               GROUP BY ed.dst) m ON m.dst = n.id)""".stripMargin
    }
    (head +: its).mkString(",\n") + s"\nSELECT id, pr AS pr_e6 FROM p$iters"
  }

  def defs: Seq[QueryDef] = Seq(

    // ── 4 rounds of integer PageRank on a 100-node directed circulant-ish
    //    graph with skewed out-degrees. The oracle unrolls the iterations
    //    as chained CTEs — same joins, same truncating division.
    QueryDef("q_pagerank",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val edges = nodes
          .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"))
          .unionByName(nodes.filter(col("id") % 2 === 0)
            .select(col("id").as("src"), ((col("id") * 7 + 3) % 100).as("dst")))
        Graph.pageRank(nodes, edges, 4)
      },
      Some(pageRankSql(4))),

    // ── SCD2 change-capture over each user's event-type stream: one row
    //    per run of equal types with validity bounds and a current flag.
    QueryDef("q_scd2_intervals",
      (s, d) => History.scd2(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_type"),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_type AS et FROM events),
             |c AS (SELECT user_id, t, et, lag(et) OVER w AS prev, lag(t) OVER w AS prev_t
             |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
             |ch AS (SELECT user_id, t, et FROM c WHERE prev_t IS NULL OR prev <> et)
             |SELECT user_id, t AS valid_from_us, et AS attr,
             |       lead(t) OVER w2 AS valid_to_us,
             |       lead(t) OVER w2 IS NULL AS is_current
             |FROM ch WINDOW w2 AS (PARTITION BY user_id ORDER BY t)""".stripMargin)),

    // ── Skyline of customers trading off order count (maximize) against
    //    cheapest order price in cents (minimize). The oracle mirrors the
    //    x-level sweep, not the quadratic NOT-EXISTS check, so it stays
    //    linear at every SF.
    QueryDef("q_skyline",
      (s, d) => {
        val pts = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            min(floor(col("o_totalprice") * 100 + 0.5)).as("min_price_cents"))
        Skyline.skyline2D(pts, "n_orders", "min_price_cents")
      },
      Some("""WITH pts AS (SELECT o_custkey, count(*) AS n_orders,
             |                    min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS min_price_cents
             |             FROM orders GROUP BY o_custkey),
             |lv AS (SELECT n_orders AS x, min(min_price_cents) AS min_y FROM pts GROUP BY 1),
             |f AS (SELECT x, min_y, min(min_y) OVER (ORDER BY x DESC
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS better FROM lv)
             |SELECT p.o_custkey, p.n_orders, p.min_price_cents
             |FROM pts p JOIN f ON p.n_orders = f.x AND p.min_price_cents = f.min_y
             |WHERE f.better IS NULL OR f.min_y < f.better""".stripMargin)),

    // ── CUSUM drift scan per event type (target 50.00, slack 5.00,
    //    threshold 200.00 — all cents). The clamp recursion runs as the
    //    prefix-sum/running-min identity: one shuffle, two window passes.
    QueryDef("q_cusum_drift",
      (s, d) => Anomaly.cusumProfile(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "event_type", "t_us", "value", 5000L, 500L, 20000L),
      Some("""WITH e AS (SELECT event_type, epoch_us(ts) AS t,
             |                 CAST(floor(value * 100 + 0.5) AS BIGINT) - 5500 AS d FROM events),
             |ps AS (SELECT event_type, t, CAST(sum(d) OVER w AS BIGINT) AS pp
             |       FROM e WINDOW w AS (PARTITION BY event_type ORDER BY t
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |ss AS (SELECT event_type, CAST(pp - least(0, min(pp) OVER w) AS BIGINT) AS s
             |       FROM ps WINDOW w AS (PARTITION BY event_type ORDER BY t
             |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT event_type, count(*) AS n_points,
             |       CAST(sum(CASE WHEN s > 20000 THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
             |       max(s) AS max_cusum_cents
             |FROM ss GROUP BY event_type""".stripMargin)),

    // ── Referential-integrity audit: orphan counts across the TPC-H FK
    //    chain plus the reverse check (childless orders). Each relation is
    //    one anti-join; nulls are "unknown", not orphans.
    QueryDef("q_ref_integrity",
      (s, d) => Audit.referentialIntegrity(Seq(
        (Tables.lineitem(s, d), "l_orderkey", Tables.orders(s, d),
          "o_orderkey", "lineitem->orders"),
        (Tables.orders(s, d), "o_custkey", Tables.customer(s, d),
          "c_custkey", "orders->customer"),
        (Tables.customer(s, d), "c_nationkey", Tables.nation(s, d),
          "n_nationkey", "customer->nation"),
        (Tables.orders(s, d), "o_orderkey", Tables.lineitem(s, d),
          "l_orderkey", "orders<-lineitem"))),
      Some("""SELECT 'lineitem->orders' AS relation, count(*) AS n_orphans FROM lineitem
             |WHERE l_orderkey IS NOT NULL
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
             |UNION ALL
             |SELECT 'orders->customer', count(*) FROM orders
             |WHERE o_custkey IS NOT NULL
             |  AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
             |UNION ALL
             |SELECT 'customer->nation', count(*) FROM customer
             |WHERE c_nationkey IS NOT NULL
             |  AND NOT EXISTS (SELECT 1 FROM nation WHERE n_nationkey = c_nationkey)
             |UNION ALL
             |SELECT 'orders<-lineitem', count(*) FROM orders
             |WHERE o_orderkey IS NOT NULL
             |  AND NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""".stripMargin)),

    // ── Funnel first-reach times + conversion lags per user: the stage
    //    vector rides one fold accumulator, so lags are free projections.
    QueryDef("q_funnel_lag",
      (s, d) => Behavior.funnelTimes(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_type", Seq("view", "click", "purchase"))
        .select(col("entity"), col("t1"), col("t2"), col("t3"),
          (col("t2") - col("t1")).as("lag12_us"),
          (col("t3") - col("t2")).as("lag23_us")),
      Some("""WITH e AS (SELECT user_id AS entity, epoch_us(ts) AS t, event_type AS et FROM events),
             |u AS (SELECT DISTINCT entity FROM e),
             |s1 AS (SELECT entity, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
             |s2 AS (SELECT e.entity, min(t) AS t2 FROM e JOIN s1 USING (entity)
             |       WHERE et = 'click' AND t > t1 GROUP BY 1),
             |s3 AS (SELECT e.entity, min(t) AS t3 FROM e JOIN s2 USING (entity)
             |       WHERE et = 'purchase' AND t > t2 GROUP BY 1)
             |SELECT entity, t1, t2, t3, t2 - t1 AS lag12_us, t3 - t2 AS lag23_us
             |FROM u LEFT JOIN s1 USING (entity) LEFT JOIN s2 USING (entity)
             |       LEFT JOIN s3 USING (entity)""".stripMargin)),

    // ── A/B readout: users split by id parity, conversion = any premium
    //    (>300.00) purchase. The pooled two-proportion z² decision is
    //    cross-multiplied into wide integers — no doubles anywhere.
    QueryDef("q_ab_test",
      (s, d) => {
        val perUser = Tables.events(s, d).groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" && col("value") > 300.0,
            1L).otherwise(0L)).as("converted"))
          .select((col("user_id") % 2).as("variant"), col("converted"))
        Experiment.twoProportionTest(perUser, "variant", "converted")
      },
      Some("""WITH pu AS (SELECT user_id,
             |              max(CASE WHEN event_type = 'purchase' AND value > CAST('300.0' AS DOUBLE)
             |                       THEN 1 ELSE 0 END) AS conv
             |            FROM events GROUP BY 1),
             |t AS (SELECT
             |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |  CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
             |  CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |  CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
             |  FROM pu)
             |SELECT n_a, conv_a, n_b, conv_b,
             |       CAST(10000 AS HUGEINT) * (n_a + n_b)
             |         * (conv_a * n_b - conv_b * n_a) * (conv_a * n_b - conv_b * n_a)
             |       > CAST(38416 AS HUGEINT) * n_a * n_b * (conv_a + conv_b)
             |         * (n_a + n_b - conv_a - conv_b) AS significant
             |FROM t""".stripMargin)),

    // ── Grid-blocked radius self-join over deterministic integer planar
    //    coordinates: 3×3 neighbor stamp → one equi-join on cell → exact
    //    integer squared-distance filter. The oracle can afford the
    //    quadratic inequality join at oracle SFs; the engine never does it.
    QueryDef("q_radius_join",
      (s, d) => RadiusJoin.selfJoin(
        Tables.customer(s, d).select(col("c_custkey").as("id"),
          (col("c_custkey") * 7919 % 10000).as("x"),
          (col("c_custkey") * 104729 % 10000).as("y")),
        "id", "x", "y", 100L),
      Some("""WITH pts AS (SELECT c_custkey AS id,
             |                    c_custkey * 7919 % 10000 AS x,
             |                    c_custkey * 104729 % 10000 AS y FROM customer)
             |SELECT a.id AS id_a, b.id AS id_b,
             |       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist_sq
             |FROM pts a JOIN pts b ON a.id < b.id
             |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 10000""".stripMargin)),

    // ── Batch CDC between two synthetic snapshot versions of the events
    //    table: per-key digest (count + order-independent portable-hash
    //    sum), one full outer join, delta-only output.
    QueryDef("q_snapshot_diff",
      (s, d) => {
        val ev = Tables.events(s, d)
        val v1 = ev.filter(col("event_id") % 7 =!= 0 && col("user_id") % 13 =!= 0)
        val v2 = ev.filter(col("event_id") % 11 =!= 0 && col("user_id") % 17 =!= 0)
        Snapshot.diff(v1, v2, "user_id", "event_id")
      },
      Some {
        val h = PortableSql.hash48("CAST(event_id AS VARCHAR)", "'snap'")
        s"""WITH v1 AS (SELECT user_id, event_id FROM events
           |            WHERE event_id % 7 <> 0 AND user_id % 13 <> 0),
           |v2 AS (SELECT user_id, event_id FROM events
           |       WHERE event_id % 11 <> 0 AND user_id % 17 <> 0),
           |a AS (SELECT user_id AS k, count(*) AS n1, CAST(sum($h) AS BIGINT) AS h1
           |      FROM v1 GROUP BY 1),
           |b AS (SELECT user_id AS k, count(*) AS n2, CAST(sum($h) AS BIGINT) AS h2
           |      FROM v2 GROUP BY 1),
           |j AS (SELECT coalesce(a.k, b.k) AS user_id,
           |             CASE WHEN a.k IS NULL THEN 'added'
           |                  WHEN b.k IS NULL THEN 'removed'
           |                  WHEN n1 <> n2 OR h1 <> h2 THEN 'changed'
           |                  ELSE 'unchanged' END AS status
           |      FROM a FULL OUTER JOIN b ON a.k = b.k)
           |SELECT user_id, status FROM j WHERE status <> 'unchanged'""".stripMargin
      }),

    // ── Declarative constraint audit over orders: four row-level rules +
    //    a uniqueness rule, ALL computed in one scan then pivoted to rows.
    QueryDef("q_constraint_audit",
      (s, d) => Audit.constraints(Tables.orders(s, d),
        Seq(
          "o_custkey_not_null" -> col("o_custkey").isNull,
          "o_totalprice_positive" -> coalesce(!(col("o_totalprice") > 0.0), lit(true)),
          "o_orderstatus_domain" ->
            coalesce(!col("o_orderstatus").isin("O", "F", "P"), lit(true)),
          "o_orderdate_range" -> coalesce(
            unix_timestamp(col("o_orderdate")) < lit(788918400L) ||
              unix_timestamp(col("o_orderdate")) >= lit(1009843200L),
            lit(true))),
        Seq("o_orderkey_unique" -> "o_orderkey")),
      Some("""SELECT 'o_custkey_not_null' AS rule,
             |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
             |FROM orders
             |UNION ALL
             |SELECT 'o_totalprice_positive',
             |       CAST(sum(CASE WHEN NOT (o_totalprice > 0) OR o_totalprice IS NULL
             |                     THEN 1 ELSE 0 END) AS BIGINT) FROM orders
             |UNION ALL
             |SELECT 'o_orderstatus_domain',
             |       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
             |                       OR o_orderstatus IS NULL
             |                     THEN 1 ELSE 0 END) AS BIGINT) FROM orders
             |UNION ALL
             |SELECT 'o_orderdate_range',
             |       CAST(sum(CASE WHEN o_orderdate IS NULL
             |                       OR epoch(o_orderdate) < 788918400
             |                       OR epoch(o_orderdate) >= 1009843200
             |                     THEN 1 ELSE 0 END) AS BIGINT) FROM orders
             |UNION ALL
             |SELECT 'o_orderkey_unique',
             |       CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
             |FROM orders""".stripMargin)),

    // ── Pre-flight join diagnostics: the 10 hottest self-join keys of the
    //    events stream by predicted output rows — the scan that says
    //    "salt these keys" before the join runs. Cost: two per-key count
    //    aggregates + a tiny count-frame join; never the join itself.
    QueryDef("q_join_cardinality",
      (s, d) => JoinDiag.topJoinKeys(
        Tables.events(s, d), "user_id", Tables.events(s, d), "user_id", 10),
      Some("""WITH lc AS (SELECT user_id AS k, count(*) AS n_left FROM events GROUP BY 1),
             |rc AS (SELECT user_id AS k, count(*) AS n_right FROM events GROUP BY 1)
             |SELECT lc.k, n_left, n_right, n_left * n_right AS out_rows
             |FROM lc JOIN rc USING (k)
             |ORDER BY out_rows DESC, k LIMIT 10""".stripMargin)),

    // ── Weight-proportional PageRank on the same 100-node graph: ring
    //    edges carry weight 3, chords weight 1 — mass splits 3:1.
    QueryDef("q_pagerank_weighted",
      (s, d) => {
        val nodes = Tables.part(s, d)
          .select((col("p_partkey") % 100).as("id")).distinct()
        val edges = nodes
          .select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"),
            lit(3L).as("w"))
          .unionByName(nodes.filter(col("id") % 2 === 0)
            .select(col("id").as("src"), ((col("id") * 7 + 3) % 100).as("dst"),
              lit(1L).as("w")))
        Graph.pageRankWeighted(nodes, edges, 4)
      },
      Some(pageRankWeightedSql(4))),

    // ── Deadline-constrained funnel: each later stage must land within
    //    24 h of the previous reach (one extra guard in the fold's CASE —
    //    the plan is still one shuffle).
    QueryDef("q_funnel_gapped",
      (s, d) => Behavior.funnelStages(
        Tables.events(s, d).withColumn("t_us", unix_micros(col("ts"))),
        "user_id", "t_us", "event_type", Seq("view", "click", "purchase"),
        Some(86400000000L)),
      Some("""WITH e AS (SELECT user_id AS entity, epoch_us(ts) AS t, event_type AS et FROM events),
             |u AS (SELECT DISTINCT entity FROM e),
             |s1 AS (SELECT entity, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
             |s2 AS (SELECT e.entity, min(t) AS t2 FROM e JOIN s1 USING (entity)
             |       WHERE et = 'click' AND t > t1 AND t - t1 <= 86400000000 GROUP BY 1),
             |s3 AS (SELECT e.entity, min(t) AS t3 FROM e JOIN s2 USING (entity)
             |       WHERE et = 'purchase' AND t > t2 AND t - t2 <= 86400000000 GROUP BY 1)
             |SELECT entity,
             |       CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS stage
             |FROM u LEFT JOIN s1 USING (entity) LEFT JOIN s2 USING (entity)
             |       LEFT JOIN s3 USING (entity)""".stripMargin)),

    // ── Column-attributed snapshot CDC: v2 mutates event_type on a slice
    //    of rows and drops/adds users, so `changed` keys name the column.
    QueryDef("q_snapshot_cols",
      (s, d) => {
        val ev = Tables.events(s, d)
        val v1 = ev.filter(col("user_id") % 13 =!= 0)
        val v2 = ev.filter(col("user_id") % 17 =!= 0)
          .withColumn("event_type",
            when(col("event_id") % 31 === 0, lit("modified"))
              .otherwise(col("event_type")))
        // Driver-portability: serialize the changed-column list to a CSV
        // string (the checker's pandas sort cannot hash list cells).
        Snapshot.diffColumns(v1, v2, "user_id", Seq("event_type", "props"))
          .withColumn("changed_cols", concat_ws(",", col("changed_cols")))
      },
      Some {
        val het = PortableSql.hash48("CAST(event_type AS VARCHAR)", "'event_type'")
        val hpr = PortableSql.hash48("CAST(props AS VARCHAR)", "'props'")
        s"""WITH v1 AS (SELECT user_id, event_type, props FROM events WHERE user_id % 13 <> 0),
           |v2 AS (SELECT user_id,
           |              CASE WHEN event_id % 31 = 0 THEN 'modified' ELSE event_type END AS event_type,
           |              props
           |       FROM events WHERE user_id % 17 <> 0),
           |a AS (SELECT user_id AS k, count(*) AS n1, CAST(sum($het) AS BIGINT) AS h1_et,
           |             CAST(sum($hpr) AS BIGINT) AS h1_pr FROM v1 GROUP BY 1),
           |b AS (SELECT user_id AS k, count(*) AS n2, CAST(sum($het) AS BIGINT) AS h2_et,
           |             CAST(sum($hpr) AS BIGINT) AS h2_pr FROM v2 GROUP BY 1),
           |j AS (SELECT coalesce(a.k, b.k) AS user_id, a.k AS ak, b.k AS bk,
           |             n1, n2, h1_et, h2_et, h1_pr, h2_pr
           |      FROM a FULL OUTER JOIN b ON a.k = b.k),
           |c AS (SELECT user_id,
           |             CASE WHEN ak IS NULL THEN 'added' WHEN bk IS NULL THEN 'removed'
           |                  WHEN n1 <> n2 OR h1_et IS DISTINCT FROM h2_et
           |                    OR h1_pr IS DISTINCT FROM h2_pr THEN 'changed'
           |                  ELSE 'unchanged' END AS status,
           |             h1_et, h2_et, h1_pr, h2_pr FROM j)
           |SELECT user_id, status,
           |       coalesce(array_to_string(
           |         CASE WHEN status = 'changed' THEN
           |                list_filter([CASE WHEN h1_et IS DISTINCT FROM h2_et THEN 'event_type' END,
           |                             CASE WHEN h1_pr IS DISTINCT FROM h2_pr THEN 'props' END],
           |                            x -> x IS NOT NULL)
           |              ELSE CAST([] AS VARCHAR[]) END, ','), '') AS changed_cols
           |FROM c WHERE status <> 'unchanged'""".stripMargin
      })
  )
}
