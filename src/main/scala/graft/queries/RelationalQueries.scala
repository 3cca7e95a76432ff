package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Relational capability extensions over the shared star schema
  * (SURVEY.md §7.4): multi-way joins with broadcast dims, rollup/grouping
  * sets, distinct and approximate aggregation, window functions, semi/anti
  * joins, and an as-of join built the scale-correct way (union + ordered
  * window, no range-explosion join).
  *
  * Money columns are integer-ized to cents (`floor(x*100 + 0.5)`) before
  * summing so results are exact integers — immune to FP summation-order
  * differences between engines at any scale factor.
  */
object RelationalQueries {

  private def centsCol(c: String) = floor(col(c) * 100 + 0.5)
  private def cents(c: String) = s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  /** Synthetic epoch mapping events (2024) into the orders era (1997+):
    * 1997-01-01 + (ts − 2024-01-01)×20, in exact integer seconds. */
  private val eAsofEpoch = "852076800 + (CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) * 20"

  def defs: Seq[QueryDef] = Seq(

    // ── TPC-H Q1-shaped pricing summary (partial+final hash agg, pushdown
    //    filter reaches the parquet scan).
    QueryDef("q_tpch_pricing",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .withColumn("cents", centsCol("l_extendedprice"))
        .withColumn("discpct", centsCol("l_discount"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(col("cents")).as("sum_base_cents"),
          sum(col("cents") * (lit(100L) - col("discpct"))).as("sum_disc_cp"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("cnt")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
              |       CAST(sum(${cents("l_extendedprice")}) AS BIGINT) AS sum_base_cents,
              |       CAST(sum(${cents("l_extendedprice")} * (100 - ${cents("l_discount")})) AS BIGINT) AS sum_disc_cp,
              |       round(avg(l_quantity), 4) AS avg_qty,
              |       count(*) AS cnt
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ── Five-way star join: fact shuffles once; all dims broadcast.
    QueryDef("q_star_join",
      (s, d) => Tables.lineitem(s, d)
        .withColumn("cents", centsCol("l_extendedprice"))
        .withColumn("discpct", centsCol("l_discount"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("cents") * (lit(100L) - col("discpct"))).as("rev_cp")),
      Some(s"""SELECT n_name, r_name, count(*) AS cnt,
              |       CAST(sum(${cents("l_extendedprice")} * (100 - ${cents("l_discount")})) AS BIGINT) AS rev_cp
              |FROM lineitem
              |JOIN orders   ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation   ON c_nationkey = n_nationkey
              |JOIN region   ON n_regionkey = r_regionkey
              |GROUP BY n_name, r_name""".stripMargin)),

    // ── Top-k with deterministic tie-break (TakeOrderedAndProject).
    QueryDef("q_topk_orders",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), centsCol("o_totalprice").as("price_cents"))
        .orderBy(col("price_cents").desc, col("o_orderkey").asc)
        .limit(10),
      Some(s"""SELECT o_orderkey, ${cents("o_totalprice")} AS price_cents
              |FROM orders ORDER BY price_cents DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // ── ROLLUP with grouping indicators.
    QueryDef("q_rollup",
      (s, d) => Tables.orders(s, d)
        .withColumn("price_cents", centsCol("o_totalprice"))
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), sum(col("price_cents")).as("sum_cents"),
          grouping(col("o_orderstatus")).cast("int").as("g_status"),
          grouping(col("o_orderpriority")).cast("int").as("g_prio")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
              |       CAST(sum(${cents("o_totalprice")}) AS BIGINT) AS sum_cents,
              |       CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
              |       CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio
              |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin)),

    // ── Explicit GROUPING SETS (SQL surface).
    QueryDef("q_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).withColumn("price_cents", centsCol("o_totalprice"))
          .createOrReplaceTempView("orders_pc")
        s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
                |       sum(price_cents) AS sum_cents
                |FROM orders_pc
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      },
      Some(s"""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
              |       CAST(sum(${cents("o_totalprice")}) AS BIGINT) AS sum_cents
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // ── Window functions: row_number, lag, running sum (sequential frame —
    //    bit-identical across engines before the safety rounding).
    QueryDef("q_window_funcs",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("run_sum", round(sum(col("value"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4))
          .select(col("event_id"), col("user_id"),
            unix_timestamp(col("ts")).as("ts_es"), col("rn"), col("prev_value"), col("run_sum"))
      },
      Some("""SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_es,
             |       row_number() OVER w AS rn,
             |       lag(value, 1) OVER w AS prev_value,
             |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // ── RANGE window frame (value-based, vs q_window_funcs' ROWS frame):
    //    per event, neighbors within ±50 of its value among same-type events.
    QueryDef("q_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
          .rangeBetween(-50L, 50L)
        Tables.events(s, d)
          .withColumn("n_near", count(lit(1)).over(w))
          .select(col("event_id"), col("event_type"), col("n_near"))
      },
      Some("""SELECT event_id, event_type,
             |       count(*) OVER (PARTITION BY event_type ORDER BY value
             |                      RANGE BETWEEN 50 PRECEDING AND 50 FOLLOWING) AS n_near
             |FROM events""".stripMargin)),

    // ── As-of join (events ↦ most recent order at-or-before the mapped
    //    event time). Scale path: tag + union + one ordered window pass —
    //    never a t1.t >= t2.t range join, which explodes at 100 TB.
    QueryDef("q_asof_join",
      (s, d) => {
        val queries = Tables.events(s, d).select(
          col("user_id").as("k"),
          (lit(852076800L) + (unix_timestamp(col("ts")) - lit(1704067200L)) * 20).as("t"),
          lit(1).as("tag"), col("event_id"),
          lit(null).cast("long").as("o_orderkey"))
        val refs = Tables.orders(s, d).select(
          col("o_custkey").as("k"),
          unix_timestamp(col("o_orderdate")).as("t"),
          lit(0).as("tag"), lit(null).cast("long").as("event_id"),
          col("o_orderkey"))
        val w = Window.partitionBy(col("k"))
          .orderBy(col("t"), col("tag"), coalesce(col("o_orderkey"), col("event_id")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        refs.unionByName(queries)
          .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("k").as("user_id"), col("t").as("t_es"),
            col("asof_orderkey"))
      },
      Some(s"""SELECT e.event_id, e.user_id, $eAsofEpoch AS t_es,
              |  (SELECT o.o_orderkey FROM orders o
              |    WHERE o.o_custkey = e.user_id
              |      AND CAST(floor(epoch(o.o_orderdate)) AS BIGINT) <= $eAsofEpoch
              |    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS asof_orderkey
              |FROM events e""".stripMargin)),

    // ── Semi/anti joins (EXISTS / NOT EXISTS).
    QueryDef("q_semi_anti",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
          .withColumn("kind", lit("with"))
        val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
          .withColumn("kind", lit("without"))
        semi.unionByName(anti)
      },
      Some("""SELECT c_nationkey, count(*) AS cnt, 'with' AS kind FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |GROUP BY c_nationkey
             |UNION ALL
             |SELECT c_nationkey, count(*) AS cnt, 'without' AS kind FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |GROUP BY c_nationkey""".stripMargin)),

    // ── Exact distinct aggregation (expand + two-phase agg).
    QueryDef("q_distinct_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("dparts"),
          countDistinct(col("l_suppkey")).as("dsupps"),
          count(lit(1)).as("cnt")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS dparts,
             |       count(DISTINCT l_suppkey) AS dsupps, count(*) AS cnt
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ── Set operations (INTERSECT/EXCEPT — absent from the reference,
    //    SURVEY §2.7): buyers vs clickers user sets.
    QueryDef("q_set_ops",
      (s, d) => {
        val ev = Tables.events(s, d)
        def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
        // scalar aggregates (not groupBy over the set) so an EMPTY set still
        // yields its 0-count row, matching the oracle's SELECT count(*)
        val both = users("purchase").intersect(users("click"))
          .agg(count(lit(1)).as("n_users")).withColumn("kind", lit("purchase_and_click"))
        val only = users("purchase").except(users("click"))
          .agg(count(lit(1)).as("n_users")).withColumn("kind", lit("purchase_no_click"))
        both.unionByName(only).select(col("kind"), col("n_users"))
      },
      Some("""SELECT 'purchase_and_click' AS kind, count(*) AS n_users FROM (
             |  SELECT user_id FROM events WHERE event_type = 'purchase'
             |  INTERSECT
             |  SELECT user_id FROM events WHERE event_type = 'click') t
             |UNION ALL
             |SELECT 'purchase_no_click' AS kind, count(*) AS n_users FROM (
             |  SELECT user_id FROM events WHERE event_type = 'purchase'
             |  EXCEPT
             |  SELECT user_id FROM events WHERE event_type = 'click') u""".stripMargin)),

    // ── Exact row-level dedup via dropDuplicates (projection-level DISTINCT;
    //    the streaming twin dropDuplicatesWithinWatermark is spec-covered).
    QueryDef("q_drop_duplicates",
      (s, d) => Tables.events(s, d)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates(),
      Some("SELECT DISTINCT user_id, event_type FROM events")),

    // ── Pivot: per-user-bucket counts fanned across event types (explicit
    //    value list keeps the plan single-pass; oracle via CASE aggregation).
    QueryDef("q_pivot",
      (s, d) => Tables.events(s, d)
        .withColumn("ub", col("user_id") % 5)
        .groupBy(col("ub"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L), // empty combos: pivot yields NULL, the oracle's count(CASE) yields 0
      Some("""SELECT user_id % 5 AS ub,
             |       CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
             |       CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
             |       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
             |       CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
             |       CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id % 5""".stripMargin)),

    // ── Statistical aggregates: exact interpolated percentiles, sample
    //    stddev, Pearson correlation (identical definitions both engines).
    QueryDef("q_stats_agg",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(stddev_samp(col("value")), 4).as("sd"),
          round(corr(col("value"), col("user_id").cast("double")), 6).as("corr_vu"),
          count(lit(1)).as("cnt")),
      Some("""SELECT event_type,
             |       round(quantile_cont(value, 0.5), 4) AS p50,
             |       round(quantile_cont(value, 0.9), 4) AS p90,
             |       round(stddev_samp(value), 4) AS sd,
             |       round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu,
             |       count(*) AS cnt
             |FROM events GROUP BY event_type""".stripMargin)),

    // ── Histogram-sketch quantiles ([[graft.ops.Quantiles]]): the
    //    mergeable O(bins) scale path next to q_stats_agg's exact
    //    percentile (which buffers every value per group).
    QueryDef("q_quantile_hist",
      (s, d) => graft.ops.Quantiles.fromHistogram(
        graft.ops.Quantiles.histogram(Tables.events(s, d), "event_type", "value"),
        "event_type", Seq(0.5, 0.9)),
      Some("""WITH h AS (SELECT event_type,
             |                  least(CAST(floor(value / 2.0) AS BIGINT), 255) AS bin,
             |                  count(*) AS cnt
             |           FROM events GROUP BY 1, 2),
             |c AS (SELECT event_type, bin, cnt,
             |             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |             sum(cnt) OVER (PARTITION BY event_type) AS total
             |      FROM h),
             |x AS (SELECT c.*, p.p, p.p * c.total AS target
             |      FROM c CROSS JOIN (VALUES (CAST('0.5' AS DOUBLE)),
             |                                (CAST('0.9' AS DOUBLE))) p(p)
             |      WHERE c.cum >= p.p * c.total),
             |r AS (SELECT *, row_number() OVER (PARTITION BY event_type, p ORDER BY bin) AS rn
             |      FROM x)
             |SELECT event_type, p,
             |       round(bin * 2.0 + 2.0 * (target - (cum - cnt)) / cnt, 4) AS q_est
             |FROM r WHERE rn = 1""".stripMargin)),

    // ── Array collection ops (§2.10): collect_set canonicalized by
    //    sort_array so the set-valued result is deterministic cross-engine.
    QueryDef("q_collect_ops",
      (s, d) => Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          array_join(sort_array(collect_set(col("event_type"))), ",").as("types_str"),
          size(collect_set(col("event_type"))).cast("long").as("n_types"),
          count(lit(1)).as("cnt")),
      Some("""SELECT user_id,
             |       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_str,
             |       count(DISTINCT event_type) AS n_types,
             |       count(*) AS cnt
             |FROM events GROUP BY user_id""".stripMargin)),

    // ── Map-typed columns (§2.10): props parsed as map<string,int>,
    //    observed via scalar projections (sorted keys + value sum).
    QueryDef("q_map_ops",
      (s, d) => Tables.events(s, d)
        .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType)))
        .select(col("event_id"),
          array_join(sort_array(map_keys(col("m"))), ",").as("keys_str"),
          aggregate(map_values(col("m")), lit(0L), (acc, x) => acc + x).as("vals_sum")),
      Some("""SELECT event_id, 'k' AS keys_str,
             |       CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS BIGINT) AS vals_sum
             |FROM events""".stripMargin)),

    // ── Deterministic stratified sampling ([[graft.ops.Sampling]]): keep
    //    10% of 'view' events, 50% of everything else, decided by the
    //    portable content hash — observable via per-stratum counts/sums.
    QueryDef("q_sample_stratified",
      (s, d) => {
        val rate = when(col("event_type") === "view", lit(10)).otherwise(lit(50))
        val kept = graft.ops.Sampling.keepHash(col("event_id").cast("string"), "samp", rate)
        Tables.events(s, d).groupBy(col("event_type"))
          .agg(count(lit(1)).as("total"),
            sum(when(kept, 1L).otherwise(0L)).as("sampled"),
            round(sum(when(kept, col("value"))), 4).as("sampled_value"))
      },
      Some {
        val h = PortableSql.hash48("CAST(event_id AS VARCHAR)", "'samp'")
        s"""SELECT event_type, count(*) AS total,
           |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
           |       round(sum(CASE WHEN kept THEN value END), 4) AS sampled_value
           |FROM (SELECT event_type, value,
           |             $h % 100 < CASE WHEN event_type = 'view' THEN 10 ELSE 50 END AS kept
           |      FROM events) t
           |GROUP BY event_type""".stripMargin
      }),

    // ── Approximate distinct via the KMV sketch ([[graft.functions.KmvDistinct]]):
    //    integer-only estimator over the portable 48-bit hash, so unlike
    //    HLL the sketch output itself is oracle-checkable bit-for-bit.
    //    (Spark's builtin HLL approx_count_distinct is exercised in the
    //    spec suite with a tolerance assert — its sketch is engine-specific.)
    QueryDef("q_approx_distinct",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(graft.functions.KmvDistinct.kmv_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("cnt")),
      Some {
        val h = PortableSql.hash48("CAST(user_id AS VARCHAR)", "'kmv'")
        s"""WITH b AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY 1),
           |hs AS (SELECT DISTINCT event_type, $h AS h FROM events),
           |r AS (SELECT event_type, h,
           |             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
           |             count(*) OVER (PARTITION BY event_type) AS nh
           |      FROM hs),
           |e AS (SELECT event_type,
           |             CAST(CASE WHEN max(nh) < 64 THEN max(nh)
           |                  ELSE 63 * 281474976710656 // min(CASE WHEN rn = 64 THEN h END)
           |                  END AS BIGINT) AS approx_users
           |      FROM r GROUP BY 1)
           |SELECT b.event_type, e.approx_users, b.cnt
           |FROM b JOIN e USING (event_type)""".stripMargin
      })
  )
}
