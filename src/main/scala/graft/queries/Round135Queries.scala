package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-135 batch: classic analytic-SQL shapes the registry still
  * lacked — gaps-and-islands over customer activity months (longest
  * consecutive streak per customer, rolled into a bounded histogram),
  * per-group mode with deterministic ties (modal brand per nation —
  * the argmax-of-counts shape q_latest_* does over time), and exact
  * rank-selected gap percentiles per market segment (p50/p90/p99 of
  * inter-order day gaps, ceil-rank convention — no approximate
  * percentile sketch, identical row picked in both engines).
  */
object Round135Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Activity islands: month index = 12·year+month; island id =
    //    mo_idx − row_number (constant within a consecutive run). The
    //    customer-keyed shuffle carries dedup, the window AND both
    //    rollups; the streak axis is bounded by the 7-year calendar.
    QueryDef("q_activity_islands",
      (s, d) => {
        val am = Tables.orders(s, d)
          .select(col("o_custkey").as("cust"),
            expr("year(o_orderdate) * 12 + month(o_orderdate)")
              .as("mi"))
          .distinct()
        val isl = am
          .withColumn("grp", col("mi") - row_number().over(
            Window.partitionBy(col("cust")).orderBy(col("mi"))))
          .groupBy(col("cust"), col("grp"))
          .agg(count(lit(1)).as("len"))
        val per = isl.groupBy(col("cust"))
          .agg(count(lit(1)).as("n_islands"), max(col("len")).as("maxlen"))
        per.groupBy(col("maxlen"))
          .agg(count(lit(1)).as("n_customers"),
            expr("sum(n_islands) div count(1)").as("avg_islands"))
          .selectExpr("CAST(maxlen AS BIGINT) AS max_streak_months",
            "CAST(n_customers AS BIGINT) AS n_customers", "avg_islands")
      },
      Some("""WITH am AS (
             |  SELECT DISTINCT o_custkey AS cust,
             |         year(o_orderdate) * 12 + month(o_orderdate) AS mi
             |  FROM orders),
             |isl AS (SELECT cust,
             |               mi - row_number() OVER (PARTITION BY cust
             |                 ORDER BY mi) AS grp,
             |               mi
             |        FROM am),
             |runs AS (SELECT cust, grp, CAST(count(*) AS BIGINT) AS len
             |         FROM isl GROUP BY 1, 2),
             |per AS (SELECT cust, CAST(count(*) AS BIGINT) AS n_islands,
             |               CAST(max(len) AS BIGINT) AS maxlen
             |        FROM runs GROUP BY 1)
             |SELECT maxlen AS max_streak_months,
             |       CAST(count(*) AS BIGINT) AS n_customers,
             |       CAST(sum(n_islands) // count(*) AS BIGINT)
             |         AS avg_islands
             |FROM per GROUP BY 1""".stripMargin)),

    // ── Modal brand per nation by line count (ties → brand asc): one
    //    (nation, brand) rollup; the argmax window and the nation total
    //    reuse its partitioning. Dims broadcast.
    QueryDef("q_mode_per_group",
      (s, d) => {
        val nb = Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("c_nationkey"), col("p_brand"))
          .agg(count(lit(1)).as("cnt"))
        nb
          .withColumn("tot", sum(col("cnt")).over(
            Window.partitionBy(col("c_nationkey"))))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("c_nationkey"))
              .orderBy(col("cnt").desc, col("p_brand"))))
          .filter(col("rk") === 1)
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .selectExpr("n_name", "p_brand AS modal_brand",
            "CAST(cnt AS BIGINT) AS cnt",
            "cnt * 1000000 div tot AS share_e6")
      },
      Some("""WITH nb AS (
             |  SELECT c.c_nationkey, p.p_brand,
             |         CAST(count(*) AS BIGINT) AS cnt
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN part p ON l.l_partkey = p.p_partkey
             |  GROUP BY 1, 2),
             |m AS (SELECT c_nationkey, p_brand, cnt,
             |             CAST(sum(cnt) OVER (PARTITION BY c_nationkey)
             |               AS BIGINT) AS tot,
             |             row_number() OVER (PARTITION BY c_nationkey
             |               ORDER BY cnt DESC, p_brand) AS rk
             |      FROM nb)
             |SELECT n.n_name, m.p_brand AS modal_brand, m.cnt,
             |       m.cnt * 1000000 // m.tot AS share_e6
             |FROM m JOIN nation n ON m.c_nationkey = n.n_nationkey
             |WHERE m.rk = 1""".stripMargin)),

    // ── Exact gap percentiles per segment: inter-order day gaps per
    //    customer (lag over the customer-keyed shuffle), then p50/90/99
    //    by ceil-rank selection over (gap, cust, day) — a total order,
    //    so both engines pick the identical row. The rank window is
    //    segment-partitioned; no sketch, no doubles.
    QueryDef("q_order_gap_percentiles",
      (s, d) => {
        val w = Window.partitionBy(col("cust")).orderBy(col("day"))
        val gaps = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"),
            col("o_custkey").as("cust"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
              "div 86400000000").as("day"))
          .distinct()
          .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
          .filter(col("gap").isNotNull)
        val ranked = gaps
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("seg"))
              .orderBy(col("gap"), col("cust"), col("day"))))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("seg"))))
        ranked.groupBy(col("seg"))
          .agg(max(col("n")).as("n_gaps"),
            max(when(col("rk") === expr("greatest(1, (n * 50 + 99) div 100)"),
              col("gap"))).as("p50_days"),
            max(when(col("rk") === expr("greatest(1, (n * 90 + 99) div 100)"),
              col("gap"))).as("p90_days"),
            max(when(col("rk") === expr("greatest(1, (n * 99 + 99) div 100)"),
              col("gap"))).as("p99_days"))
          .selectExpr("seg", "CAST(n_gaps AS BIGINT) AS n_gaps",
            "CAST(p50_days AS BIGINT) AS p50_days",
            "CAST(p90_days AS BIGINT) AS p90_days",
            "CAST(p99_days AS BIGINT) AS p99_days")
      },
      Some("""WITH days AS (
             |  SELECT DISTINCT c.c_mktsegment AS seg,
             |         o.o_custkey AS cust,
             |         epoch_us(o.o_orderdate) // 86400000000 AS day
             |  FROM orders o JOIN customer c
             |    ON o.o_custkey = c.c_custkey),
             |gaps AS (SELECT seg, cust, day,
             |                day - lag(day) OVER (PARTITION BY cust
             |                  ORDER BY day) AS gap
             |         FROM days),
             |g AS (SELECT seg, cust, day, gap FROM gaps
             |      WHERE gap IS NOT NULL),
             |ranked AS (SELECT seg, gap,
             |                  CAST(row_number() OVER (PARTITION BY seg
             |                    ORDER BY gap, cust, day) AS BIGINT)
             |                    AS rk,
             |                  CAST(count(*) OVER (PARTITION BY seg)
             |                    AS BIGINT) AS n
             |           FROM g)
             |SELECT seg, CAST(max(n) AS BIGINT) AS n_gaps,
             |       CAST(max(CASE WHEN rk = greatest(1,
             |         (n * 50 + 99) // 100) THEN gap END) AS BIGINT)
             |         AS p50_days,
             |       CAST(max(CASE WHEN rk = greatest(1,
             |         (n * 90 + 99) // 100) THEN gap END) AS BIGINT)
             |         AS p90_days,
             |       CAST(max(CASE WHEN rk = greatest(1,
             |         (n * 99 + 99) // 100) THEN gap END) AS BIGINT)
             |         AS p99_days
             |FROM ranked GROUP BY 1""".stripMargin))
  )
}
