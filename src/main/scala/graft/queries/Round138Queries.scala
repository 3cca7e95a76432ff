package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-138 batch: customer-lifecycle relational shapes — the
  * frequency-segment migration matrix 1996→1997 (including churn-to-
  * absent and new-from-absent legs via a full outer join — the
  * customer-grain complement of q_abc_migration's part ranks),
  * repurchase cycle per brand (days between consecutive buys of the
  * SAME part by the same customer — the replenishment read), and
  * share-of-wallet concentration (top-brand spend share per customer,
  * rolled to a bounded decile histogram per segment). Segments use
  * fixed order-count buckets (1 / 2–3 / 4+), so no global quantile
  * pass is needed anywhere.
  */
object Round138Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Frequency-segment migration: per customer the 1996 and 1997
    //    order counts → buckets ('1', '2-3', '4+', absent → '0'), full
    //    outer on the customer axis, then the bounded transition grid.
    QueryDef("q_customer_migration",
      (s, d) => {
        def leg(yr: Int, out: String) = Tables.orders(s, d)
          .filter(expr(s"year(o_orderdate) = $yr"))
          .groupBy(col("o_custkey").as("cust"))
          .agg(count(lit(1)).as("n"))
          .select(col("cust"),
            when(col("n") >= 4, "4+").when(col("n") >= 2, "2-3")
              .otherwise("1").as(out))
        leg(1996, "seg_a").join(leg(1997, "seg_b"), Seq("cust"), "full_outer")
          .select(coalesce(col("seg_a"), lit("0")).as("seg_1996"),
            coalesce(col("seg_b"), lit("0")).as("seg_1997"))
          .groupBy(col("seg_1996"), col("seg_1997"))
          .agg(count(lit(1)).as("n_customers"))
          .selectExpr("seg_1996", "seg_1997",
            "CAST(n_customers AS BIGINT) AS n_customers")
      },
      Some("""WITH a AS (SELECT o_custkey AS cust,
             |                 CASE WHEN count(*) >= 4 THEN '4+'
             |                      WHEN count(*) >= 2 THEN '2-3'
             |                      ELSE '1' END AS seg_a
             |           FROM orders WHERE year(o_orderdate) = 1996
             |           GROUP BY 1),
             |b AS (SELECT o_custkey AS cust,
             |             CASE WHEN count(*) >= 4 THEN '4+'
             |                  WHEN count(*) >= 2 THEN '2-3'
             |                  ELSE '1' END AS seg_b
             |      FROM orders WHERE year(o_orderdate) = 1997
             |      GROUP BY 1)
             |SELECT coalesce(seg_a, '0') AS seg_1996,
             |       coalesce(seg_b, '0') AS seg_1997,
             |       CAST(count(*) AS BIGINT) AS n_customers
             |FROM a FULL OUTER JOIN b USING (cust)
             |GROUP BY 1, 2""".stripMargin)),

    // ── Repurchase cycle: consecutive same-(customer, part) purchase
    //    gaps in days (lag over ONE (cust, part)-keyed shuffle), rolled
    //    to the brand axis: n repurchases, mean gap, share ≤ 30 days.
    QueryDef("q_repurchase_cycle",
      (s, d) => {
        val w = Window.partitionBy(col("cust"), col("l_partkey"))
          .orderBy(col("day"), col("l_orderkey"), col("l_linenumber"))
        val gaps = Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey").as("cust")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("cust"), col("l_partkey"), col("l_orderkey"),
            col("l_linenumber"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) " +
              "div 86400000000").as("day"))
          .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
          .filter(col("gap").isNotNull)
        gaps.join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_repurchases"), sum(col("gap")).as("sg"),
            sum(when(col("gap") <= 30, 1L).otherwise(0L)).as("n_fast"))
          .selectExpr("p_brand",
            "CAST(n_repurchases AS BIGINT) AS n_repurchases",
            "sg div n_repurchases AS mean_gap_days",
            "n_fast * 1000000 div n_repurchases AS fast_share_e6")
      },
      Some("""WITH g AS (
             |  SELECT o.o_custkey AS cust, l.l_partkey,
             |         epoch_us(l.l_shipdate) // 86400000000
             |           - lag(epoch_us(l.l_shipdate) // 86400000000)
             |             OVER (PARTITION BY o.o_custkey, l.l_partkey
             |                   ORDER BY epoch_us(l.l_shipdate)
             |                     // 86400000000, l.l_orderkey,
             |                     l.l_linenumber) AS gap
             |  FROM lineitem l JOIN orders o
             |    ON l.l_orderkey = o.o_orderkey)
             |SELECT p.p_brand,
             |       CAST(count(*) AS BIGINT) AS n_repurchases,
             |       CAST(sum(g.gap) AS BIGINT) // count(*)
             |         AS mean_gap_days,
             |       CAST(sum(CASE WHEN g.gap <= 30 THEN 1 ELSE 0 END)
             |         AS BIGINT) * 1000000 // count(*) AS fast_share_e6
             |FROM g JOIN part p ON g.l_partkey = p.p_partkey
             |WHERE g.gap IS NOT NULL
             |GROUP BY 1""".stripMargin)),

    // ── Share of wallet: per customer the top-brand spend share (exact
    //    cents, argmax by window over the customer-keyed rollup), then
    //    the decile histogram per market segment — concentration of
    //    loyalty, bounded output.
    QueryDef("q_share_of_wallet",
      (s, d) => {
        val cb = Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey").as("cust")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("cust"), col("p_brand"))
          .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("spend"))
        val per = cb
          .withColumn("tot", sum(col("spend")).over(
            Window.partitionBy(col("cust"))))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("cust"))
              .orderBy(col("spend").desc, col("p_brand"))))
          .filter(col("rk") === 1)
          .withColumn("sow_e6", expr("spend * 1000000 div tot"))
        per.join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("cust") === col("c_custkey"))
          .groupBy(col("c_mktsegment"),
            expr("least(sow_e6 div 100000, 9)").as("decile"))
          .agg(count(lit(1)).as("n_customers"))
          .selectExpr("c_mktsegment", "CAST(decile AS BIGINT) AS decile",
            "CAST(n_customers AS BIGINT) AS n_customers")
      },
      Some("""WITH cb AS (
             |  SELECT o.o_custkey AS cust, p.p_brand,
             |         CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5)
             |           AS BIGINT)) AS BIGINT) AS spend
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN part p ON l.l_partkey = p.p_partkey
             |  GROUP BY 1, 2),
             |per AS (SELECT cust, spend,
             |               CAST(sum(spend) OVER (PARTITION BY cust)
             |                 AS BIGINT) AS tot,
             |               row_number() OVER (PARTITION BY cust
             |                 ORDER BY spend DESC, p_brand) AS rk
             |        FROM cb),
             |sow AS (SELECT cust, spend * 1000000 // tot AS sow_e6
             |        FROM per WHERE rk = 1)
             |SELECT c.c_mktsegment,
             |       CAST(least(sow_e6 // 100000, 9) AS BIGINT) AS decile,
             |       CAST(count(*) AS BIGINT) AS n_customers
             |FROM sow JOIN customer c ON sow.cust = c.c_custkey
             |GROUP BY 1, 2""".stripMargin))
  )
}
