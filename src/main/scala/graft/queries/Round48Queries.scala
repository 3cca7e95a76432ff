package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-48 batch: three more TPC-H ad-hoc shapes over the shared
  * schema (which carries no partsupp — lineitem is the supply
  * relation): Q2's correlated min-cost supplier (per-part argmin with
  * tie-keep-all, a grouped-min broadcast join-back, NOT a window over
  * the supply table), Q18's large-order having-join-back, and Q16's
  * excluded-supplier distinct-count rollup.
  */
object Round48Queries {

  private def centsCol(c: String) = floor(col(c) * 100 + 0.5).cast("long")
  private def cents(c: String) = s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  def defs: Seq[QueryDef] = Seq(

    // ── Q2 shape: for each STANDARD part of size ≤ 10, the cheapest
    //    EUROPE supplier by best historical unit price. Supply pairs
    //    reduce FIRST (one groupBy off the raw scan); the per-part min
    //    broadcasts back — ties keep every optimal supplier, as Q2's
    //    correlated subquery does.
    QueryDef("q_tpch_min_cost",
      (s, d) => {
        val eur = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .join(broadcast(Tables.region(s, d)
              .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val pts = Tables.part(s, d)
          .filter(col("p_type") === "STANDARD" && col("p_size") <= 10)
          .select(col("p_partkey"))
        val supply = Tables.lineitem(s, d).select(
            col("l_partkey"), col("l_suppkey"),
            centsCol("l_extendedprice").as("pc"),
            floor(col("l_quantity") + 0.5).cast("long").as("qb"))
          .withColumn("unit_mc", expr("(pc * 1000) div qb"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(col("unit_mc")).as("cost_mc"))
          .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
          .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
        val best = supply.groupBy(col("p_partkey").as("pk"))
          .agg(min(col("cost_mc")).as("best_mc"))
        supply.join(broadcast(best),
            col("p_partkey") === col("pk") && col("cost_mc") === col("best_mc"))
          .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
            col("n_name"), col("cost_mc"))
      },
      Some(s"""WITH eur AS (SELECT s_suppkey, s_name, n_name
              |            FROM supplier JOIN nation ON s_nationkey = n_nationkey
              |                 JOIN region ON n_regionkey = r_regionkey
              |            WHERE r_name = 'EUROPE'),
              |pts AS (SELECT p_partkey FROM part
              |        WHERE p_type = 'STANDARD' AND p_size <= 10),
              |supply AS (SELECT l_partkey AS p_partkey, s_suppkey, s_name, n_name,
              |             CAST(min((${cents("l_extendedprice")} * 1000)
              |               // CAST(floor(l_quantity + 0.5) AS BIGINT))
              |               AS BIGINT) AS cost_mc
              |           FROM lineitem
              |           JOIN pts ON l_partkey = p_partkey
              |           JOIN eur ON l_suppkey = s_suppkey
              |           GROUP BY 1, 2, 3, 4),
              |best AS (SELECT p_partkey, min(cost_mc) AS best_mc
              |         FROM supply GROUP BY 1)
              |SELECT p_partkey, s_suppkey, s_name, n_name, cost_mc
              |FROM supply JOIN best USING (p_partkey)
              |WHERE cost_mc = best_mc""".stripMargin)),

    // ── Q18 shape: orders whose total quantity tops 300 — the grouped
    //    HAVING filter join-back, with the customer dim broadcast.
    QueryDef("q_tpch_large_orders",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("total_qty"))
          .filter(col("total_qty") > 300L)
        Tables.orders(s, d)
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_name"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
              .as("o_day"),
            centsCol("o_totalprice").as("price_c"), col("total_qty"))
      },
      Some(s"""WITH big AS (SELECT l_orderkey,
              |               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
              |                 AS BIGINT) AS total_qty
              |             FROM lineitem GROUP BY 1 HAVING total_qty > 300)
              |SELECT c_name, c_custkey, o_orderkey,
              |       epoch_us(o_orderdate) // 86400000000 AS o_day,
              |       ${cents("o_totalprice")} AS price_c, total_qty
              |FROM orders JOIN big ON o_orderkey = l_orderkey
              |JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // ── Q16 shape: how many distinct suppliers can deliver each
    //    (brand, type, size-bucket) — PROMO parts excluded, suppliers
    //    in deficit (negative account balance) excluded via anti-join.
    QueryDef("q_tpch_parts_supp",
      (s, d) => {
        val excl = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0.0).select(col("s_suppkey").as("xk"))
        val pa = Tables.part(s, d)
          .filter(col("p_type") =!= "PROMO")
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            (col("p_size") % 5).cast("long").as("size_bucket"))
        Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
          .join(broadcast(excl), col("l_suppkey") === col("xk"), "left_anti")
          .join(broadcast(pa), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("size_bucket"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      Some("""SELECT p_brand, p_type, CAST(p_size % 5 AS BIGINT) AS size_bucket,
             |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) sp
             |JOIN part ON l_partkey = p_partkey
             |WHERE p_type <> 'PROMO'
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3""".stripMargin))
  )
}
