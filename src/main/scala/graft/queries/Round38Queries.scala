package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-38 batch: the four classic TPC-H ad-hoc shapes the suite did
  * not yet cover — Q13 (customer order-count distribution, the outer-join
  * histogram), Q14 (promo revenue share, conditional aggregation), Q10
  * (returned-item revenue ranking) and Q22 (idle rich customers:
  * scalar-subquery threshold + anti join). Adapted to the shared testdata
  * columns (no comment/shipmode columns; `p_type` is single-word, so the
  * promo predicate is equality). Money rides the repo-standard exact
  * cents / cent-percent integers; the one share ratio is a DECIMAL(38,0)
  * truncating division (HUGEINT `//` on the oracle side).
  *
  * Scale notes per query inline — the common theme: aggregate the fact
  * table FIRST (map-side partial combine), join dims after, broadcast
  * only genuinely dim-sized sides.
  */
object Round38Queries {

  private def centsCol(c: String) = floor(col(c) * 100 + 0.5).cast("long")
  private def cents(c: String) = s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  def defs: Seq[QueryDef] = Seq(

    // ── TPC-H Q13 shape: how many customers placed 0, 1, 2, … orders?
    //    Orders pre-aggregate to the customer grain (ONE fact exchange),
    //    then a LEFT join keeps the zero-order customers, then the
    //    histogram aggregate is over a tiny domain. The priority filter
    //    stands in for Q13's comment regex (no o_comment column).
    QueryDef("q_tpch_custdist",
      (s, d) => {
        val oc = Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
        Tables.customer(s, d).select(col("c_custkey"))
          .join(oc, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""WITH oc AS (
             |  SELECT o_custkey, count(*) AS n FROM orders
             |  WHERE o_orderpriority <> '1-URGENT' GROUP BY 1)
             |SELECT CAST(coalesce(n, 0) AS BIGINT) AS c_count,
             |       CAST(count(*) AS BIGINT) AS custdist
             |FROM customer LEFT JOIN oc ON c_custkey = o_custkey
             |GROUP BY 1""".stripMargin)),

    // ── TPC-H Q14 shape: what share of 1997 revenue came from PROMO
    //    parts? Part is the only join (p_partkey → p_type); the share is
    //    one conditional aggregate over the joined scan. part is a true
    //    dimension (200k·SF rows) — broadcast it; revenue stays in exact
    //    cent-percent integers and the share is a DECIMAL(38,0)
    //    truncating division (sums overflow BIGINT·1e6).
    QueryDef("q_tpch_promo",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(year(col("l_shipdate")) === 1997)
          .select(col("l_partkey"),
            (centsCol("l_extendedprice") *
              (lit(100L) - centsCol("l_discount"))).as("rev_cp"))
        val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO", col("rev_cp"))
              .otherwise(0L)).as("promo_cp"),
            sum(col("rev_cp")).as("total_cp"))
          .select(col("promo_cp"), col("total_cp"),
            expr("""CAST(CAST(promo_cp AS DECIMAL(38,0)) * 1000000
                   |     div CAST(total_cp AS DECIMAL(38,0)) AS BIGINT)
                   |""".stripMargin).as("promo_share_e6"))
      },
      Some(s"""WITH j AS (
              |  SELECT p_type,
              |         ${cents("l_extendedprice")}
              |           * (100 - ${cents("l_discount")}) AS rev_cp
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  WHERE year(l_shipdate) = 1997),
              |m AS (
              |  SELECT sum(CASE WHEN p_type = 'PROMO' THEN rev_cp
              |                  ELSE 0 END) AS promo_cp,
              |         sum(rev_cp) AS total_cp
              |  FROM j)
              |SELECT CAST(promo_cp AS BIGINT) AS promo_cp,
              |       CAST(total_cp AS BIGINT) AS total_cp,
              |       CAST(CAST(promo_cp AS HUGEINT) * 1000000
              |            // CAST(total_cp AS HUGEINT) AS BIGINT)
              |         AS promo_share_e6
              |FROM m""".stripMargin)),

    // ── TPC-H Q10 shape: top-20 customers by returned-item revenue.
    //    lineitem(R) ⋈ orders is the one big shuffle; the result is
    //    pre-aggregated to the customer grain BEFORE customer attributes
    //    join in (broadcast — the survivor set is ≤ |customer|).
    //    Deterministic: rev desc, custkey asc.
    QueryDef("q_tpch_returns",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            (centsCol("l_extendedprice") *
              (lit(100L) - centsCol("l_discount"))).as("rev_cp"))
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          centsCol("c_acctbal").as("acctbal_c"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("rev_cp")).as("rev_cp"), count(lit(1)).as("n_items"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            col("acctbal_c"), col("rev_cp"), col("n_items"))
          .orderBy(col("rev_cp").desc, col("c_custkey"))
          .limit(20)
      },
      Some(s"""WITH r AS (
              |  SELECT o_custkey,
              |         sum(${cents("l_extendedprice")}
              |             * (100 - ${cents("l_discount")})) AS rev_cp,
              |         count(*) AS n_items
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  WHERE l_returnflag = 'R'
              |  GROUP BY 1)
              |SELECT c_custkey, c_name,
              |       CAST(c_nationkey AS BIGINT) AS c_nationkey,
              |       ${cents("c_acctbal")} AS acctbal_c,
              |       CAST(rev_cp AS BIGINT) AS rev_cp,
              |       CAST(n_items AS BIGINT) AS n_items
              |FROM r JOIN customer ON o_custkey = c_custkey
              |ORDER BY rev_cp DESC, c_custkey LIMIT 20""".stripMargin)),

    // ── TPC-H Q22 shape: "idle rich" — customers whose balance beats the
    //    average positive balance but who placed no order since 2000-01-01
    //    (the corpus runs 1995..2001-08; "never ordered at all" is empty
    //    on this data, so recency-idle is the meaningful Q22 reading).
    //    The threshold is a 1-row scalar aggregate (broadcast cross
    //    join); the idle test is ONE left-anti join against the
    //    date-filtered orders scan (pushed predicate, o_custkey-pruned
    //    columns). Exact integer threshold: sum-cents div count.
    QueryDef("q_tpch_idle_rich",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          centsCol("c_acctbal").as("bal_c"))
        val thr = c.filter(col("bal_c") > 0)
          .agg(expr("sum(bal_c) div count(*)").as("thr_c"))
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        c.join(broadcast(thr))
          .filter(col("bal_c") > col("thr_c"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("bal_sum_c"))
      },
      Some(s"""WITH c AS (
              |  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
              |         ${cents("c_acctbal")} AS bal_c
              |  FROM customer),
              |t AS (SELECT sum(bal_c) // count(*) AS thr_c
              |      FROM c WHERE bal_c > 0)
              |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
              |       CAST(sum(bal_c) AS BIGINT) AS bal_sum_c
              |FROM c CROSS JOIN t
              |WHERE bal_c > thr_c
              |  AND NOT EXISTS (SELECT 1 FROM orders
              |                  WHERE o_custkey = c_custkey
              |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
              |GROUP BY 1""".stripMargin))
  )
}
