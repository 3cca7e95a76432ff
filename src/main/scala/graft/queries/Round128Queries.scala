package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-128 batch: ranking-evaluation metrics the retrieval family
  * (q_ndcg, q_retrieval_metrics, q_rbo) doesn't yet cover — MAP@5 of a
  * popularity recommender against next-year holdout purchases, MRR of
  * the first returned line in price-ranked orders, and per-customer
  * basket diversity (Gini–Simpson over brands — the intra-list
  * diversity read). Average precision is an exact rational folded per
  * customer; every mean is an integer div at e6.
  */
object Round128Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── MAP@5: train = orders before 1997 (top-5 global parts by
    //    distinct-customer count, ties by partkey), test = 1997+ buys.
    //    AP@5 per test customer = Σ_hits (hits_so_far/rank) / min(5, R).
    //    The 5-row model is broadcast; ONE customer-keyed aggregate
    //    closes the metric.
    QueryDef("q_map_at_k",
      (s, d) => {
        val buys = Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey"),
              expr("year(o_orderdate)").as("yr")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_partkey").as("part"),
            col("yr"))
        val rec = buys.filter(col("yr") < 1997)
          .groupBy(col("part"))
          .agg(countDistinct(col("cust")).as("pop"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("pop").desc, col("part"))))
          .filter(col("rank") <= 5)
          .select(col("part"), col("rank"))
        val test = buys.filter(col("yr") >= 1997)
          .select(col("cust"), col("part")).distinct()
          .localCheckpoint(false) // relevant-size agg + the hit join
        val rsize = test.groupBy(col("cust")).agg(count(lit(1)).as("r"))
        // hits_so_far at a hit of rank k = # recommended parts of rank ≤k
        // the customer bought; AP numerator folds as Σ hits@k/k over hits.
        val hits = test.join(broadcast(rec), "part")
        val ap = hits.as("h").join(hits.as("h2"),
            col("h.cust") === col("h2.cust") &&
              col("h2.rank") <= col("h.rank"))
          .groupBy(col("h.cust").as("cust"), col("h.rank").as("rank"))
          .agg(count(lit(1)).as("hits_at"))
          // precision term e12 to keep the per-customer fold exact
          .groupBy(col("cust"))
          .agg(sum(expr("hits_at * 1000000000000 div rank")).as("num_e12"))
        rsize.join(ap, Seq("cust"), "left")
          .select(expr(
            """coalesce(num_e12, 0) div least(r, 5)""").as("ap_e12"))
          .agg(count(lit(1)).as("n_customers"),
            sum(col("ap_e12")).as("sum_ap"))
          .selectExpr("CAST(n_customers AS BIGINT) AS n_customers",
            "sum_ap div (n_customers * 1000000) AS map_e6")
      },
      Some("""WITH buys AS (
             |  SELECT o.o_custkey AS cust, l.l_partkey AS part,
             |         year(o.o_orderdate) AS yr
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
             |rec AS (SELECT part, rank FROM (
             |          SELECT part,
             |                 CAST(row_number() OVER (ORDER BY
             |                   count(DISTINCT cust) DESC, part)
             |                   AS BIGINT) AS rank
             |          FROM buys WHERE yr < 1997 GROUP BY part)
             |        WHERE rank <= 5),
             |test AS (SELECT DISTINCT cust, part FROM buys
             |         WHERE yr >= 1997),
             |rsize AS (SELECT cust, CAST(count(*) AS BIGINT) AS r
             |          FROM test GROUP BY 1),
             |hits AS (SELECT t.cust, rec.rank FROM test t
             |         JOIN rec ON t.part = rec.part),
             |ap AS (SELECT h.cust, h.rank,
             |              CAST(count(*) AS BIGINT) AS hits_at
             |       FROM hits h JOIN hits h2 ON h.cust = h2.cust
             |         AND h2.rank <= h.rank
             |       GROUP BY 1, 2),
             |num AS (SELECT cust,
             |               CAST(sum(hits_at * 1000000000000 // rank)
             |                 AS BIGINT) AS num_e12
             |        FROM ap GROUP BY 1),
             |peru AS (SELECT coalesce(num_e12, 0)
             |                  // least(r, 5) AS ap_e12
             |         FROM rsize LEFT JOIN num USING (cust))
             |SELECT CAST(count(*) AS BIGINT) AS n_customers,
             |       CAST(sum(ap_e12) AS BIGINT)
             |         // (count(*) * 1000000) AS map_e6
             |FROM peru""".stripMargin)),

    // ── MRR of the first returned line when an order's lines are
    //    ranked by extendedprice desc (cents, ties by linenumber): ONE
    //    order-keyed shuffle carries rank + the argmin, one scalar agg
    //    closes. Orders with no 'R' line contribute reciprocal 0 (MRR
    //    over the full query set, the standard convention).
    QueryDef("q_mrr",
      (s, d) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("cents").desc, col("l_linenumber"))
        val ranked = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long")
              .as("cents"),
            (col("l_returnflag") === "R").as("ret"))
          .withColumn("rank", row_number().over(w))
        ranked.groupBy(col("l_orderkey"))
          .agg(min(when(col("ret"), col("rank"))).as("first_ret"))
          .agg(count(lit(1)).as("n_orders"),
            sum(when(col("first_ret").isNotNull, 1L).otherwise(0L))
              .as("n_with_return"),
            sum(when(col("first_ret").isNotNull,
              expr("1000000 div first_ret")).otherwise(0L)).as("sum_rr"))
          .selectExpr("CAST(n_orders AS BIGINT) AS n_orders",
            "CAST(n_with_return AS BIGINT) AS n_with_return",
            "sum_rr div n_orders AS mrr_e6")
      },
      Some("""WITH ranked AS (
             |  SELECT l_orderkey,
             |         CAST(row_number() OVER (PARTITION BY l_orderkey
             |           ORDER BY CAST(floor(l_extendedprice * 100 + 0.5)
             |             AS BIGINT) DESC, l_linenumber) AS BIGINT)
             |           AS rank,
             |         l_returnflag = 'R' AS ret
             |  FROM lineitem),
             |o AS (SELECT l_orderkey,
             |             min(CASE WHEN ret THEN rank END) AS first_ret
             |      FROM ranked GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_orders,
             |       CAST(sum(CASE WHEN first_ret IS NOT NULL THEN 1
             |         ELSE 0 END) AS BIGINT) AS n_with_return,
             |       CAST(sum(CASE WHEN first_ret IS NOT NULL
             |           THEN 1000000 // first_ret ELSE 0 END) AS BIGINT)
             |         // count(*) AS mrr_e6
             |FROM o""".stripMargin)),

    // ── Basket diversity: per customer the Gini–Simpson index over
    //    purchased brand counts, 1 − Σcᵢ(cᵢ−1)/(n(n−1)) in exact e6
    //    (the unbiased pairs form — integer throughout), then the
    //    bounded decile rollup. Part dim broadcasts into the lineitem
    //    scan; two keyed aggregates share the customer prefix.
    QueryDef("q_basket_diversity",
      (s, d) => {
        val cb = Tables.lineitem(s, d)
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("o_custkey").as("cust"), col("p_brand"))
          .agg(count(lit(1)).as("c"))
        val perCust = cb.groupBy(col("cust"))
          .agg(sum(col("c")).as("n"), sum(expr("c * (c - 1)")).as("ss"),
            count(lit(1)).as("k"))
          .filter(col("n") >= 5)
          .withColumn("gs_e6",
            expr("1000000 - ss * 1000000 div (n * (n - 1))"))
        perCust
          .groupBy(expr("least(gs_e6 div 100000, 9)").as("decile"))
          .agg(count(lit(1)).as("n_customers"), sum(col("k")).as("sk"),
            sum(col("n")).as("sn"))
          .selectExpr("CAST(decile AS BIGINT) AS decile",
            "CAST(n_customers AS BIGINT) AS n_customers",
            "sk div n_customers AS avg_brands",
            "sn div n_customers AS avg_lines")
      },
      Some("""WITH cb AS (
             |  SELECT o.o_custkey AS cust, p.p_brand,
             |         CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN part p ON l.l_partkey = p.p_partkey
             |  GROUP BY 1, 2),
             |pc AS (SELECT cust, CAST(sum(c) AS BIGINT) AS n,
             |              CAST(sum(c * (c - 1)) AS BIGINT) AS ss,
             |              CAST(count(*) AS BIGINT) AS k
             |       FROM cb GROUP BY 1 HAVING sum(c) >= 5)
             |SELECT CAST(least((1000000 - ss * 1000000 // (n * (n - 1)))
             |         // 100000, 9) AS BIGINT) AS decile,
             |       CAST(count(*) AS BIGINT) AS n_customers,
             |       CAST(sum(k) AS BIGINT) // count(*) AS avg_brands,
             |       CAST(sum(n) AS BIGINT) // count(*) AS avg_lines
             |FROM pc GROUP BY 1""".stripMargin))
  )
}
