package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-60 batch: the three classic TPC-H shapes still missing from
  * the relational sweep — Q6 (forecasting revenue change: the pure
  * scan-filter-agg whose entire cost is predicate pushdown), Q4 (order
  * priority checking: EXISTS → left-semi with an inequality residual;
  * adapted to ship-lateness since the testdata lineitem carries no
  * commit/receipt dates), and Q17 (small-quantity-order revenue: the
  * correlated per-part average turned into one grouped join).
  */
object Round60Queries {

  private val day = "86400000000"

  def defs: Seq[QueryDef] = Seq(

    // ── Q6 shape: one scan, every predicate pushed; revenue in
    //    cents×cents (price_cents · discount_cents) exact units.
    QueryDef("q_tpch_forecast_revenue",
      (s, d) => Tables.lineitem(s, d)
        // Pushdown companions: conservative RAW-column supersets of the
        // exact cents predicates below. The exact forms wrap columns in
        // floor()/unix_micros() and can never reach the parquet reader;
        // these raw comparisons DO (PushedFilters + row-group stats
        // pruning), and the exact predicates still decide membership.
        .where(expr(
          "l_shipdate >= TIMESTAMP '1993-12-31 00:00:00' AND " +
            "l_shipdate <= TIMESTAMP '1995-01-02 00:00:00' AND " +
            "l_discount >= 0.0449 AND l_discount <= 0.0751 AND " +
            "l_quantity <= 23.51"))
        .select(
          expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $day")
            .as("sday"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("pc"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("dc"),
          floor(col("l_quantity") + 0.5).cast("long").as("q"))
        // 1994 = days [8766, 9131); discount 5..7 cents; qty < 24
        .where(col("sday") >= 8766L && col("sday") < 9131L &&
          col("dc").between(5L, 7L) && col("q") < 24L)
        .agg(count(lit(1)).as("n_items"),
          sum(col("pc") * col("dc")).as("revenue_cc")),
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_items,
              |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
              |                AS BIGINT)
              |              * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
              |         AS BIGINT) AS revenue_cc
              |FROM lineitem
              |WHERE epoch_us(l_shipdate) // $day >= 8766
              |  AND epoch_us(l_shipdate) // $day < 9131
              |  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT)
              |        BETWEEN 5 AND 7
              |  AND CAST(floor(l_quantity + 0.5) AS BIGINT) < 24"""
        .stripMargin)),

    // ── Q4 shape: orders placed in 1994H1 with at least one lineitem
    //    shipped 60+ days after order date (EXISTS → left semi with
    //    an inequality residual on the join).
    QueryDef("q_tpch_priority",
      (s, d) => {
        val o = Tables.orders(s, d)
          // pushdown companion (see q_tpch_forecast_revenue)
          .where(expr("o_orderdate >= TIMESTAMP '1994-12-31 00:00:00' " +
            "AND o_orderdate <= TIMESTAMP '1995-07-02 00:00:00'"))
          .select(col("o_orderkey"),
          col("o_orderpriority"),
          expr(s"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div $day")
            .as("oday"))
          .where(col("oday") >= 9131L && col("oday") < 9312L)
        val li = Tables.lineitem(s, d).select(col("l_orderkey"),
          expr(s"unix_micros(CAST(l_shipdate AS TIMESTAMP)) div $day")
            .as("sday"))
        o.join(li, col("o_orderkey") === col("l_orderkey") &&
            col("sday") >= col("oday") + 60L, "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some(s"""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
              |FROM orders
              |WHERE epoch_us(o_orderdate) // $day >= 9131
              |  AND epoch_us(o_orderdate) // $day < 9312
              |  AND EXISTS (
              |    SELECT 1 FROM lineitem
              |    WHERE l_orderkey = o_orderkey
              |      AND epoch_us(l_shipdate) // $day
              |            >= epoch_us(o_orderdate) // $day + 60)
              |GROUP BY 1""".stripMargin)),

    // ── Q17 shape: revenue (÷7, offset-free: numerator nonneg) from
    //    lineitems under 20% of their part's average quantity, for one
    //    brand's small parts. The correlated AVG is ONE grouped join:
    //    per-part thresholds broadcast back onto the scan.
    QueryDef("q_tpch_small_qty",
      (s, d) => {
        val brand = Tables.part(s, d)
          .where(col("p_brand") === "Brand#23" && col("p_size") < 20)
          .select(col("p_partkey"))
        val li = Tables.lineitem(s, d).select(col("l_partkey"),
          floor(col("l_quantity") + 0.5).cast("long").as("q"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("pc"))
        val thr = li.join(broadcast(brand),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey").as("tk"))
          .agg(expr("sum(q) * 20 div count(1)").as("thr_e2"))
        li.join(broadcast(thr), col("l_partkey") === col("tk"))
          .where(col("q") * 100 < col("thr_e2"))
          .agg(count(lit(1)).as("n_items"),
            expr("sum(pc) div 7").as("avg_yearly_cents"))
      },
      Some("""WITH brand AS (SELECT p_partkey FROM part
             |               WHERE p_brand = 'Brand#23' AND p_size < 20),
             |li AS (SELECT l_partkey,
             |              CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
             |              CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             |                AS pc
             |       FROM lineitem),
             |thr AS (SELECT l_partkey AS tk,
             |               CAST(sum(q) AS BIGINT) * 20 // count(*) AS thr_e2
             |        FROM li JOIN brand ON l_partkey = p_partkey
             |        GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_items,
             |       CAST(sum(pc) // 7 AS BIGINT) AS avg_yearly_cents
             |FROM li JOIN thr ON l_partkey = tk
             |WHERE q * 100 < thr_e2""".stripMargin))
  )
}
