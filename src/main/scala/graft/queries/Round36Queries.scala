package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Round-36 batch: TPC-H Q3 shape (unshipped-order revenue ranking) and
  * a semi-additive month-end rollup.
  */
object Round36Queries {

  private def centsCol(c: String) = floor(col(c) * 100 + 0.5).cast("long")
  private def cents(c: String) = s"CAST(floor($c * 100 + 0.5) AS BIGINT)"

  def defs: Seq[QueryDef] = Seq(

    // ── TPC-H Q3 shape: top-10 not-yet-shipped orders by revenue for
    //    the BUILDING segment at cutoff 1998-01-01. Lineitem (big) joins
    //    the filtered orders; the segment-filtered customer set
    //    broadcasts; one (order) keyed aggregate then a top-k merge.
    QueryDef("q_tpch_unshipped",
      (s, d) => {
        val cut = 883612800L // 1998-01-01 UTC epoch seconds
        val c = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val o = Tables.orders(s, d)
          .filter(unix_timestamp(col("o_orderdate")) < cut)
          .select(col("o_orderkey"), col("o_custkey"),
            expr("unix_timestamp(o_orderdate) div 86400").as("o_day"),
            col("o_orderpriority"))
        val li = Tables.lineitem(s, d)
          .filter(unix_timestamp(col("l_shipdate")) > cut)
          .select(col("l_orderkey"),
            (centsCol("l_extendedprice") *
              (lit(100L) - centsCol("l_discount"))).as("rev_cp"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"), col("o_day"), col("o_orderpriority"))
          .agg(sum(col("rev_cp")).as("rev_cp"), count(lit(1)).as("n_items"))
          .orderBy(col("rev_cp").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT o_orderkey,
              |       CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS o_day,
              |       o_orderpriority,
              |       CAST(sum(${cents("l_extendedprice")}
              |                * (100 - ${cents("l_discount")})) AS BIGINT)
              |         AS rev_cp,
              |       CAST(count(*) AS BIGINT) AS n_items
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND epoch(o_orderdate) < 883612800
              |  AND epoch(l_shipdate) > 883612800
              |GROUP BY 1, 2, 3
              |ORDER BY rev_cp DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ── Semi-additive measure: the month-end (last-observation) value
    //    per user, SUMMED per month — balances add across accounts but
    //    not across time. One argmax-struct aggregate + one keyed sum.
    QueryDef("q_semiadditive",
      (s, d) => Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000 div 30").as("month"),
          unix_micros(col("ts")).as("t_us"), col("event_id").as("tie"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("user_id"), col("month"))
        .agg(max(struct(col("t_us"), col("tie"), col("cents")))
          .getField("cents").as("eom_cents"))
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("eom_cents")).as("balance_cents")),
      Some("""WITH e AS (
             |  SELECT user_id,
             |         epoch_us(ts) // 86400000000 // 30 AS month,
             |         epoch_us(ts) AS t_us, event_id AS tie,
             |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |  FROM events),
             |eom AS (
             |  SELECT user_id, month, cents AS eom_cents FROM (
             |    SELECT user_id, month, cents,
             |           row_number() OVER (PARTITION BY user_id, month
             |             ORDER BY t_us DESC, tie DESC) AS rn
             |    FROM e) WHERE rn = 1)
             |SELECT month, CAST(count(*) AS BIGINT) AS n_users,
             |       CAST(sum(eom_cents) AS BIGINT) AS balance_cents
             |FROM eom GROUP BY month""".stripMargin))
  )
}
