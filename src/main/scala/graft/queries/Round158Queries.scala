package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Bucketed
import org.apache.spark.sql.functions._

/** Round-158 batch: bucketed-layout ADOPTION pass 2 (r9 VERDICT task 1).
  * BucketAuditMain's registry-wide recommendation table (r10, broadcast
  * disabled so the cluster-scale sort-merge shape is audited) ranks the
  * fact tables' hot keys:
  *
  *   orders(o_custkey) 23 join sides / orders(o_orderkey) 20 /
  *   customer(c_custkey) 20 / lineitem(l_orderkey) 19
  *
  * The two FACT tables are orders and lineitem, and their shared hot key
  * is the orderkey — the one join where neither side can broadcast at
  * 100 TB (customer-keyed joins pair a fact with a dim that still
  * broadcasts at scale). So the adoption target is: orders bucketBy
  * o_orderkey + lineitem bucketBy l_orderkey (written under the shared
  * column name), making every later orders⋈lineitem join AND any
  * orderkey-keyed aggregate exchange-free.
  */
object Round158Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Fact⋈fact rollup over the two bucketed FACT tables: per-order
    //    line revenue vs header price from bucketed lineitem ⋈ bucketed
    //    orders — scan → SMJ (no exchange) → orderkey-keyed agg (no
    //    exchange). BucketedLayoutAdoptionSpec pins the zero-exchange
    //    plan; the oracle pins that bucketing never changes results.
    QueryDef("q_bucketed_fact_join",
      (s, d) => {
        Bucketed.writeBucketed(
          Tables.orders(s, d).select(col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
              .as("hdr_c")),
          "graft_bkt_orders_ok", "o_orderkey", 8)
        Bucketed.writeBucketed(
          Tables.lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
            expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
              .as("line_c")),
          "graft_bkt_lineitem_ok", "o_orderkey", 8)
        Bucketed.join(s, "graft_bkt_lineitem_ok", "graft_bkt_orders_ok",
            "o_orderkey")
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_lines"), sum(col("line_c")).as("lines_c"),
            max(col("hdr_c")).as("hdr_c"))
      },
      Some("""SELECT l_orderkey AS o_orderkey,
             |       CAST(count(*) AS BIGINT) AS n_lines,
             |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
             |         AS BIGINT)) AS BIGINT) AS lines_c,
             |       CAST(max(CAST(floor(o_totalprice * 100 + 0.5)
             |         AS BIGINT)) AS BIGINT) AS hdr_c
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1""".stripMargin))
  )
}
