package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BucketAuditSpec extends SparkSpec {

  private def noBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("plain scan-key join: both sides reported bucketable with scan column names") {
    noBroadcast {
      val j = Tables.orders(spark, sf()).join(Tables.lineitem(spark, sf()),
        col("o_orderkey") === col("l_orderkey"))
      val found = BucketAudit.shuffledJoins(j)
      assert(found.size === 1)
      val s = found.head
      assert(s.leftTable === Some("orders") && s.leftKeys === Seq("o_orderkey"))
      assert(s.rightTable === Some("lineitem") && s.rightKeys === Seq("l_orderkey"))
    }
  }

  test("computed join key: that side is NOT claimed bucketable") {
    noBroadcast {
      val j = Tables.orders(spark, sf()).join(Tables.lineitem(spark, sf()),
        col("o_orderkey") === col("l_orderkey") % 10)
      val found = BucketAudit.shuffledJoins(j)
      assert(found.size === 1)
      assert(found.head.leftTable === Some("orders"))
      assert(found.head.rightTable === None,
        "a modulo-derived key can never match a rest-layout bucket hash")
    }
  }

  test("aggregate-derived side keeps bucketability when the key survives untransformed") {
    noBroadcast {
      val perOrder = Tables.lineitem(spark, sf())
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val j = Tables.orders(spark, sf()).join(perOrder,
        col("o_orderkey") === col("l_orderkey"))
      val found = BucketAudit.shuffledJoins(j)
      assert(found.size === 1)
      // grouping key keeps its scan exprId through the aggregate → still
      // traceable; bucketing lineitem by l_orderkey co-locates the agg AND
      // the join (same distribution), so claiming it is correct.
      assert(found.head.rightTable === Some("lineitem") &&
        found.head.rightKeys === Seq("l_orderkey"))
    }
  }

  test("broadcast joins are excluded — bucketing buys them nothing") {
    // default threshold: nation (tiny) broadcasts
    val j = Tables.nation(spark, sf()).join(Tables.customer(spark, sf()),
      col("n_nationkey") === col("c_nationkey"))
    assert(BucketAudit.shuffledJoins(j).isEmpty)
  }

  test("audit rollup counts join sides per (table, keys)") {
    noBroadcast {
      def q1 = Tables.orders(spark, sf()).join(Tables.lineitem(spark, sf()),
        col("o_orderkey") === col("l_orderkey"))
      def q2 = Tables.lineitem(spark, sf())
        .join(Tables.part(spark, sf()), col("l_partkey") === col("p_partkey"))
      val rec = BucketAudit.audit(spark, Seq("qa", "qb"),
          Map("qa" -> q1, "qb" -> q2))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(rec(("orders", "o_orderkey")) === ((1L, 1L)))
      assert(rec(("lineitem", "l_orderkey")) === ((1L, 1L)))
      assert(rec(("lineitem", "l_partkey")) === ((1L, 1L)))
      assert(rec(("part", "p_partkey")) === ((1L, 1L)))
    }
  }
}
