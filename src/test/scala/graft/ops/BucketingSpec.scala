package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Demonstrates the co-located join path for 100 TB fact-fact joins:
  * bucketed tables on the join key let SortMergeJoin run with NO shuffle
  * exchange on either side — the layout decision that makes repeated
  * lineitem⋈orders joins cheap at scale (SURVEY.md §2.6 note). */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
      Tables.lineitem(spark, sf()).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
      Tables.orders(spark, sf()).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffled:\n$plan")

      // and the co-located join is correct
      val expect = Tables.lineitem(spark, sf())
        .join(Tables.orders(spark, sf()), col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("exact_distinct sketch equals countDistinct across partition layouts") {
    import graft.functions.ExactDistinct.exact_distinct
    val ev = Tables.events(spark, sf())
    for (parts <- Seq(1, 7)) {
      val d = ev.repartition(parts)
      val got = d.groupBy(col("event_type"))
        .agg(exact_distinct(col("user_id")).as("x"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = d.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("x"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }
}
