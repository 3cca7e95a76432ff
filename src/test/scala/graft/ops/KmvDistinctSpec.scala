package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.KmvDistinct.kmv_distinct
import graft.ops.{Dedup => D}

class KmvDistinctSpec extends SparkSpec {

  test("exact below k: fewer than k distinct values returns the exact count") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 37, "g")).toDF("v", "g")
    val out = df.groupBy($"g").agg(kmv_distinct($"v".cast("long")).as("est"))
      .collect().head.getLong(1)
    assert(out === 37L)
  }

  test("deterministic across runs and partitionings") {
    import spark.implicits._
    val base = (1 to 5000).map(i => ((i * 7919) % 991, i % 3)).toDF("v", "g")
    val a = base.repartition(2).groupBy($"g").agg(kmv_distinct($"v".cast("long")).as("e"))
      .orderBy($"g").collect().map(_.getLong(1)).toSeq
    val b = base.repartition(13, $"v").groupBy($"g").agg(kmv_distinct($"v".cast("long")).as("e"))
      .orderBy($"g").collect().map(_.getLong(1)).toSeq
    assert(a === b)
  }

  test("estimator matches the SQL formulation of (k-1)*2^48/h_k exactly") {
    // Recompute the estimate from first principles with DataFrame ops over
    // the same portable hash (md5 'kmv|' salt) — this pins the aggregate's
    // JVM md5 path to the SQL-expressible definition the oracle uses.
    val ev = Tables.events(spark, sf("sf0.01"))
    val agg = ev.groupBy(col("event_type"))
      .agg(kmv_distinct(col("user_id")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val k = 64
    val hs = ev.select(col("event_type"),
        D.hash48(col("user_id").cast("string"), lit("kmv")).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("h"))
    val expected = hs
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nh"), max(when(col("rn") === k, col("h"))).as("hk"))
      .select(col("event_type"),
        // integral div keeps the 2^48-scale numerator exact (a double / loses bits past 2^53)
        when(col("nh") < k, col("nh"))
          .otherwise(expr(s"${(k - 1).toLong * (1L << 48)}L div hk")).as("exp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg === expected)
  }

  test("within tolerance of exact, and builtin HLL agrees within its rsd") {
    val ev = Tables.events(spark, sf("sf0.1"))
    val rows = ev.groupBy(col("event_type"))
      .agg(kmv_distinct(col("user_id")).as("kmv"),
        approx_count_distinct(col("user_id")).as("hll"),
        countDistinct(col("user_id")).as("exact"))
      .collect()
    rows.foreach { r =>
      val (kmv, hll, exact) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // rsd(kmv, k=64) ~ 12.7%; rsd(hll, default) ~ 5%. Allow 4 sigma.
      assert(math.abs(kmv - exact).toDouble / exact < 0.51, s"kmv=$kmv exact=$exact")
      assert(math.abs(hll - exact).toDouble / exact < 0.21, s"hll=$hll exact=$exact")
    }
  }
}
