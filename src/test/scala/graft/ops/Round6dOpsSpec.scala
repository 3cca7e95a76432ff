package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Round6dOpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff classifies added/removed/changed, drops unchanged") {
    val v1 = Seq((1L, "a"), (1L, "b"), (2L, "x"), (3L, "same"), (4L, "gone"))
      .toDF("k", "content")
    val v2 = Seq((1L, "a"), (1L, "b"), (1L, "c"), // key 1: row added → changed
      (2L, "y"),                                  // key 2: content changed
      (3L, "same"),                               // key 3: unchanged → dropped
      (5L, "new"))                                // key 5: added
      .toDF("k", "content")
    val got = Snapshot.diff(v1, v2, "k", "content")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "changed",
      4L -> "removed", 5L -> "added"))
  }

  test("snapshot diff is order-independent within a key") {
    val v1 = Seq((1L, "a"), (1L, "b"), (1L, "c")).toDF("k", "content")
    val v2 = Seq((1L, "c"), (1L, "a"), (1L, "b")).toDF("k", "content")
    assert(Snapshot.diff(v1, v2, "k", "content").count() === 0)
  }

  test("constraints: row rules counted in one pass, uniqueness separate") {
    val df = Seq(
      (Some(1L), 10.0, "O"), (Some(1L), -5.0, "F"), (None, 3.0, "Z"),
      (Some(3L), 0.0, "O")
    ).toDF("id", "price", "status")
    val got = Audit.constraints(df,
      Seq(
        "id_not_null" -> col("id").isNull,
        "price_positive" -> coalesce(!(col("price") > 0.0), lit(true)),
        "status_domain" -> coalesce(!col("status").isin("O", "F"), lit(true))),
      Seq("id_unique" -> "id"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("id_not_null" -> 1L, "price_positive" -> 2L,
      "status_domain" -> 1L, "id_unique" -> 1L))
  }

  test("constraints require at least one rule") {
    intercept[IllegalArgumentException] {
      Audit.constraints(Seq((1L, 1L)).toDF("a", "b"), Nil, Nil)
    }
  }
}
